"""Streaming throughput harness (VERDICT r13 item 6): drive the stateful
operators with a rate-limited source for a sustained window and record
rows/s + state-store size, next to their batch twins' throughput on the
same data — `streaming/pipeline.py` is equality-tested vs batch but was
never throughput-measured.

Two subjects:
* ``stateful_sessions_buffered`` over a `rate` source mapped to
  (user_id, ts, value) — per-trigger metrics from StreamingQueryProgress
  (processedRowsPerSecond, stateOperators numRowsTotal / memoryUsedBytes).
* ``incremental_dedup_sink`` over a rate-derived document stream with a
  controlled duplicate fraction — foreachBatch has no state operator, so
  throughput = rows acked / wall; ledger growth read back from the
  committed epochs.

Batch twins run on the SAME rows the stream processed (written to parquet
first), so the rows/s comparison divides identical work.

Usage: python tools_streambench.py  (env: STREAMBENCH_SECONDS=60
STREAMBENCH_RATE=200000 STREAMBENCH_USERS=5000 STREAMBENCH_DUP_MOD=1000).
Prints one JSON document; SCALE.md records the rows.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from nexgap_spark.operators import sessionize
from nexgap_spark.session import get_spark
from nexgap_spark.streaming import pipeline as SP


def _progress(q) -> list[dict]:
    """recentProgress entries as dicts (PySpark 4 returns
    StreamingQueryProgress objects; .json is the serialized form)."""
    out = []
    for p in q.recentProgress:
        out.append(json.loads(p.json if hasattr(p, "json") else p))
    return out


def bench_sessions(spark, seconds: int, rate: int, users: int) -> dict:
    events = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            (F.col("value") % users).alias("user_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 97).cast("double").alias("value"),
        )
    )
    sess = SP.stateful_sessions_buffered(
        events, gap_minutes=0.05, watermark="10 seconds"
    )
    q = (
        sess.writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sb_ckpt_"))
        .start()
    )
    t0 = time.time()
    time.sleep(seconds)
    progresses = _progress(q)
    q.stop()
    wall = time.time() - t0
    rows_in = sum(p.get("numInputRows", 0) for p in progresses)
    batches = len(progresses)
    state = {}
    for p in reversed(progresses):
        ops = p.get("stateOperators") or []
        if ops:
            state = {
                "numRowsTotal": ops[0].get("numRowsTotal"),
                "memoryUsedMB": round((ops[0].get("memoryUsedBytes") or 0) / 1e6, 1),
            }
            break
    rates = [
        p["processedRowsPerSecond"]
        for p in progresses
        if p.get("processedRowsPerSecond") and p.get("numInputRows", 0) > 0
    ]
    # steady-state rate: drop the FIRST batch (session-startup dead time)
    # and divide the remaining rows by their batch durations. max(rates)
    # is NOT a keep-up signal — a catch-up batch reading backlog bursts
    # above the configured rate exactly when the stream is falling behind
    # (r14 review); it is reported as a peak only.
    steady = [p for p in progresses[1:] if p.get("numInputRows", 0) > 0]
    steady_rows = sum(p["numInputRows"] for p in steady)
    steady_ms = sum(p.get("batchDuration", 0) for p in steady)
    steady_rate = round(steady_rows / (steady_ms / 1000.0), 0) if steady_ms else None
    return {
        "seconds": round(wall, 1),
        "batches": batches,
        "rows_ingested": rows_in,
        "rows_per_sec_avg": round(rows_in / wall, 0),
        "rows_per_sec_steady": steady_rate,
        "rows_per_sec_batch_peak": round(max(rates), 0) if rates else None,
        "state": state,
        "configured_rate": rate,
        "backpressured": steady_rate is not None and steady_rate < 0.9 * rate,
    }


def bench_sessions_batch_twin(spark, rate: int, users: int, rows: int) -> dict:
    """Batch sessionization of the SAME logical event set, for the rows/s
    comparison (gap semantics shared with the streaming operator)."""
    events = (
        spark.range(rows)
        .select(
            (F.col("id") % users).alias("user_id"),
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + (F.col("id") / rate * 1e6).cast("long"))
            ).alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
        )
    )
    t0 = time.time()
    n = (
        sessionize.sessionize(events, gap_minutes=0.05)
        .select("user_id", "session_id")
        .distinct()
        .count()
    )
    dt = time.time() - t0
    return {"rows": rows, "sessions": n, "sec": round(dt, 2),
            "rows_per_sec": round(rows / dt, 0)}


def bench_dedup_sink(spark, seconds: int, rate: int, dup_mod: int) -> dict:
    work = tempfile.mkdtemp(prefix="sb_dedup_")
    out, ledger, ckpt = f"{work}/out", f"{work}/ledger", f"{work}/ckpt"
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("document body "),
                (F.col("value") % dup_mod).cast("string"),
                F.lit(" lorem ipsum dolor sit amet consectetur"),
            ).alias("text"),
        )
    )
    q = SP.incremental_dedup_sink(docs, out, ledger, ckpt)
    t0 = time.time()
    time.sleep(seconds)
    progresses = _progress(q)
    q.stop()
    wall = time.time() - t0
    rows_in = sum(p.get("numInputRows", 0) for p in progresses)
    survivors = spark.read.schema("doc_id long, text string").json(
        out + "/epoch=*"
    ).count()
    ledger_rows = SP.read_committed_epochs(spark, ledger, "digest string").count()
    res = {
        "seconds": round(wall, 1),
        "batches": len(progresses),
        "rows_ingested": rows_in,
        "rows_per_sec_avg": round(rows_in / wall, 0),
        "survivors": survivors,
        "ledger_digests": ledger_rows,
        "configured_rate": rate,
        "dup_mod": dup_mod,
        # ADVICE r14: `<=` alone would pass a sink that LOST documents.
        # Rate-source ids are sequential, so distinct keys ingested is
        # exactly min(rows_in, dup_mod): once the stream has seen >= dup_mod
        # rows every residue class exists and the sink must hold ALL of
        # them — equality, catching both duplicate emission and
        # under-delivery. (rows_in can undercount if progress history
        # rotates, so below dup_mod we keep the duplicate-only bound.)
        "exactly_once_ok": (
            survivors == dup_mod and ledger_rows == dup_mod
            if rows_in >= dup_mod
            else ledger_rows <= dup_mod and survivors <= dup_mod
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    return res


def bench_dedup_batch_twin(spark, rows: int, dup_mod: int) -> dict:
    from nexgap_spark.operators import dedup

    docs = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("document body "),
            (F.col("id") % dup_mod).cast("string"),
            F.lit(" lorem ipsum dolor sit amet consectetur"),
        ).alias("text"),
    )
    t0 = time.time()
    n = dedup.exact_dedup(docs).groupBy().count().collect()[0][0]
    dt = time.time() - t0
    return {"rows": rows, "kept": n, "sec": round(dt, 2),
            "rows_per_sec": round(rows / dt, 0)}


# ---------------------------------------------------------------------------
# soak mode (VERDICT r14 item 6): >=10 minutes under RocksDB state, watching
# for the slow-degradation modes a 45 s window cannot see - state-store
# compaction stalls, unbounded state growth past watermark eviction, and
# per-epoch ledger-scan cost as committed epochs accumulate.
# ---------------------------------------------------------------------------


def _minute_curve(progresses: list[dict]) -> list[dict]:
    """Per-minute aggregates from the progress stream: rows/s, batch ms,
    state rows/bytes, RocksDB SST size. Minute 0 = first progress."""
    if not progresses:
        return []
    import datetime as _dt

    def _ts(p):
        return _dt.datetime.fromisoformat(p["timestamp"].replace("Z", "+00:00"))

    t0 = _ts(progresses[0])
    buckets: dict[int, list[dict]] = {}
    for p in progresses:
        buckets.setdefault(int((_ts(p) - t0).total_seconds() // 60), []).append(p)
    out = []
    for minute in sorted(buckets):
        ps = [p for p in buckets[minute] if p.get("numInputRows", 0) > 0]
        if not ps:
            continue
        rows = sum(p["numInputRows"] for p in ps)
        ms = sum(p.get("batchDuration", 0) for p in ps)
        row = {
            "minute": minute,
            "batches": len(ps),
            "rows_per_sec": round(rows / (ms / 1000.0), 0) if ms else None,
            "avg_batch_ms": round(ms / len(ps), 0),
        }
        ops = (ps[-1].get("stateOperators") or [{}])[0]
        if ops:
            row["state_rows"] = ops.get("numRowsTotal")
            row["state_mem_mb"] = round((ops.get("memoryUsedBytes") or 0) / 1e6, 1)
            sst = (ops.get("customMetrics") or {}).get("rocksdbSstFileSize")
            if sst is not None:
                row["rocksdb_sst_mb"] = round(sst / 1e6, 1)
        out.append(row)
    return out


def _flat(vals: list[float], tol: float = 1.5) -> bool | None:
    """Steady-state flatness: last-third average within tol x of the
    middle-third average (first third = warmup, excluded)."""
    vals = [v for v in vals if v is not None]
    if len(vals) < 6:
        return None
    third = len(vals) // 3
    mid = sum(vals[third : 2 * third]) / third
    last = sum(vals[2 * third :]) / (len(vals) - 2 * third)
    return bool(mid > 0 and last <= tol * mid)


def soak_sessions(spark, seconds: int, rate: int, users: int) -> dict:
    """Buffered sessionization under RocksDB for the full window; the
    verdict fields say whether watermark eviction keeps state bounded and
    whether batch latency stays flat over hundreds of epochs."""
    provider = os.environ.get("STREAMBENCH_PROVIDER", "rocksdb")
    if provider != "default":
        SP.use_rocksdb_state(spark)
    # STREAMBENCH_MIN_RETAIN / STREAMBENCH_PROVIDER are the soak's control
    # knobs: the r15 matrix ran baseline RocksDB at 200k (batch latency
    # 3 s -> 14.5 s over 10 min at FLAT 5000 logical state rows),
    # minBatchesToRetain=5 (no change), half rate (still grows), and the
    # default in-memory provider as the RocksDB-vs-operator control.
    # Findings in SCALE.md round-15; throughput held the configured rate
    # in every run.
    retain = os.environ.get("STREAMBENCH_MIN_RETAIN")
    if retain:
        spark.conf.set("spark.sql.streaming.minBatchesToRetain", retain)
    try:
        events = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rate)
            .option("numPartitions", 8)
            .load()
            .select(
                (F.col("value") % users).alias("user_id"),
                F.col("timestamp").alias("ts"),
                (F.col("value") % 97).cast("double").alias("value"),
            )
        )
        sess = SP.stateful_sessions_buffered(
            events, gap_minutes=0.05, watermark="10 seconds"
        )
        q = (
            sess.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="sb_soak_"))
            .start()
        )
        time.sleep(seconds)
        progresses = _progress(q)
        q.stop()
    finally:
        if provider != "default":
            SP.use_default_state(spark)
    curve = _minute_curve(progresses)
    return {
        "seconds": seconds,
        "configured_rate": rate,
        "batches": len(progresses),
        "rows_ingested": sum(p.get("numInputRows", 0) for p in progresses),
        "curve": curve,
        "state_rows_flat": _flat([r.get("state_rows") for r in curve]),
        "batch_ms_flat": _flat([r.get("avg_batch_ms") for r in curve]),
        "rocksdb_used": any("rocksdb_sst_mb" in r for r in curve),
    }


def soak_dedup(spark, seconds: int, rate: int, dup_mod: int) -> dict:
    """Dedup sink over a mostly-unique stream so the digest ledger GROWS
    for the whole window - the per-epoch ledger-scan cost curve is the
    measurement (the exact sink semi-joins each batch against all
    committed digests; growth here is the expected O(ledger) per epoch,
    and the bucketed incremental_minhash variant is the 100 TB answer)."""
    work = tempfile.mkdtemp(prefix="sb_soakd_")
    out, ledger, ckpt = f"{work}/out", f"{work}/ledger", f"{work}/ckpt"
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("document body "),
                (F.col("value") % dup_mod).cast("string"),
                F.lit(" lorem ipsum dolor sit amet consectetur"),
            ).alias("text"),
        )
    )
    q = SP.incremental_dedup_sink(docs, out, ledger, ckpt)
    time.sleep(seconds)
    progresses = _progress(q)
    q.stop()
    curve = _minute_curve(progresses)
    ledger_rows = SP.read_committed_epochs(spark, ledger, "digest string").count()
    ms = [r.get("avg_batch_ms") for r in curve if r.get("avg_batch_ms")]
    # minutes 0-1 are warmup + catch-up (the first soak recorded a single
    # 37 s backlog batch in minute 1 that made a last/early ratio of 0.22 —
    # nonsense); the steady-state trend starts at minute 2
    growth = round(ms[-1] / ms[2], 2) if len(ms) >= 5 else None
    res = {
        "seconds": seconds,
        "configured_rate": rate,
        "dup_mod": dup_mod,
        "batches": len(progresses),
        "rows_ingested": sum(p.get("numInputRows", 0) for p in progresses),
        "ledger_digests": ledger_rows,
        "curve": curve,
        "batch_ms_growth_last_vs_early": growth,
    }
    shutil.rmtree(work, ignore_errors=True)
    return res


def main() -> int:
    seconds = int(os.environ.get("STREAMBENCH_SECONDS", "60"))
    rate = int(os.environ.get("STREAMBENCH_RATE", "200000"))
    users = int(os.environ.get("STREAMBENCH_USERS", "5000"))
    dup_mod = int(os.environ.get("STREAMBENCH_DUP_MOD", "1000"))
    spark = get_spark("streambench")
    # recentProgress retains only the last N updates (default 100) — a
    # sub-second trigger over a long window would silently evict the
    # oldest batches and undercount rows_ingested (r14 review)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "100000")
    if os.environ.get("STREAMBENCH_MODE") == "soak":
        soak_s = int(os.environ.get("STREAMBENCH_SOAK_SECONDS", "630"))
        out = {
            "soak_sessions": soak_sessions(spark, soak_s, rate, users),
            "soak_dedup": soak_dedup(
                spark,
                int(os.environ.get("STREAMBENCH_SOAK_DEDUP_SECONDS", "330")),
                int(os.environ.get("STREAMBENCH_SOAK_DEDUP_RATE", "50000")),
                int(os.environ.get("STREAMBENCH_SOAK_DUP_MOD", "100000000")),
            ),
        }
        print(json.dumps(out, indent=1))
        return 0
    out = {"sessions_stream": bench_sessions(spark, seconds, rate, users)}
    out["sessions_batch_twin"] = bench_sessions_batch_twin(
        spark, rate, users, out["sessions_stream"]["rows_ingested"] or rate * seconds
    )
    out["dedup_stream"] = bench_dedup_sink(spark, seconds, rate, dup_mod)
    out["dedup_batch_twin"] = bench_dedup_batch_twin(
        spark, out["dedup_stream"]["rows_ingested"] or rate * seconds, dup_mod
    )
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
