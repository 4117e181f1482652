#!/usr/bin/env python
"""Cluster x streaming fault compose (VERDICT r15 item 3): the streaming
exactly-once story run against a REAL standalone cluster with executors
that can die independently of the driver.

tools_cluster.py proves batch recovery under executor loss; r14's
mid-epoch crash test proves checkpoint replay on local[N]. This harness
runs the one fault mode those two don't cover together:

  Phase S0  clean reference: the streaming dedup sink drains the chunked
            corpus on local[8] — survivor/ledger hashes are the ground
            truth (same runner code as every other phase).
  Phase S1  executor kill MID-EPOCH: the same stream on the standalone
            cluster (2 workers), one executor JVM kill -9'ed as a chosen
            epoch's jobs start. Spark retries the lost tasks on the
            replacement executor; the query must COMPLETE with zero
            duplicate survivors and hashes equal to S0. The sink's
            materialize() runs under a RELIABLE checkpoint dir (the r15
            deployment flag) — localCheckpoint blocks on the dead executor
            would be unrecoverable, which is exactly why materialize()
            upgrades (CLUSTER.json phases D/F).
  Phase S2  driver kill BETWEEN ledger write and commit: the runner's
            whole process group is SIGKILL'ed inside the post-write /
            pre-commit window of a chosen epoch (the sink's post_batch
            hook holds the window open), then a SECOND runner resumes from
            the same checkpoint and drains the rest. The replayed epoch is
            skipped by the epoch markers (both writes committed) — final
            survivors/ledger must equal S0 with zero duplicates.
  Phase S3  RocksDB stateful sessionizer under executor kill: the
            buffered sessionizer (applyInPandasWithState, RocksDB state
            provider) on the cluster, one executor killed mid-stream; the
            replacement executor reloads state from the checkpoint and the
            emitted sessions must equal the batch sessionizer exactly
            (float-identical totals — values are exact binary fractions).

Usage:  python tools_cluster_stream.py      # writes CLUSTER_STREAM.json,
                                            # prints one CLUSTER_STREAM_JSON line
Env:    CLUSTER_WORKERS (2) CLUSTER_CORES (8) CLUSTER_MEM (6g)
        STREAM_CHUNKS (6) STREAM_ROWS (60000 per chunk)
        STREAM_UNIQUE (150000 distinct texts)
The file doubles as the in-cluster runner (--runner), so the driver-side
streaming code is identical across phases.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import threading
import time

from tools_cluster import Cluster, _executor_pids  # noqa: F401

REPO = os.path.dirname(os.path.abspath(__file__))


# --------------------------------------------------------------------------
# data generation (parent side, no Spark needed)
# --------------------------------------------------------------------------

def gen_doc_chunks(in_dir: str, chunks: int, rows: int, unique: int) -> None:
    """Chunked document corpus with KNOWN cross-chunk duplicates: doc_id is
    sequential; text repeats with period ``unique`` — the survivor for each
    content key is its first occurrence, deterministic under any retry."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir, exist_ok=True)
    base = 1_700_000_000
    for c in range(chunks):
        ids = range(c * rows, (c + 1) * rows)
        pdf = pd.DataFrame(
            {
                "doc_id": list(ids),
                "text": [
                    f"document body {i % unique} "
                    f"{hashlib.md5(str(i % unique).encode()).hexdigest()}"
                    for i in ids
                ],
            }
        )
        p = os.path.join(in_dir, f"{c}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (base + 100 * c, base + 100 * c))


def gen_event_chunks(in_dir: str, chunks: int, users: int, per_user: int) -> None:
    """Chunked event stream for the sessionizer: chunk c covers hour c,
    each user active for ``per_user`` minutes then idle — with gap 5 min /
    watermark 10 min, each chunk's sessions close while the NEXT chunk
    streams, so state is exercised across the kill. Values are exact
    binary fractions (k/4) so any summation order is float-identical.
    The last chunk is a far-future sentinel that flushes every session."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(in_dir, exist_ok=True)
    base_ts = pd.Timestamp("2024-01-01 00:00:00")
    base = 1_700_000_000
    eid = 0
    for c in range(chunks):
        rows = []
        for u in range(users):
            for m in range(per_user):
                rows.append(
                    (
                        eid,
                        u,
                        "e",
                        base_ts + pd.Timedelta(hours=c, minutes=m),
                        float((eid % 8)) * 0.25,
                    )
                )
                eid += 1
        pdf = pd.DataFrame(
            rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
        )
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        p = os.path.join(in_dir, f"{c}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (base + 100 * c, base + 100 * c))
    sent = pd.DataFrame(
        [(10**9, -1, "e", base_ts + pd.Timedelta(days=30), 0.0)],
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    sent["ts"] = sent["ts"].astype("datetime64[us]")
    p = os.path.join(in_dir, f"{chunks}.parquet")
    pq.write_table(pa.Table.from_pandas(sent, preserve_index=False), p)
    os.utime(p, (base + 100 * chunks, base + 100 * chunks))


# --------------------------------------------------------------------------
# runner (child process)
# --------------------------------------------------------------------------

def _hash_rows(rows) -> str:
    return hashlib.md5(repr(sorted(rows)).encode()).hexdigest()


def _sink_state(spark, out_dir: str, ledger_dir: str) -> dict:
    """Final survivors + ledger from the committed epoch dirs."""
    from pyspark.sql import functions as F

    from nexgap_spark.operators.dedup import normalize_text
    from nexgap_spark.streaming.pipeline import read_committed_epochs

    surv = read_committed_epochs(spark, out_dir, "doc_id long, text string")
    surv_rows = [(r.doc_id, r.text) for r in surv.collect()]
    dup_survivors = (
        surv.groupBy(F.md5(normalize_text("text")).alias("d"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    ledger = read_committed_epochs(spark, ledger_dir, "digest string")
    ledger_rows = sorted({r.digest for r in ledger.collect()})
    return {
        "survivors": len(surv_rows),
        "dup_survivors": dup_survivors,
        "survivors_hash": _hash_rows(surv_rows),
        "ledger_distinct": len(ledger_rows),
        "ledger_hash": _hash_rows(ledger_rows),
    }


def runner(args) -> int:
    from nexgap_spark.session import get_spark
    from nexgap_spark.streaming import pipeline as SP

    extra = {}
    if args.master:
        os.environ["SPARK_MASTER"] = args.master
        extra = {
            "spark.master": args.master,
            "spark.executor.cores": str(args.cores),
            "spark.executor.memory": args.mem,
            "spark.cores.max": str(args.cores * args.workers),
            "spark.executorEnv.PYTHONPATH": REPO,
        }
    spark = get_spark("nexgap_cluster_stream", cpus=args.cores, extra_conf=extra)
    # the r15 deployment flag: a reliable checkpoint dir upgrades every
    # materialize() inside the sink — localCheckpoint blocks on a killed
    # executor would be unrecoverable mid-epoch (CLUSTER.json phase D/F)
    spark.sparkContext.setCheckpointDir(os.path.join(args.work, "reliable_ckpt"))

    out = os.path.join(args.work, "out")
    ledger = os.path.join(args.work, "ledger")
    ckpt = os.path.join(args.work, "ckpt")

    if args.mode == "sink":
        def pre(eid: int) -> None:
            print(f"EPOCH_PRE {eid}", flush=True)

        def post(eid: int) -> None:
            print(f"EPOCH_POST {eid}", flush=True)
            if args.hold_epoch is not None and eid == args.hold_epoch:
                # hold the post-write / pre-commit window open so the
                # parent's SIGKILL provably lands between the ledger write
                # and the stream commit
                print(f"MIDEPOCH {eid}", flush=True)
                time.sleep(args.hold_secs)

        stream = spark.readStream.schema("doc_id long, text string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(args.in_dir)
        q = SP.incremental_dedup_sink(
            stream, out, ledger, ckpt, pre_batch=pre, post_batch=post
        )
        q.processAllAvailable()
        q.stop()
        rec = {"mode": "sink"}
        rec.update(_sink_state(spark, out, ledger))
        print("RUNNER_JSON:" + json.dumps(rec), flush=True)
        return 0

    # mode == "sessions": RocksDB stateful sessionizer vs batch twin
    from pyspark.sql import functions as F

    from nexgap_spark.operators.sessionize import sessionize

    SP.use_rocksdb_state(spark)
    stream = SP.read_event_stream(spark, args.in_dir, max_files_per_trigger=1)

    def wb(batch, eid):
        print(f"EPOCH_PRE {eid}", flush=True)
        SP.epoch_write_json(batch, eid, out)

    q = (
        SP.stateful_sessions_buffered(stream, gap_minutes=5, watermark="10 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(wb)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    got = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in spark.read.schema(schema).json(out + "/epoch=*").collect()
        if r.user_id >= 0
    ]
    batch = spark.read.parquet(args.in_dir).filter(F.col("user_id") >= 0)
    want = [
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in (
            sessionize(batch, gap_minutes=5, order_tiebreak="event_id")
            .groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("n_events"),
                F.sum("value").alias("total_value"),
            )
            .collect()
        )
    ]
    rec = {
        "mode": "sessions",
        "emitted": len(got),
        "expected": len(want),
        "got_hash": _hash_rows(got),
        "want_hash": _hash_rows(want),
        "equal": sorted(got) == sorted(want),
    }
    print("RUNNER_JSON:" + json.dumps(rec), flush=True)
    return 0


# --------------------------------------------------------------------------
# parent-side launch with optional executor kill / driver kill
# --------------------------------------------------------------------------

def _launch(
    mode: str,
    in_dir: str,
    work: str,
    cores: int,
    workers: int,
    mem: str,
    master: str | None = None,
    kill_exec_on: str | None = None,
    kill_exec_delay: float = 1.0,
    kill_driver_on: str | None = None,
    hold_epoch: int | None = None,
    timeout: float = 1200.0,
) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__), "--runner",
        "--mode", mode, "--in-dir", in_dir, "--work", work,
        "--cores", str(cores), "--workers", str(workers), "--mem", mem,
    ]
    if master:
        cmd += ["--master", master]
    if hold_epoch is not None:
        cmd += ["--hold-epoch", str(hold_epoch)]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    env.pop("SPARK_MASTER", None)
    # own process group so a driver kill takes the JVM down with python —
    # SIGKILLing only python would leave the driver JVM running the query
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd=REPO, start_new_session=True,
    )
    lines: list[str] = []
    err_tail: list[str] = []
    kill_info: dict = {}

    def _drain_stderr() -> None:
        for line in proc.stderr:  # type: ignore[union-attr]
            err_tail.append(line.rstrip("\n"))
            if len(err_tail) > 200:
                del err_tail[:100]

    def _kill_executor() -> None:
        time.sleep(kill_exec_delay)
        pids = _executor_pids()
        if not pids:
            kill_info["error"] = "no executor JVM found to kill"
            return
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        kill_info["victim_pid"] = victim
        kill_info["killed_at"] = round(time.time(), 3)
        kill_info["executors_before"] = len(pids)
        for _ in range(40):
            time.sleep(0.5)
            alive = [p for p in _executor_pids() if p != victim]
            if len(alive) >= len(pids):
                kill_info["replaced"] = True
                kill_info["executors_after"] = len(alive)
                return
        kill_info["replaced"] = False
        kill_info["executors_after"] = len(
            [p for p in _executor_pids() if p != victim]
        )

    def _kill_driver() -> None:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
            kill_info["driver_killed_at"] = round(time.time(), 3)
        except ProcessLookupError:
            kill_info["error"] = "driver already gone"

    def _watch() -> None:
        for line in proc.stdout:  # type: ignore[union-attr]
            lines.append(line.rstrip("\n"))
            if kill_exec_on and line.startswith(kill_exec_on) and (
                "exec_kill_started" not in kill_info
            ):
                kill_info["exec_kill_started"] = line.strip()
                threading.Thread(target=_kill_executor, daemon=True).start()
            if kill_driver_on and line.startswith(kill_driver_on):
                kill_info["driver_kill_marker"] = line.strip()
                _kill_driver()

    t = threading.Thread(target=_watch, daemon=True)
    te = threading.Thread(target=_drain_stderr, daemon=True)
    t.start()
    te.start()
    try:
        rc = proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        return {"error": "runner timeout", "tail": lines[-20:] + err_tail[-10:]}
    t.join(timeout=10)
    te.join(timeout=10)
    payload = next((ln for ln in lines if ln.startswith("RUNNER_JSON:")), None)
    out: dict = {"rc": rc, "markers": [ln for ln in lines if not ln.startswith("RUNNER_JSON")][-12:]}
    if payload is not None:
        out.update(json.loads(payload[len("RUNNER_JSON:"):]))
    if kill_info:
        out["kill"] = kill_info
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runner", action="store_true")
    ap.add_argument("--mode", default="sink", choices=["sink", "sessions"])
    ap.add_argument("--in-dir", default=None)
    ap.add_argument("--work", default=None)
    ap.add_argument("--master", default=None)
    ap.add_argument("--hold-epoch", type=int, default=None)
    ap.add_argument("--hold-secs", type=float, default=12.0)
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("CLUSTER_CORES", "8")))
    ap.add_argument("--workers", type=int,
                    default=int(os.environ.get("CLUSTER_WORKERS", "2")))
    ap.add_argument("--mem", default=os.environ.get("CLUSTER_MEM", "6g"))
    args = ap.parse_args()
    if args.runner:
        return runner(args)

    chunks = int(os.environ.get("STREAM_CHUNKS", "6"))
    rows = int(os.environ.get("STREAM_ROWS", "60000"))
    unique = int(os.environ.get("STREAM_UNIQUE", "150000"))
    root = tempfile.mkdtemp(prefix="nexgap_cstream_")
    report: dict = {
        "workers": args.workers, "cores_per_worker": args.cores,
        "mem_per_worker": args.mem, "chunks": chunks,
        "rows_per_chunk": rows, "unique_texts": unique,
    }
    docs_in = os.path.join(root, "docs_in")
    ev_in = os.path.join(root, "ev_in")
    gen_doc_chunks(docs_in, chunks, rows, unique)
    gen_event_chunks(ev_in, chunks, 2000, 25)
    kill_epoch = max(2, chunks // 2)
    try:
        print("[cstream] phase S0: clean local reference", file=sys.stderr)
        report["clean"] = _launch(
            "sink", docs_in, os.path.join(root, "w_clean"),
            args.cores, args.workers, args.mem,
        )

        print("[cstream] launching standalone cluster", file=sys.stderr)
        cluster = Cluster(args.workers, args.cores, args.mem, root)
        try:
            print("[cstream] phase S1: executor kill mid-epoch", file=sys.stderr)
            report["exec_kill"] = _launch(
                "sink", docs_in, os.path.join(root, "w_exec"),
                args.cores, args.workers, args.mem, master=cluster.url,
                kill_exec_on=f"EPOCH_PRE {kill_epoch}", kill_exec_delay=1.0,
            )
            report["exec_kill_ok"] = (
                report["exec_kill"].get("rc") == 0
                and report["exec_kill"].get("dup_survivors") == 0
                and report["exec_kill"].get("survivors_hash")
                == report["clean"].get("survivors_hash")
                and report["exec_kill"].get("ledger_hash")
                == report["clean"].get("ledger_hash")
                and report["exec_kill"].get("kill", {}).get("victim_pid")
                is not None
            )

            print("[cstream] phase S2: driver kill between ledger write and "
                  "commit, then resume", file=sys.stderr)
            w2 = os.path.join(root, "w_driver")
            first = _launch(
                "sink", docs_in, w2, args.cores, args.workers, args.mem,
                master=cluster.url,
                kill_driver_on=f"MIDEPOCH {kill_epoch}", hold_epoch=kill_epoch,
            )
            report["driver_kill_first"] = first
            killed_in_window = (
                "driver_kill_marker" in first.get("kill", {})
                and first.get("rc") != 0
            )
            resumed = _launch(
                "sink", docs_in, w2, args.cores, args.workers, args.mem,
                master=cluster.url,
            )
            report["driver_kill_resumed"] = resumed
            report["driver_kill_ok"] = (
                killed_in_window
                and resumed.get("rc") == 0
                and resumed.get("dup_survivors") == 0
                and resumed.get("survivors_hash")
                == report["clean"].get("survivors_hash")
                and resumed.get("ledger_hash")
                == report["clean"].get("ledger_hash")
            )

            print("[cstream] phase S3: RocksDB sessionizer, executor kill",
                  file=sys.stderr)
            report["sessions_exec_kill"] = _launch(
                "sessions", ev_in, os.path.join(root, "w_sess"),
                args.cores, args.workers, args.mem, master=cluster.url,
                kill_exec_on=f"EPOCH_PRE {kill_epoch}", kill_exec_delay=1.0,
                timeout=1800.0,
            )
            sk = report["sessions_exec_kill"]
            report["sessions_exec_kill_ok"] = (
                sk.get("rc") == 0
                and sk.get("equal") is True
                and sk.get("emitted", 0) > 0
                and sk.get("kill", {}).get("victim_pid") is not None
            )
        finally:
            cluster.shutdown()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    ok = (
        report.get("exec_kill_ok") is True
        and report.get("driver_kill_ok") is True
        and report.get("sessions_exec_kill_ok") is True
    )
    report["ok"] = ok
    with open(os.path.join(REPO, "CLUSTER_STREAM.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("CLUSTER_STREAM_JSON:" + json.dumps({
        "ok": ok,
        "exec_kill_ok": report.get("exec_kill_ok"),
        "driver_kill_ok": report.get("driver_kill_ok"),
        "sessions_exec_kill_ok": report.get("sessions_exec_kill_ok"),
        "exec_kill_replaced": report.get("exec_kill", {}).get("kill", {}).get("replaced"),
        "sessions_kill_replaced": report.get("sessions_exec_kill", {}).get("kill", {}).get("replaced"),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
