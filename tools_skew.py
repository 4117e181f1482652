#!/usr/bin/env python
"""Skew-mitigation measurement (VERDICT r14 item 3): drive a Zipf-hot key
through the join/aggregation shapes the skew operators claim to fix, and
record where salting actually wins over (a) doing nothing and (b) AQE's
skew-join splitting.

Subjects, at each hot-key share in the sweep (one key owning S of all rows,
the rest uniform over ``users`` keys):

  join   events ⋈ dim on user_id with broadcast DISABLED (the case that
         matters: when the dim fits the broadcast threshold you broadcast
         and skew is moot). Variants: AQE off, AQE on (skew-join split),
         salted_join (skewed side salted, dim replicated x buckets).
  agg    groupBy(user_id) mergeable aggregates, plain vs salted_agg.
         EXPECTED parity: map-side partial aggregation collapses the hot
         key before the shuffle, so the reduce side never concentrates —
         the measurement documents that salting mergeable aggs is NOT the
         win, matching salted_agg's docstring ("for when the reduce side
         still concentrates").
  window sessionize-shaped window (partitionBy user ORDER BY ts): the hot
         key's partition is inherently sequential — no salt preserves
         order semantics — so this row QUANTIFIES the boundary rather
         than fixing it (mitigation at 100 TB: secondary time-bucket
         keys, or the buffered-streaming sessionizer whose state is
         per-user and incremental).

Straggler evidence per variant: wall seconds + parallel efficiency =
(executor CPU-time across the variant's stages / cores) / wall. A hot-key
straggler collapses efficiency toward 1/cores; a fixed plan restores it.

Usage:  python tools_skew.py            writes SKEW.json + one
                                        SKEW_JSON: summary line
Env:    SKEW_ROWS (2e7), SKEW_USERS (2e6), SKEW_DIM_ROWS (2e6),
        SKEW_SHARES (0,0.02,0.1,0.3), SKEW_TRIALS (2), SKEW_BUCKETS (16)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

from nexgap_spark.operators import sessionize, skew
from nexgap_spark.session import get_spark

REPO = os.path.dirname(os.path.abspath(__file__))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _executor_runtime_ms(spark) -> int:
    """Sum of executorRunTime over all completed stages (app status store;
    Spark 4's stageList needs every positional default filled — the
    scala-default dance from tools_memsweep)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    statuses = jvm.java.util.ArrayList()
    try:
        stages = store.stageList(
            statuses,
            getattr(store, "stageList$default$2")(),
            getattr(store, "stageList$default$3")(),
            getattr(store, "stageList$default$4")(),
            getattr(store, "stageList$default$5")(),
        )
    except Exception:  # noqa: BLE001 — older signature fallback
        stages = store.stageList(statuses)
    it = stages.iterator()
    total = 0
    while it.hasNext():
        total += it.next().executorRunTime()
    return total


def _events(spark, rows: int, users: int, hot_share: float):
    hot_rows = int(rows * hot_share)
    user = (
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(users)))
        .cast("long")
    )
    return spark.range(rows, numPartitions=CORES).select(
        user.alias("user_id"),
        F.col("id").alias("payload"),
        (F.col("id") % 86_400_000).alias("ts_ms"),
    )


def _dim(spark, users: int):
    # a 64-byte pad keeps the dim above any broadcast threshold on its own,
    # but the harness also forces autoBroadcastJoinThreshold=-1: the
    # broadcast-able case needs no salting and is not under test
    return spark.range(users).select(
        F.col("id").alias("user_id"),
        F.md5(F.col("id").cast("string")).alias("pad1"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad2"),
        (F.col("id") % 7).alias("segment"),
    )


def _timed(spark, fn, trials: int) -> dict:
    best = None
    eff = None
    for _ in range(trials):
        rt0 = _executor_runtime_ms(spark)
        t0 = time.perf_counter()
        result = fn()
        wall = time.perf_counter() - t0
        rt = _executor_runtime_ms(spark) - rt0
        if best is None or wall < best:
            best = wall
            eff = (rt / 1000.0 / CORES) / wall if wall > 0 else None
        out_rows = result
    return {
        "sec": round(best, 2),
        "parallel_efficiency": round(eff, 3) if eff is not None else None,
        "rows": out_rows,
    }


def run_share(spark, rows: int, users: int, dim_rows: int, share: float,
              buckets: int, trials: int) -> dict:
    ev = _events(spark, rows, users, share)
    dim = _dim(spark, dim_rows)
    rec: dict = {"hot_share": share}

    def _set(aqe: bool, skewjoin: bool) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skewjoin).lower()
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # --- join variants -------------------------------------------------
        def plain_join():
            return ev.join(dim, "user_id").agg(
                F.count("*").alias("n"), F.sum("segment").alias("s")
            ).collect()[0]["n"]

        def salted():
            return skew.salted_join(ev, dim, ["user_id"], buckets=buckets).agg(
                F.count("*").alias("n"), F.sum("segment").alias("s")
            ).collect()[0]["n"]

        _set(aqe=False, skewjoin=False)
        rec["join_plain_noaqe"] = _timed(spark, plain_join, trials)
        _set(aqe=True, skewjoin=True)
        rec["join_plain_aqe"] = _timed(spark, plain_join, trials)
        rec["join_salted"] = _timed(spark, salted, trials)
        # equality: the salted plan must produce the identical join
        rec["join_rows_equal"] = (
            rec["join_plain_noaqe"]["rows"]
            == rec["join_plain_aqe"]["rows"]
            == rec["join_salted"]["rows"]
        )

        # --- aggregation variants ------------------------------------------
        def plain_agg():
            return ev.groupBy("user_id").agg(
                F.sum("payload").alias("s"), F.count("*").alias("c")
            ).count()

        def salted_agg():
            return skew.salted_agg(
                ev, ["user_id"],
                {"s": ("sum", "payload"), "c": ("count", "*")},
                buckets=buckets,
            ).count()

        _set(aqe=True, skewjoin=True)
        rec["agg_plain"] = _timed(spark, plain_agg, trials)
        rec["agg_salted"] = _timed(spark, salted_agg, trials)

        # --- window boundary (quantified, not fixed) ------------------------
        def window_sessionize():
            events_ts = ev.select(
                "user_id",
                F.timestamp_millis(
                    F.lit(1_700_000_000_000) + F.col("ts_ms")
                ).alias("ts"),
            )
            return (
                sessionize.sessionize(events_ts, gap_minutes=5)
                .select("user_id", "session_id")
                .groupBy("user_id")
                .agg(F.max("session_id"))
                .count()
            )

        rec["window_sessionize"] = _timed(spark, window_sessionize, trials)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        _set(aqe=True, skewjoin=True)
    return rec


def main() -> int:
    rows = int(float(os.environ.get("SKEW_ROWS", "2e7")))
    users = int(float(os.environ.get("SKEW_USERS", "2e6")))
    dim_rows = int(float(os.environ.get("SKEW_DIM_ROWS", "2e6")))
    shares = [
        float(s)
        for s in os.environ.get("SKEW_SHARES", "0,0.02,0.1,0.3").split(",")
    ]
    trials = int(os.environ.get("SKEW_TRIALS", "2"))
    buckets = int(os.environ.get("SKEW_BUCKETS", "16"))
    spark = get_spark("skewbench", cpus=CORES)
    report = {
        "rows": rows, "users": users, "dim_rows": dim_rows,
        "buckets": buckets, "cores": CORES,
        "shares": [],
    }
    for share in shares:
        print(f"[skew] share={share}", file=sys.stderr)
        report["shares"].append(
            run_share(spark, rows, users, dim_rows, share, buckets, trials)
        )
    # where does salting win the JOIN? (>10% faster than the best plain
    # variant at that share)
    wins = []
    for rec in report["shares"]:
        best_plain = min(
            rec["join_plain_noaqe"]["sec"], rec["join_plain_aqe"]["sec"]
        )
        if rec["join_salted"]["sec"] < 0.9 * best_plain:
            wins.append(rec["hot_share"])
    report["salted_join_wins_at_shares"] = wins
    report["equality_ok"] = all(r["join_rows_equal"] for r in report["shares"])
    with open(os.path.join(REPO, "SKEW.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("SKEW_JSON:" + json.dumps({
        "equality_ok": report["equality_ok"],
        "salted_join_wins_at_shares": wins,
        "shares": [
            {
                "hot_share": r["hot_share"],
                "join": {
                    "noaqe": r["join_plain_noaqe"]["sec"],
                    "aqe": r["join_plain_aqe"]["sec"],
                    "salted": r["join_salted"]["sec"],
                },
                "join_eff": {
                    "noaqe": r["join_plain_noaqe"]["parallel_efficiency"],
                    "aqe": r["join_plain_aqe"]["parallel_efficiency"],
                    "salted": r["join_salted"]["parallel_efficiency"],
                },
            }
            for r in report["shares"]
        ],
    }))
    return 0 if report["equality_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
