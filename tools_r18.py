#!/usr/bin/env python
"""Round-17 optimization harness: capture .explain("formatted") plans and
isolated timings for a named query subset.

Usage:
  python tools_r18.py explain q43_dup_groups q31_minhash_lsh_pairs --tag before
  python tools_r18.py time q43_dup_groups --trials 5 [--noop]

`explain` writes plans/r18/<query>_<tag>.txt; `time` prints per-trial and
best wall seconds using the SAME methodology as bench.py (collect of the
declared frame), or the noop sink with --noop (guide §1.4) so the
computation is timed without the driver result transfer.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["explain", "time"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from nexgap_spark.plans import QUERIES
    from nexgap_spark.session import get_spark

    spark = get_spark("nexgap_r18_harness")
    # same warmup as bench.py: JVM + parquet footers + Python worker pool
    QUERIES["q06_revenue_filter"](spark, args.sf_dir).collect()
    spark.range(32 * 1024).repartition(32).mapInPandas(lambda it: it, "id long").count()

    if args.mode == "explain":
        os.makedirs("plans/r18", exist_ok=True)
        for name in args.queries:
            df = QUERIES[name](spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r18/{name}_{args.tag}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
        return

    def jiffies():
        parts = open("/proc/stat").readline().split()
        vals = [int(v) for v in parts[1:]]
        return vals[7] if len(vals) > 7 else 0, sum(vals)

    for name in args.queries:
        samples = []
        for i in range(args.trials):
            spark.sparkContext.setJobDescription(f"r18 time {name} trial {i}")
            s0, j0 = jiffies()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            dt = time.perf_counter() - t0
            s1, j1 = jiffies()
            steal = 100.0 * (s1 - s0) / max(j1 - j0, 1)
            samples.append((dt, steal))
            spark.sparkContext.setJobDescription(None)
        # prefer trials the hypervisor didn't throttle: best-of over the
        # low-steal subset when one exists (this sandbox shows multi-second
        # windows of >20% steal that turn unchanged code 10x slower)
        clean = [s for s in samples if s[1] < 5.0] or samples
        best = min(s[0] for s in clean)
        med = sorted(s[0] for s in samples)[len(samples) // 2]
        print(
            f"[r18] {name}: best={best:.3f} med={med:.3f} "
            f"all={[(round(s, 3), round(st, 1)) for s, st in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
