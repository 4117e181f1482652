"""local-cluster smoke run (VERDICT r10 item 7): the same headline
queries under local[32] and local-cluster[4,8,4096] — 4 separate
executor JVMs × 8 cores × 4 GiB, so broadcasts are per-executor
serialized, shuffles cross process boundaries over loopback, and Python
workers fork per executor. local[32] hides all three; a query whose cost
is dominated by any of them diverges here, which is the point of the
smoke: catch executor-boundary serialization surprises before a real
cluster does.

Usage: python cluster_smoke.py  → one JSON line
  {"sf_dir": ..., "local": {q: sec}, "local_cluster": {q: sec},
   "delta": {q: cluster/local ratio}}
Queries: the span family (broadcast-build heavy), the dedup headliners
(shuffle heavy), one ANN probe (broadcast + Arrow stage), one media row
(Python-worker heavy). sf0.1 catalog queries — small enough that 4 GiB
executors hold them, big enough that an executor boundary shows.
"""

from __future__ import annotations

import json
import os
import sys
import time

QUERIES = [
    "q21_span_last_per_group",
    "q22_span_parent_join",
    "q23_span_root_walk",
    "q37_convert_pipeline",
    "q27_exact_dedup_stats",
    "q31_minhash_lsh_pairs",
    "q43_dup_groups",
    "q44_dedup_corpus",
    "q35_ivf_topk",
    "q110_jpeg_features",
]
TRIALS = int(os.environ.get("CLUSTER_SMOKE_TRIALS", "2"))


def run_master(master: str, sf_dir: str) -> dict[str, float]:
    os.environ["SPARK_MASTER"] = master
    from nexgap_spark.plans import QUERIES as CATALOG
    from nexgap_spark.session import get_spark, invalidate_scan_cache

    # cached scans are bound to their session; a new master = new session
    invalidate_scan_cache()

    # First real executor-boundary finding of this smoke: in local[*] the
    # Python workers inherit the driver's sys.path, so the package (and
    # its daemon_preload module) import for free. Separate executor JVMs
    # do NOT — their python workers failed with ModuleNotFoundError for
    # 'nexgap_spark' until the repo root was shipped via
    # spark.executorEnv.PYTHONPATH. On a real cluster the equivalent is
    # --py-files / a wheel on the image; session.py's find_spec guard runs
    # on the DRIVER and cannot see this.
    repo_root = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark(f"smoke_{master.split('[')[0]}", extra_conf={
        "spark.master": master,
        "spark.executorEnv.PYTHONPATH": repo_root,
    })
    # python-worker + JIT warmup, same as bench.py
    spark.range(32 * 1024).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    out: dict[str, float] = {}
    for name in QUERIES:
        best = None
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            CATALOG[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 2)
        print(f"[smoke] {master} {name}: {best:.2f}s", file=sys.stderr)
    spark.stop()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    local = run_master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]", sf_dir)
    cluster = run_master("local-cluster[4,8,4096]", sf_dir)
    delta = {
        q: round(cluster[q] / local[q], 2) if local.get(q) else None
        for q in QUERIES
    }
    print(json.dumps({
        "sf_dir": sf_dir,
        "local": local,
        "local_cluster": cluster,
        "delta": delta,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
