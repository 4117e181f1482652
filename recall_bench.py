"""ANN quality-at-scale harness: IVF recall@k vs nprobe on a ×MULT corpus.

Speed without a recall number is half a measurement: the IVF rows in
BENCH/SCALE show the probe is cheap, this shows what the cheapness buys.
Protocol: scale embeddings ×MULT (build_emb_dir — per-replica rotations,
so neighbors are non-degenerate), train K centroids with a few exact
Lloyd steps (operators.kmeans_update), take every STRIDE-th vector as a
query, compute exact brute-force top-k as ground truth, then measure
recall@k = |ivf_topk ∩ truth| / k and wall time per nprobe.

Usage: python recall_bench.py   (env: RECALL_MULT=100 RECALL_QUERIES=1000
RECALL_K=10 RECALL_CENTROIDS=16 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 —
the SCALE.md round-13 table used RECALL_MULT=100 RECALL_QUERIES=1000).
Prints one JSON line; the round's numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from nexgap_spark.operators import similarity as sim
from nexgap_spark.session import get_spark, load_table
from scale_bench import build_emb_dir


def main() -> None:
    mult = int(os.environ.get("RECALL_MULT", "100"))
    k = int(os.environ.get("RECALL_K", "10"))
    n_cent = int(os.environ.get("RECALL_CENTROIDS", "16"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("recall_bench")
    d = f"/tmp/nexgap_scale_emb_x{mult}"
    build_emb_dir(spark, sf_dir, mult, d)
    emb = load_table(spark, d, "embeddings")
    n = emb.count()

    # K seed vectors -> 3 exact Lloyd steps (enough to spread the seeds;
    # the harness measures the INDEX the engine would really serve, not a
    # lucky initialization)
    cents = emb.filter(F.col("vec_id") < n_cent).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    for _ in range(3):
        upd = sim.kmeans_update(emb, cents)
        cents = (
            upd.groupBy("centroid_id")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("pos", (F.col("dim_sum") / F.col("n_members")).alias("v")))
                ).alias("pairs")
            )
            .select(
                "centroid_id",
                F.expr("transform(pairs, p -> CAST(p.v AS float))").alias("embedding"),
            )
        )
        cents = spark.createDataFrame(cents.toPandas())  # pin tiny table

    n_queries = int(os.environ.get("RECALL_QUERIES", "100"))
    stride = max(n // n_queries, 1)
    queries = emb.filter(F.col("vec_id") % stride == 0)
    n_q = queries.count()

    t0 = time.time()
    truth_rows = sim.brute_force_topk(queries, emb, k=k).collect()
    t_brute = round(time.time() - t0, 2)
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r.q_id, set()).add(r.n_id)

    out = {
        "mult": mult, "corpus": n, "n_queries": n_q, "k": k,
        "n_centroids": n_cent, "brute_force_sec": t_brute, "nprobe": {},
    }
    # dedupe and cap at n_cent: probes beyond the centroid count are the
    # same exact search, and a duplicate key would silently overwrite the
    # earlier timing (r13 review). RECALL_NPROBES overrides the sweep —
    # the K≈sqrt(N) sizing run (r14) needs intermediate points
    probes_env = os.environ.get("RECALL_NPROBES", "")
    probes = (
        [int(p) for p in probes_env.split(",") if p.strip()]
        if probes_env
        else [1, 2, 4, 8, n_cent]
    )
    for nprobe in sorted({p for p in probes if p <= n_cent}):
        t0 = time.time()
        rows = sim.ivf_topk(queries, emb, cents, k=k, nprobe=nprobe).collect()
        dt = round(time.time() - t0, 2)
        got: dict = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.n_id)
        recall = sum(len(got.get(q, set()) & s) for q, s in truth.items()) / (
            len(truth) * k
        )
        out["nprobe"][str(nprobe)] = {"recall": round(recall, 4), "sec": dt}
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
