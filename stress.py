#!/usr/bin/env python
"""Scale-stress harness: does each custom operator scale linearly?

Multiplies the sf0.1 tables in memory along the SCALE-OUT axis — M× more
users / documents / vectors at the same per-key density, which is how 100 TB
differs from 10 GB on a real cluster — and times the operators whose scaling
behavior matters most: sessionization, as-of join, range join, MinHash
signatures + LSH pairing, and brute-force cosine top-k (fixed query set,
growing corpus).

Replicated keys are shifted into disjoint ranges (and document text is
salted per replica) so no artificial cross-replica matches appear: output
sizes scale linearly, so wall time should too. A `scaling` ratio far above
the multiplier (after subtracting fixed overhead) flags a quadratic path.

Prints ONE JSON line:
  {"multiplier": M, "sf": 0.1, "ops": {name: {"sec_1x": s, "sec_mx": s,
   "rows_1x": n, "rows_mx": n, "scaling": sec_mx/sec_1x}}}

Not part of the driver's bench contract (bench.py is); run ad hoc:
  SPARK_GRAFT_STRESS_MULT=10 python stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

from nexgap_spark.operators import (
    curation,
    dedup,
    profiling,
    sampling,
    similarity,
    text,
    timeseries,
)
from nexgap_spark.operators.sessionize import sessionize
from nexgap_spark.operators.similarity import brute_force_topk
from nexgap_spark.operators.temporal_join import asof_join, range_join
from nexgap_spark.session import get_spark, load_table


def _multiply(df: DataFrame, m: int, id_cols: list[str], salt_text: str | None = None) -> DataFrame:
    """M copies with key columns shifted into disjoint ranges per replica."""
    if m == 1:
        return df
    shifts = {c: df.agg(F.max(c)).first()[0] + 1 for c in id_cols}
    rep = df.sparkSession.range(m).withColumnRenamed("id", "_rep")
    out = df.crossJoin(F.broadcast(rep))
    for c, s in shifts.items():
        out = out.withColumn(c, F.col(c) + F.col("_rep") * F.lit(s))
    if salt_text:
        # suffix EVERY token with the replica id: every shingle differs
        # across replicas, so MinHash/LSH finds no cross-replica near-dups
        # and dup-cluster sizes stay constant as the corpus grows
        out = out.withColumn(
            salt_text,
            F.regexp_replace(
                F.col(salt_text), F.lit(r"(\S+)"), F.concat(F.lit(r"$1_"), F.col("_rep"))
            ),
        )
    return out.drop("_rep")


def _timed(build, *, cache_inputs: list[DataFrame]) -> tuple[float, int]:
    for df in cache_inputs:
        df.cache().count()  # materialize inputs so timing measures the operator
    t0 = time.perf_counter()
    # time build() too: iterative operators (label propagation) execute
    # their rounds eagerly during construction, not at the sink
    out = build()
    # noop sink: forces every column of every row to be computed — count()
    # would let Catalyst prune windows/projections and time nothing
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    n = out.count()
    for df in cache_inputs:
        df.unpersist()
    return round(dt, 3), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = int(os.environ.get("SPARK_GRAFT_STRESS_MULT", "10"))
    spark = get_spark("nexgap_stress")
    spark.range(32 * 1024).repartition(32).mapInPandas(lambda it: it, "id long").count()

    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    queries_1x = emb.filter(F.col("vec_id") % 50 == 0)

    def ops_for(mult: int):
        e = _multiply(ev, mult, ["event_id", "user_id"])
        d = _multiply(docs, mult, ["doc_id"], salt_text="text")
        c = _multiply(emb, mult, ["vec_id"])
        purchases = e.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        views = e.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id", "value"
        )
        sh = dedup.shingle_table(d)
        return {
            "sessionize": ([e], lambda: sessionize(e, order_tiebreak="event_id")),
            "asof_join": (
                [e],
                lambda: asof_join(purchases, views.groupBy("user_id", "ts").agg(
                    F.max("event_id").alias("view_event_id")
                ), on="user_id", right_cols=["view_event_id"]),
            ),
            "range_join": (
                [e],
                lambda: range_join(purchases, views, on="user_id", window_s=3600.0, suffix="_v"),
            ),
            "minhash_lsh_pairs": (
                [d],
                lambda: dedup.lsh_candidate_pairs(
                    dedup.minhash_signatures(sh, num_hashes=8), bands=4, rows_per_band=2
                ),
            ),
            # iterative hash-min label propagation: rounds = component
            # diameter (constant per replica), so time should stay linear
            "dup_groups_cc": (
                [d],
                lambda: dedup.dup_groups(
                    dedup.verify_jaccard(
                        dedup.lsh_candidate_pairs(
                            dedup.minhash_signatures(sh, num_hashes=8),
                            bands=4,
                            rows_per_band=2,
                        ),
                        sh,
                    ).filter(F.col("jaccard") >= 0.2)
                ),
            ),
            "cosine_topk_fixed_queries": (
                [c],
                lambda: brute_force_topk(queries_1x, c, k=3),
            ),
            # ×2 row replication before the shuffle, then plain agg — the
            # hop factor (window/slide) is the constant to watch, not M
            "hopping_windows": (
                [e],
                lambda: timeseries.hopping_window_agg(
                    e, window="10 minutes", slide="5 minutes",
                    aggs=[F.count("*").alias("n")],
                ),
            ),
            # two windows + groupBy over ONE stratum shuffle; stratum count
            # is constant while rows/stratum grows M× (scale-up axis)
            "stratified_sample": (
                [e],
                lambda: sampling.stratified_sample(
                    e.select("event_id", "event_type"),
                    strata_cols=["event_type"], key_col="event_id",
                    fraction=0.05,
                ),
            ),
            # explode ×tokens, two Zipf-compressed aggs, broadcast joins;
            # salted text grows the vocabulary M× — the df table must stay
            # broadcast-small relative to the corpus
            "tfidf": ([d], lambda: text.tfidf(d)),
            # 7× bounded fan-out then one hash agg — shuffle grows 7M×,
            # distinct-key cardinality is the constant to watch
            "rolling_distinct": (
                [e],
                lambda: timeseries.rolling_distinct(e, window_days=7),
            ),
            # chained running-max windows share ONE per-user sort; cost is
            # the sort of M× rows, not the number of funnel steps
            "ordered_funnel": (
                [e],
                lambda: timeseries.ordered_funnel(
                    e, steps=["view", "click", "purchase"], within_seconds=3600
                ),
            ),
            # corpus-side gram stream vs broadcast benchmark gram set; the
            # corpus is never shuffled on gram, only on doc id
            "decontaminate": (
                [d],
                lambda: curation.contamination_scores(
                    d, docs.limit(200), n=8
                ),
            ),
            # single unpivot pass; shuffle ∝ per-partition distinct
            # (column, value) pairs, which grows with M here because the
            # multiplied ids are all distinct — worst case for the operator
            "profile_columns": (
                [e],
                lambda: profiling.profile_columns(
                    e, cols=["event_id", "user_id", "event_type", "value"]
                ),
            ),
            # salted mega-bucket treatment: the replicas share salted text,
            # so bucket sizes grow M× and the sub-bucket split must keep
            # pair output ∝ size·cap, not size²
            "lsh_pairs_salted": (
                [d],
                lambda: dedup.lsh_candidate_pairs(
                    dedup.minhash_signatures(sh, num_hashes=8),
                    bands=4,
                    rows_per_band=2,
                    max_bucket_size=500,
                    oversized="salt",
                ),
            ),
            # batch-vs-ledger banded join: salted text keeps per-replica
            # near-dup structure constant, so candidates (and the ledger
            # join's output) grow M×, never M² — the ingest-gate contract
            "incremental_minhash": (
                [d],
                lambda: dedup.incremental_minhash(
                    d.filter(F.col("doc_id") % 3 == 0),
                    dedup.minhash_signatures(
                        dedup.shingle_table(d.filter(F.col("doc_id") % 3 != 0))
                    ),
                )[0],
            ),
            # per-cluster Arrow block scan: replicas shift vec ids but share
            # values, so every cluster grows M× — the salt cap must keep
            # per-task pair work ∝ size·cap, and routing is one broadcast
            # numpy pass per partition
            "semantic_dedup": (
                [c],
                lambda: similarity.semantic_dedup(
                    c, queries_1x.select(
                        F.col("vec_id").alias("centroid_id"), "embedding"
                    ),
                    threshold=0.3, max_cluster_size=500,
                ),
            ),
            # bigram LM: train = two hash aggs over the exploded stream;
            # scoring joins against the broadcast count tables — salted text
            # grows the vocabulary M×, watch the broadcast build
            "ngram_logprob": ([d], lambda: text.ngram_logprob(d)),
            # sign-LSH with the round-6 bucket cap: replicas share embedding
            # VALUES (only ids shift), so every bucket grows M× — without
            # the cap, pair output and single-task work grow M²; salted,
            # output is bounded by size·cap and must scale ~linearly
            "hyperplane_lsh_capped": (
                [c],
                lambda: similarity.hyperplane_lsh_pairs(
                    c, max_bucket_size=500, oversized="salt"
                ),
            ),
        }

    only = os.environ.get("SPARK_GRAFT_STRESS_OPS")
    wanted = {s.strip() for s in only.split(",")} if only else None

    results: dict[str, dict[str, float | int]] = {}
    for mult, tag in ((1, "1x"), (m, "mx")):
        for name, (inputs, build) in ops_for(mult).items():
            if wanted is not None and name not in wanted:
                continue
            sec, rows = _timed(build, cache_inputs=inputs)
            results.setdefault(name, {})[f"sec_{tag}"] = sec
            results[name][f"rows_{tag}"] = rows
            print(f"[stress] {name} @{mult}x: {sec}s ({rows} rows)", file=sys.stderr)
    for name, r in results.items():
        r["scaling"] = round(r["sec_mx"] / max(r["sec_1x"], 1e-9), 2)

    sf_val = None
    import re

    sf_m = re.search(r"sf([0-9.]+)", sf_dir)
    if sf_m:
        sf_val = float(sf_m.group(1))
    print(json.dumps({"multiplier": m, "sf": sf_val, "ops": results}))


if __name__ == "__main__":
    sys.exit(main())
