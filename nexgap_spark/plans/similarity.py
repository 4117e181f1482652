"""Embedding similarity-search queries over the ``embeddings`` table
(operators in nexgap_spark.operators.similarity).

Cross-engine float discipline: both sides compute dot products as an ordered
left-to-right fold over double-cast elements, so cosine values are
bit-comparable; outputs are additionally rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.operators import similarity as sim
from nexgap_spark.plans.registry import query
from nexgap_spark.session import load_table as t

# Ordered-fold dot product / norm in DuckDB (matches operators.similarity).
_DOT = (
    "list_aggregate(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
)
_NORM = (
    "sqrt(list_aggregate(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE)), 'sum'))"
)


def _cos(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)}))"


# ---------------------------------------------------------------------------
# q34 — brute-force cosine top-3 for a deterministic query subset
# (vec_id % 50 == 0). The exact baseline every ANN variant is judged against.
# ---------------------------------------------------------------------------


@query(
    "q34_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {_cos('q.embedding', 'c.embedding')} AS cos
      FROM embeddings q
      JOIN embeddings c ON c.vec_id != q.vec_id
      WHERE q.vec_id % 50 = 0
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rk
      FROM scored
    )
    SELECT q_id, n_id, ROUND(cos, 6) AS cos, rk FROM ranked WHERE rk <= 3
    """,
)
def q34_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    topk = sim.brute_force_topk(queries, emb, k=3)
    return topk.select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rk")


# ---------------------------------------------------------------------------
# q35 — IVF top-3 (coarse-quantizer routing, nprobe=1): centroids are the
# first 8 vectors (deterministic), search restricted to the query's cluster.
# The scale path — cost drops from |Q|·|C| to |Q|·|C|/k_clusters.
# ---------------------------------------------------------------------------


@query(
    "q35_ivf_topk",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {_cos('q.embedding', 'c.embedding')} AS cos
      FROM clusters q
      JOIN clusters c ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id
      WHERE q.vec_id % 50 = 0
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rk
      FROM scored
    )
    SELECT q_id, n_id, ROUND(cos, 6) AS cos, rk FROM ranked WHERE rk <= 3
    """,
)
def q35_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    topk = sim.ivf_topk(queries, emb, centroids, k=3)
    return topk.select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rk")


# ---------------------------------------------------------------------------
# q85 — IVF with nprobe=2: each query searches its TWO nearest clusters.
# The recall knob of a real IVF index; score work = Σ |Q probing c|·|C_c|,
# i.e. 2/k_clusters of brute force instead of 1/k_clusters.
# ---------------------------------------------------------------------------


@query(
    "q85_ivf_nprobe",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id, c_id FROM assigned WHERE rn <= 2 AND vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {_cos('q.embedding', 'c.embedding')} AS cos
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN clusters c ON c.centroid_id = p.c_id AND c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rk
      FROM scored
    )
    SELECT q_id, n_id, ROUND(cos, 6) AS cos, rk FROM ranked WHERE rk <= 3
    """,
)
def q85_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    topk = sim.ivf_topk(queries, emb, centroids, k=3, nprobe=2)
    return topk.select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rk")


# ---------------------------------------------------------------------------
# q106 — the PERSISTED IVF index path end-to-end: build_ivf_index writes the
# corpus parquet PARTITIONED BY centroid_id plus the centroid table, then
# ivf_topk_indexed answers the same queries as q85 by partition-PRUNED scan
# of only the probed clusters. Identical semantics contract to ivf_topk at
# equal (centroids, nprobe) — so the oracle is q85's SQL verbatim. This is
# the serve-at-scale story: at 100 TB the probed-cluster filter is the
# difference between scanning ~nprobe/k of the corpus and scanning all of
# it (tests/test_plan_audits.py asserts the scan's PartitionFilters).
# ---------------------------------------------------------------------------


@query(
    "q106_ivf_indexed",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id, c_id FROM assigned WHERE rn <= 2 AND vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             {_cos('q.embedding', 'c.embedding')} AS cos
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN clusters c ON c.centroid_id = p.c_id AND c.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rk
      FROM scored
    )
    SELECT q_id, n_id, ROUND(cos, 6) AS cos, rk FROM ranked WHERE rk <= 3
    """,
)
def q106_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE this plan constructor has a side effect by design: building a
    # persisted index IS the operator, so the parquet write happens here,
    # eagerly, even if the caller only explains the returned plan.
    import os
    import tempfile

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # Path is keyed by SF *and* Spark applicationId: deterministic within a
    # session (mode=overwrite → idempotent reruns) but private across
    # sessions, so two concurrent runs on the same SF (e.g. selfcheck +
    # bench) can never race overwrite-vs-read on a shared /tmp directory.
    path = os.path.join(
        tempfile.gettempdir(),
        "nexgap_ivf_index_{}_{}".format(
            os.path.basename(os.path.normpath(sf_dir)),
            spark.sparkContext.applicationId,
        ),
    )
    sim.build_ivf_index(emb, centroids, path)
    topk = sim.ivf_topk_indexed(queries, path, k=3, nprobe=2)
    return topk.select("q_id", "n_id", "cos", F.col("rank").alias("rk"))


# ---------------------------------------------------------------------------
# baseline_q36 — blocked embedding near-dup scan: per label (the blocking
# key), pair count above threshold + the maximum cosine observed.
#
# SCALE BOUNDARY / BASELINE NAMESPACE (r14): this is the declared
# quadratic-in-block all-pairs BASELINE — cost Σ_block |b|² — correct at
# any scale but only economical while the largest block stays small. It
# exists to cross-check the scale twins: the sign-LSH bucketed scan (q45)
# and SemDeDup's centroid-bounded pass (q102), which replace the block
# quadratic with bucket-bounded work and ARE the headline rows. The
# `baseline_` prefix segregates it from every scale-claimed total (bench
# reports baselines separately; catalog orders them after every
# non-window query — r14's window slot is the deliberate exception).
#
# r13: the query runs the Arrow Gram-kernel twin (bit-identical cosines
# via the shared sequential fold) — 100.7 s → ~4 s at sf1.0. The
# asymptotics are unchanged (still Σ|b|²); only the per-pair constant is.
# ---------------------------------------------------------------------------


@query(
    "baseline_q36_embedding_near_dup",
    baseline=True,
    oracle=f"""
    WITH pairs AS (
      SELECT a.label AS blk, a.vec_id AS a, b.vec_id AS b,
             {_cos('a.embedding', 'b.embedding')} AS cos
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT blk AS label,
           COUNT(*) AS n_pairs,
           CAST(SUM(CASE WHEN cos >= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           ROUND(MAX(cos), 6) AS max_cos
    FROM pairs
    GROUP BY blk
    """,
)
def baseline_q36_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pairs = sim.blocked_near_dup_arrow(emb, threshold=-1.0)  # keep all; aggregate below
    return pairs.groupBy(F.col("blk").alias("label")).agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("cos") >= 0.25).cast("long")).alias("n_near"),
        F.round(F.max("cos"), 6).alias("max_cos"),
    )


# ---------------------------------------------------------------------------
# q45 — hyperplane sign-LSH bucketed similarity scan: the ANN scale path
# that replaces the |V|² all-pairs with Σ_bucket |b|² (256 buckets from 8
# deterministic integer hyperplanes shared verbatim with the oracle).
#
# The oracle models the UNCAPPED same-bucket pair set; the operator's
# default mega-bucket guard (max_bucket_size=10_000, salt) only bites when
# a single sign bucket exceeds 10k vectors — far above every driver SF
# (sf0.1: ~750 rows TOTAL). The query pins max_bucket_size=None so the
# oracle contract is exact at ANY scale; production callers keep the
# scale-guard default (same split as q31, whose capped re-plan is the
# documented precedent).
# ---------------------------------------------------------------------------


def _plane_literal(plane: list[int]) -> str:
    return "[" + ", ".join(str(v) for v in plane) + "]"


# bits scale with N (VERDICT r9 item 5): 2^planes buckets should track
# corpus size so per-bucket occupancy — and the quadratic per-bucket pair
# work — stays constant across decades. The driver gate never sets the env
# var, so the recorded oracle contract stays the base 8-plane one;
# scale_bench's ANN family raises it with the multiplier (e.g. 8 + ~log2(m)).
import os as _os

_Q45_PLANES = int(_os.environ.get("NEXGAP_Q45_PLANES", "8"))


def _bucket_sql(v: str) -> str:
    parts = []
    for j, plane in enumerate(sim.hyperplanes(_Q45_PLANES)):
        d = (
            "list_aggregate(list_transform(range(1, 65), "
            f"i -> CAST({v}[i] AS DOUBLE) * ({_plane_literal(plane)})[CAST(i AS INT)]), 'sum')"
        )
        parts.append(f"CASE WHEN {d} >= 0 THEN {1 << j} ELSE 0 END")
    return "(" + " + ".join(parts) + ")"


@query(
    "q45_hyperplane_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
    ),
    pairs AS (
      SELECT l.vec_id AS a, r.vec_id AS b,
             {_cos('l.embedding', 'r.embedding')} AS cos
      FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(COALESCE(SUM(CASE WHEN cos >= 0.2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_similar,
           ROUND(COALESCE(MAX(cos), 0.0), 6) AS max_cos
    FROM pairs
    """,
)
def q45_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    pairs = sim.hyperplane_lsh_pairs(
        emb, max_bucket_size=None, n_planes=_Q45_PLANES
    )
    return pairs.agg(
        F.count("*").alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(F.col("cos") >= 0.2, 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_similar"),
        F.round(F.coalesce(F.max("cos"), F.lit(0.0)), 6).alias("max_cos"),
    )


# ---------------------------------------------------------------------------
# q61 — centroid outliers (operators.similarity.centroid_outliers): distance
# of each embedding to its label centroid, k farthest — the
# mislabel/outlier-mining shape over an embedding column.
# ---------------------------------------------------------------------------


@query(
    "q61_centroid_outliers",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, i.i AS pos, CAST(embedding[i.i] AS DOUBLE) AS val
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS i(i)
    ),
    cent AS (SELECT label, pos, AVG(val) AS c FROM ex GROUP BY label, pos),
    d AS (
      SELECT e.vec_id, e.label,
             SQRT(SUM((e.val - cent.c) * (e.val - cent.c))) AS dist
      FROM ex e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, ROUND(dist, 6) AS dist
    FROM d ORDER BY dist DESC, vec_id LIMIT 10
    """,
)
def q61_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    out = sim.centroid_outliers(emb, k=10)
    return out.select("vec_id", "label", F.round("dist", 6).alias("dist"))


# ---------------------------------------------------------------------------
# q102 — SemDeDup-style semantic dedup: nearest-centroid clustering (20
# deterministic centroids: vec_id % 25 == 0) bounds the pairwise cosine
# scan to within-cluster pairs; the higher id of any pair at/over the
# threshold is dropped (min-id survives). Output: the kept vec_ids. Both
# sides share the bit-stable ordered-fold cosine, so the oracle is exact.
# ---------------------------------------------------------------------------


@query(
    "q102_semantic_dedup",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 25 = 0
    ),
    scored AS (
      SELECT v.vec_id, c.cid, {_cos('v.embedding', 'c.cvec')} AS sim
      FROM embeddings v CROSS JOIN cents c
    ),
    best AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        FROM scored) t WHERE rn = 1
    ),
    assigned AS (
      SELECT b.vec_id, b.cid, e.embedding FROM best b JOIN embeddings e USING (vec_id)
    ),
    dropped AS (
      SELECT DISTINCT y.vec_id AS vec_id
      FROM assigned x JOIN assigned y ON x.cid = y.cid AND x.vec_id < y.vec_id
      WHERE isnan({_cos('x.embedding', 'y.embedding')}) = false
        AND {_cos('x.embedding', 'y.embedding')} >= 0.3
    )
    SELECT vec_id FROM embeddings
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ORDER BY vec_id
    """,
)
def q102_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    # cap pinned to None: the oracle models the UNCAPPED within-cluster
    # pair set (q45's documented precedent); production callers keep the
    # salt-split scale-guard default
    kept = sim.semantic_dedup(emb, cents, threshold=0.3, max_cluster_size=None)
    return kept.select("vec_id").orderBy("vec_id")


# ---------------------------------------------------------------------------
# q120 — the QUANTIZED IVF probe end-to-end (round 15): build_ivf_index
# (quantize=True) persists int8 vectors (+qscale/l2n) next to the floats;
# ivf_topk_indexed_int8 selects candidates reading ONLY the int8 columns
# (partition-pruned AND column-pruned scan) and reranks the global top
# rerank_factor·k in exact float. The oracle replays the whole path in
# SQL: same q = floor(127·x/safe + 0.5) quantization, same ordered-fold
# int8 approximate cosine for candidate selection (the Spark kernel uses
# the shared sequential fold precisely so selection TIES break
# identically cross-engine), same exact-float rerank — so the value hash
# pins candidate selection, not just the final scores.
# ---------------------------------------------------------------------------

_Q8 = "floor(127 * CAST({v}[i] AS DOUBLE) / {safe} + 0.5)"
_ADOT = (
    "list_aggregate(list_transform(range(1, 65), "
    "i -> CAST({q}[i] AS DOUBLE) * " + _Q8 + "), 'sum')"
)


@query(
    "q120_ivf_int8_probe",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    q8 AS (
      SELECT vec_id, centroid_id, embedding,
             CASE WHEN mx = 0 THEN 1.0 ELSE mx END AS safe
      FROM (
        SELECT vec_id, centroid_id, embedding,
               list_max(list_transform(range(1, 65),
                 i -> abs(CAST(embedding[i] AS DOUBLE)))) AS mx
        FROM clusters
      )
    ),
    probes AS (
      SELECT vec_id, c_id FROM assigned WHERE rn <= 2 AND vec_id % 50 = 0
    ),
    acand AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             ({_ADOT.format(q='q.embedding', v='c.embedding', safe='c.safe')}
              * (c.safe / 127))
             / ({_NORM.format(a='q.embedding')} * {_NORM.format(a='c.embedding')})
               AS acos
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN q8 c ON c.centroid_id = p.c_id AND c.vec_id != q.vec_id
    ),
    sel AS (
      SELECT q_id, n_id,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY acos DESC, n_id) AS arn
      FROM acand
    ),
    rescored AS (
      SELECT s.q_id, s.n_id, {_cos('q.embedding', 'c.embedding')} AS cos
      FROM sel s
      JOIN embeddings q ON q.vec_id = s.q_id
      JOIN embeddings c ON c.vec_id = s.n_id
      WHERE s.arn <= 6
    ),
    ranked AS (
      SELECT q_id, n_id, cos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS INT) AS rk
      FROM rescored
    )
    SELECT q_id, n_id, ROUND(cos, 6) AS cos, rk FROM ranked WHERE rk <= 3
    """,
)
def q120_ivf_int8_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # side effect by design, same as q106: building the quantized index IS
    # the operator under test
    import os
    import tempfile

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        "nexgap_ivf8_index_{}_{}".format(
            os.path.basename(os.path.normpath(sf_dir)),
            spark.sparkContext.applicationId,
        ),
    )
    sim.build_ivf_index(emb, centroids, path, quantize=True)
    topk = sim.ivf_topk_indexed_int8(
        queries, path, k=3, nprobe=2, rerank_factor=2
    )
    return topk.select("q_id", "n_id", "cos", F.col("rank").alias("rk"))


# ---------------------------------------------------------------------------
# q121 — the NO-RERANK int8 probe (round 16): rank by the int8 approximate
# cosine alone, float column never read — the measured 4x-bytes serving
# shape (ivf_topk_indexed_int8 docstring rule; the round-16 bytes rows
# showed the rerank's "candidate-filtered" float read still scans the
# probed partitions' float column in a pure-parquet deployment). The
# oracle replays quantization + the ordered-fold int8 cosine and emits the
# APPROXIMATE score — both engines fold left-to-right, so the 6dp-rounded
# values and the tie-broken ranking hash-match exactly.
# ---------------------------------------------------------------------------


@query(
    "q121_ivf_int8_norerank",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    q8 AS (
      SELECT vec_id, centroid_id, embedding,
             CASE WHEN mx = 0 THEN 1.0 ELSE mx END AS safe
      FROM (
        SELECT vec_id, centroid_id, embedding,
               list_max(list_transform(range(1, 65),
                 i -> abs(CAST(embedding[i] AS DOUBLE)))) AS mx
        FROM clusters
      )
    ),
    probes AS (
      SELECT vec_id, c_id FROM assigned WHERE rn <= 2 AND vec_id % 50 = 0
    ),
    acand AS (
      SELECT q.vec_id AS q_id, c.vec_id AS n_id,
             ({_ADOT.format(q='q.embedding', v='c.embedding', safe='c.safe')}
              * (c.safe / 127))
             / ({_NORM.format(a='q.embedding')} * {_NORM.format(a='c.embedding')})
               AS acos
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN q8 c ON c.centroid_id = p.c_id AND c.vec_id != q.vec_id
    ),
    sel AS (
      SELECT q_id, n_id, acos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY acos DESC, n_id) AS INT) AS rk
      FROM acand
    )
    SELECT q_id, n_id, ROUND(acos, 6) AS cos, rk FROM sel WHERE rk <= 3
    """,
)
def q121_ivf_int8_norerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        "nexgap_ivf8nr_index_{}_{}".format(
            os.path.basename(os.path.normpath(sf_dir)),
            spark.sparkContext.applicationId,
        ),
    )
    sim.build_ivf_index(emb, centroids, path, quantize=True)
    topk = sim.ivf_topk_indexed_int8(
        queries, path, k=3, nprobe=2, rerank_factor=0
    )
    return topk.select("q_id", "n_id", "cos", F.col("rank").alias("rk"))


# ---------------------------------------------------------------------------
# q122 — PQ-ADC top-3 against the persisted IVF index (nprobe=2): the
# bytes-floor probe. Codebooks are deterministic data rows (codeword (j, i)
# = subspace-j slice of vec_id i, i < 8; m=4 subspaces of 16 dims) — the
# same data-as-parameters convention as q35's centroids, which lets the
# oracle rebuild the codebook, replay the per-subspace ordered-fold L2
# argmin encode (ties -> lowest code), reconstruct each candidate, and
# score the reconstruction with the shared cosine fold. The probe scans
# ONLY (id, centroid_id, pqcodes) — m BYTES per candidate (plan-audited);
# the float and int8 columns never enter the scan.
# ---------------------------------------------------------------------------


@query(
    "q122_pq_adc_topk",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (
      SELECT vec_id, embedding, c_id AS centroid_id FROM assigned WHERE rn = 1
    ),
    subs AS (SELECT CAST(UNNEST(range(4)) AS INT) AS j),
    cb AS (
      SELECT j, CAST(vec_id AS INT) AS code,
             list_transform(range(CAST(j*16+1 AS INT), CAST(j*16+17 AS INT)),
                            i -> CAST(embedding[i] AS DOUBLE)) AS cw
      FROM embeddings CROSS JOIN subs WHERE vec_id < 8
    ),
    enc AS (
      SELECT v.vec_id, c.j, c.cw,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id, c.j ORDER BY
               list_aggregate(list_transform(range(1, 17),
                 i -> (CAST(v.embedding[c.j*16 + i] AS DOUBLE) - c.cw[i])
                    * (CAST(v.embedding[c.j*16 + i] AS DOUBLE) - c.cw[i])),
                 'sum') ASC, c.code) AS rn
      FROM clusters v CROSS JOIN cb c
    ),
    recon AS (
      SELECT vec_id, flatten(list(cw ORDER BY j)) AS rvec
      FROM enc WHERE rn = 1 GROUP BY vec_id
    ),
    probes AS (
      SELECT vec_id, c_id FROM assigned WHERE rn <= 2 AND vec_id % 50 = 0
    ),
    acand AS (
      SELECT q.vec_id AS q_id, cand.vec_id AS n_id,
             ({_DOT.format(a='q.embedding', b='r.rvec')})
             / ({_NORM.format(a='q.embedding')} * {_NORM.format(a='r.rvec')})
               AS acos
      FROM probes p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN clusters cand ON cand.centroid_id = p.c_id AND cand.vec_id != q.vec_id
      JOIN recon r ON r.vec_id = cand.vec_id
    ),
    sel AS (
      SELECT q_id, n_id, acos,
             CAST(ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY acos DESC, n_id) AS INT) AS rk
      FROM acand
    )
    SELECT q_id, n_id, ROUND(acos, 6) AS cos, rk FROM sel WHERE rk <= 3
    """,
)
def q122_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from nexgap_spark.operators import pq

    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    codebooks = pq.pq_codebooks_from_rows(emb, m=4, ksub=8)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    path = os.path.join(
        tempfile.gettempdir(),
        "nexgap_ivfpq_index_{}_{}".format(
            os.path.basename(os.path.normpath(sf_dir)),
            spark.sparkContext.applicationId,
        ),
    )
    sim.build_ivf_index(emb, centroids, path, pq_codebooks=codebooks)
    topk = pq.ivf_topk_indexed_pq(queries, path, k=3, nprobe=2)
    return topk.select("q_id", "n_id", "cos", F.col("rank").alias("rk"))
