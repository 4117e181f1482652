"""Embedding similarity search (scale extension): brute-force cosine top-k as
the exact baseline, IVF (coarse-quantizer cluster routing) as the scale path,
and blocked near-duplicate detection.

All dot products run JVM-side via zip_with + aggregate (sequential fold, so
results are bit-stable and engine-comparable). No Python in the loop; the
quadratic stages are explicitly bounded (query subset × corpus, or
within-cluster only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side broadcasts
    (it is the small side by contract); the corpus streams once. Returns
    (q_id, n_id, cos, rk). Scale: cost = |Q|·|C| dot products, distributed
    over corpus splits — use IVF below when |Q| is large."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        q.join(c, F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF coarse quantization: route each vector to its nearest centroid
    (max cosine; deterministic tiebreak on centroid id). Centroids broadcast;
    one pass over the corpus, no shuffle of the vectors themselves."""
    cent = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("_c_id"), F.col(vec_col).alias("_c_vec")
        )
    )
    scored = vectors.join(cent).withColumn(
        "_sim", cosine(F.col(vec_col), F.col("_c_vec"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("_sim").desc(), F.col("_c_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_sim", "_c_vec")
        .withColumnRenamed("_c_id", centroid_id_col)
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: route queries and corpus to centroids, then search
    only within the query's cluster (nprobe=1). Recall trades against the
    |Q|·|C| blow-up — the standard IVF bargain; raise nprobe by unioning
    nearest-m centroids per query when recall matters."""
    c_assigned = assign_clusters(corpus, centroids, id_col=id_col, vec_col=vec_col)
    q_assigned = assign_clusters(queries, centroids, id_col=id_col, vec_col=vec_col)
    q = q_assigned.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), "centroid_id"
    )
    c = c_assigned.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), "centroid_id"
    )
    scored = (
        q.join(c, "centroid_id")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def blocked_near_dup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks (e.g. a coarse
    cluster or label). Blocking bounds the quadratic term to the largest
    block; pair (a < b) output with cosine ≥ threshold."""
    a = vectors.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("a_vec"), F.col(block_col).alias("blk")
    )
    b = vectors.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("b_vec"), F.col(block_col).alias("blk")
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos", "blk")
    )
