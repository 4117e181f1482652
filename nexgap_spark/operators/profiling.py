"""Dataset profiling: per-column quality stats with ONE pass over the input.

Two aggregate branches over a SHARED, persisted column-pruned projection:
  1. one wide aggregate for (row count, per-column non-null count, min, max)
     — fully map-side-combinable, min/max on native types (string-cast
     ordering would be wrong for numerics);
  2. distinct counts via a stack() unpivot to (column_name, value) and a
     two-stage aggregate — the first groupBy dedups map-side, so the
     shuffle carries each partition's DISTINCT (column, value) pairs.

Why not the obvious alternatives, measured at sf0.1 (events, 5 cols):
  * count_distinct for every column inside ONE agg plans an Expand that
    replicates each row (k+1)× before the partial aggregate — 2.0 s vs
    0.9 s for the branches, and the replication cost grows with k.
  * two branches each re-reading the source scans the input twice — fine
    on a local parquet file, the single most expensive possible regression
    on a 100 TB fact table.
The persisted projection gives both properties: the source is scanned once
(branch 1 populates the cache, branch 2 reads it — Spark's CacheManager
dedups by logical plan, so repeated profile calls reuse one entry), and no
Expand. MEMORY_AND_DISK: a pruned projection that outgrows executor memory
spills instead of evicting to recompute-from-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so heterogeneous
    column types share one schema.

    Exact distinct counts (swap the distinct branch for
    approx_count_distinct in the wide agg at 100 TB — sketches merge
    map-side with no Expand and no distinct shuffle; exactness is kept here
    for oracle comparability). Distinct counting happens on the string-cast
    value, which is injective for the supported types (integers, doubles,
    strings, dates), so the counts equal native-type COUNT(DISTINCT).
    """
    from pyspark import StorageLevel

    df = df.select(*cols).persist(StorageLevel.MEMORY_AND_DISK)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(f"'{c}', _nn_{c}, _min_{c}, _max_{c}" for c in cols)
    base = wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, _nn, min_value, max_value)"
        ),
    )

    val_args = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    nd = (
        df.select(F.expr(f"stack({len(cols)}, {val_args}) AS (column_name, _v)"))
        .where(F.col("_v").isNotNull())
        .groupBy("column_name", "_v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )

    return base.join(F.broadcast(nd), "column_name", "left").select(
        "column_name",
        F.col("_n").cast("long").alias("n_rows"),
        (F.col("_n") - F.col("_nn")).cast("long").alias("n_null"),
        F.coalesce(F.col("_nd"), F.lit(0)).cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
