"""Dataset profiling: per-column quality stats without N-scans-for-N-columns.

Two branches over a column-pruned scan:
  1. one wide aggregate for (row count, per-column non-null count, min, max)
     — fully map-side-combinable, no Expand;
  2. distinct counts via a stack() unpivot to (column_name, value) followed
     by a two-stage aggregate — the first groupBy dedups map-side, so the
     shuffle carries each partition's DISTINCT (column, value) pairs, not
     the unpivoted rows.

The naive alternative — count_distinct for every column inside one agg —
plans an Expand that replicates every input row once per distinct column
(k+1× the scan volume into the shuffle). Splitting the distinct branch
keeps shuffle volume proportional to cardinality, which is what survives a
100 TB scan; min/max stay on native types so ordering is correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so heterogeneous
    column types share one schema.

    Exact distinct counts (swap in approx_count_distinct at 100 TB — the
    shape is identical; exactness is kept here for oracle comparability).
    Distinct counting happens on the string-cast value, which is injective
    for the supported types (integers, doubles, strings, dates), so the
    counts equal native-type COUNT(DISTINCT).
    """
    df = df.select(*cols)
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
