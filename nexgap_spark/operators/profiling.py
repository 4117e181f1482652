"""Dataset profiling: per-column quality stats in a single scan.

One wide aggregate computes (non-null count, distinct count, min, max) for
every requested column simultaneously — ONE pass over the data, one
map-side-combinable aggregation — then a stack() unpivot reshapes the single
wide row into one row per column. Never N scans for N columns.
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
    """
    # A single-file local scan is one partition; the multi-distinct
    # aggregate would run serially on it. On a real cluster the scan has
    # thousands of splits and the repartition collapses to a no-op cost-wise
    # (it only evens out partial-agg parallelism).
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(par)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in cols
    )
    stacked = wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, _nn, _nd, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column_name",
        F.col("_n").cast("long").alias("n_rows"),
        (F.col("_n") - F.col("_nn")).cast("long").alias("n_null"),
        F.col("_nd").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
