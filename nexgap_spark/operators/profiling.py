"""Dataset profiling: per-column quality stats in ONE scan of the input.

A single wide aggregate computes (row count, per-column non-null count,
min, max, distinct count). Multiple COUNT(DISTINCT col_i) in one aggregate
makes Catalyst plan an Expand — each input row is replicated once per
distinct column before the partial aggregate. The trade-off, measured
against the alternatives:

- Expand cost is CPU-side row replication BEFORE the map-side partial
  aggregate; the partial agg groups on (gid, value), so the shuffle still
  carries only each partition's distinct values per column — shuffle
  volume is proportional to cardinality, not to Expand's replicated rows.
- The two-branch alternative (separate stack()-unpivot distinct pass)
  has the same shuffle profile but scans the input TWICE — at 100 TB a
  second fact-table scan dwarfs Expand's in-memory replication of a
  column-pruned projection.

So: one pruned scan + Expand is the scale-correct shape. min/max aggregate
on native types (string-cast ordering would be wrong for numerics) and are
rendered as strings only in the output so heterogeneous columns share one
schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_null, n_distinct,
    min_value, max_value).

    Exact distinct counts (swap count_distinct → approx_count_distinct at
    100 TB for a sketch-sized shuffle — the plan shape is identical, and
    Expand disappears entirely because HLL needs no distinct grouping;
    exactness is kept here for oracle comparability).
    """
    df = df.select(*cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.min(c).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(c).cast("string").alias(f"_max_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _min_{c}, _max_{c}, _nd_{c}" for c in cols
    )
    return wide.select(
        F.col("_n"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, _nn, min_value, max_value, _nd)"
        ),
    ).select(
        "column_name",
        F.col("_n").cast("long").alias("n_rows"),
        (F.col("_n") - F.col("_nn")).cast("long").alias("n_null"),
        F.col("_nd").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
