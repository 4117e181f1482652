"""Dataset profiling: per-column quality stats in ONE scan, ONE main shuffle.

Single pass: stack()-unpivot every profiled column to (column_name, value)
rows — nulls kept — then aggregate twice on the SAME stream:

  1. groupBy(column_name, value) → per-value counts. Map-side combine means
     the shuffle carries each partition's DISTINCT (column, value) pairs,
     i.e. volume ∝ cardinality, not input rows.
  2. groupBy(column_name) folds those into n_rows / n_null / n_distinct,
     and recovers min/max by re-casting the string value back to each
     column's native type inside conditional aggregates — so numeric
     ordering is correct without a separate native-typed pass.

Shapes this replaced, with sf0.1 measurements (orders, 5 cols):
  * two branches re-scanning the source: 0.9 s locally but TWO full input
    scans — the worst possible regression on a 100 TB fact table;
  * one wide agg with count_distinct per column: single scan but Catalyst
    plans an Expand that replicates every row (k+1)× — 2.0 s;
  * two branches over a persisted pruned projection: single I/O scan but
    the cache build costs more than it saves (3.9 s cold, 1.6 s warm) and
    pins executor memory.
This shape is the only one that wins at both scales: one scan, no cache,
no Expand, shuffle ∝ cardinality (the 100 TB knob is
spark.sql.shuffle.partitions for stage 1).

Type contract: values round-trip through CAST(x AS STRING) and back, which
is exact for the supported profile types (integers, doubles, strings,
dates) — so distinct counts and min/max equal their native-type results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bt(name: str) -> str:
    """Backtick-quote a column name for generated SQL, so names needing
    quoting (space, dash, dot) parse and bind correctly instead of failing
    or resolving as nested-field paths (r12 review finding). Embedded
    backticks double, per the SQL identifier-escape rule."""
    return "`" + name.replace("`", "``") + "`"


def _slit(s: str) -> str:
    """Single-quoted SQL string literal (embedded quotes doubled)."""
    return "'" + s.replace("'", "''") + "'"


def profile_columns(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so heterogeneous
    column types share one schema. Exact distinct counts (swap stage 1 for
    approx_count_distinct sketches at extreme cardinality; the plan shape
    is identical, exactness kept for oracle comparability).

    Generated expressions backtick-quote every column name and use
    POSITIONAL intermediate aliases (_min_0, …), so arbitrary column names
    — spaces, dashes, dots, quotes — profile exactly like plain ones."""
    dtypes = dict(df.dtypes)
    df = df.select(*[F.col(_bt(c)) for c in cols])
    val_args = ", ".join(f"{_slit(c)}, CAST({_bt(c)} AS STRING)" for c in cols)
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {val_args}) AS (column_name, _v)")
    )
    per_value = pairs.groupBy("column_name", "_v").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    nonnull = F.col("_v").isNotNull()
    aggs = [
        F.sum("_cnt").cast("long").alias("n_rows"),
        F.sum(F.when(nonnull, F.col("_cnt")).otherwise(0)).cast("long").alias("_nn"),
        F.count(F.when(nonnull, F.lit(1))).cast("long").alias("n_distinct"),
    ]
    for i, c in enumerate(cols):
        mine = F.col("_v").cast(dtypes[c])
        here = F.col("column_name") == c
        aggs.append(F.min(F.when(here, mine)).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(F.when(here, mine)).cast("string").alias(f"_max_{i}"))
    folded = per_value.groupBy("column_name").agg(*aggs)
    # contract: one output row PER REQUESTED COLUMN even on empty input
    # (the unpivot of zero rows would otherwise fold to zero groups and a
    # consumer keyed by column_name would silently see no columns)
    names = df.sparkSession.createDataFrame(
        [(c,) for c in cols], "column_name string"
    )
    folded = names.join(F.broadcast(folded), "column_name", "left").select(
        "column_name",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        F.coalesce("_nn", F.lit(0)).alias("_nn"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        *[F.col(f"_min_{i}") for i in range(len(cols))],
        *[F.col(f"_max_{i}") for i in range(len(cols))],
    )
    # each row matches exactly one _min_*/_max_* pair; the rest are NULL,
    # so coalesce picks the right one (and stays NULL for all-null columns)
    min_value = F.coalesce(
        *[
            F.when(F.col("column_name") == c, F.col(f"_min_{i}"))
            for i, c in enumerate(cols)
        ]
    )
    max_value = F.coalesce(
        *[
            F.when(F.col("column_name") == c, F.col(f"_max_{i}"))
            for i, c in enumerate(cols)
        ]
    )
    return folded.select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).cast("long").alias("n_null"),
        "n_distinct",
        min_value.alias("min_value"),
        max_value.alias("max_value"),
    )


def profile_columns_approx(
    df: DataFrame, *, cols: list[str], rsd: float = 0.02, exact_check: bool = False
) -> DataFrame:
    """100 TB twin of :func:`profile_columns`: ONE scan, ONE wide agg, and
    approx_count_distinct (HLL++ — mergeable KB-sized sketch state) in
    place of the per-value shuffle + exact distinct.

    Plan shape: scan → partial agg (map-side sketches) → single-row final
    agg → stack() that row to per-column rows. No Expand, no per-value
    shuffle; shuffle volume is one sketch + four scalars per column per
    partition, INDEPENDENT of input rows and of column cardinality — this
    is what runs on a 100 TB fact table, where profile_columns' per-value
    stage 1 would shuffle the full distinct-value set.

    ``exact_check=True`` additionally computes each column's exact distinct
    count and emits the sketch CONTRACT — estimate within ±10 % of exact
    (5× the default rsd, >5σ) — as a deterministic ``distinct_within_tol``
    boolean, same validation pattern as q47. That path pays the
    count_distinct Expand and exists for audit queries, not production
    (``exact_check=False`` emits the raw ``n_distinct_approx`` instead).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        # backtick-quoted names + positional aliases: arbitrary column
        # names (space, dash, dot, quote) bind correctly in the generated
        # stack() below, same contract as profile_columns (r12 review)
        col = F.col(_bt(c))
        aggs.append(F.count(col).cast("long").alias(f"_nn_{i}"))
        aggs.append(
            F.approx_count_distinct(col, rsd=rsd).cast("long").alias(f"_ad_{i}")
        )
        aggs.append(F.min(col).cast("string").alias(f"_min_{i}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{i}"))
        if exact_check:
            aggs.append(F.count_distinct(col).cast("long").alias(f"_ed_{i}"))
    one = df.agg(*aggs)
    if exact_check:
        tail = (
            lambda i: f"ABS(_ad_{i} - _ed_{i}) <= 0.10 * _ed_{i}"
        )
        tail_name = "distinct_within_tol"
    else:
        tail = lambda i: f"_ad_{i}"
        tail_name = "n_distinct_approx"
    stacked = ", ".join(
        f"{_slit(c)}, _n - _nn_{i}, _min_{i}, _max_{i}, {tail(i)}"
        for i, c in enumerate(cols)
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            f"(column_name, n_null, min_value, max_value, {tail_name})"
        ),
        F.col("_n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "min_value", "max_value", tail_name)
