"""Dataset profiling: per-column quality stats, exact and sketched.

Exact shape (r13): TWO kinds of branches over the pruned projection —

  1. one narrow whole-relation aggregate for n_rows and per-column
     n_null / min / max (native types, full codegen, no row expansion);
  2. one NATIVE-typed distinct per column — scan column c, partial-dedup
     map-side, shuffle only c's distinct value set, count — unioned into
     (column_name, n_distinct) rows and combined with branch 1's single
     broadcast row.

Per-column branches are NOT k full scans on a columnar source: parquet
column pruning means branch c reads only column c's bytes, so total I/O
across all branches ≈ one scan of the profiled columns, and each branch
shuffles its values in native width. Measured on orders, 5 cols: 1.7 s at
sf1.0 vs 5.8 s for the previous single-pass stack() unpivot — the stack
paid CAST(value AS STRING) on every row × every column plus a string-typed
per-value shuffle carrying counts it didn't need. Earlier shapes and their
measurements (sf0.1): wide agg with k count_distinct → Catalyst Expand,
(k+1)× row replication, 2.0 s; persisted pruned projection → cache build
costs more than it saves (3.9 s cold) and pins executor memory. On a
row-oriented source (CSV/JSON) the single-pass stack amortizes the one
unavoidable full scan — that trade flips, and the stack shape survives in
profile_columns_approx's sketch pass, which IS one scan.

Type contract: min/max are rendered as strings (heterogeneous columns
share one schema) from native-typed aggregates, so numeric ordering is
always correct; distinct counts are computed on native values.
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
    """Single-quoted SQL string literal: embedded quotes doubled AND
    backslashes doubled — Spark SQL literals process backslash escapes by
    default (spark.sql.parser.escapedStringLiterals is unset), so an
    unescaped backslash in a column name would corrupt the emitted
    column_name (r13 review)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _distinct_branches(df: DataFrame, cols: list[str], alias: str) -> DataFrame:
    """One NATIVE-typed distinct per column — scan column c (disjoint bytes
    under parquet pruning), partial-dedup map-side, shuffle only c's
    distinct value set, count non-null — unioned to (column_name, alias)
    rows. Whole-relation aggs: exactly one row per column even on empty
    input. Shared by the exact profile and the approx audit's exact side
    so NULL/type handling cannot drift between them."""
    branches = [
        df.select(F.col(_bt(c)).alias("_v"))
        .distinct()
        .agg(F.count(F.when(F.col("_v").isNotNull(), 1)).cast("long").alias(alias))
        .select(F.lit(c).alias("column_name"), alias)
        for c in cols
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def profile_columns(df: DataFrame, *, cols: list[str]) -> DataFrame:
    """Per-column profile: (column_name, n_rows, n_null, n_distinct,
    min_value, max_value) with min/max rendered as strings so heterogeneous
    column types share one schema. Exact distinct counts on NATIVE values
    (plan shape in the module docstring; the sketch twin is
    :func:`profile_columns_approx`).

    Column references go through backtick quoting (F.col parses dots as
    nested-field paths), so arbitrary column names — spaces, dashes, dots,
    quotes — profile exactly like plain ones.

    Contract: one output row PER REQUESTED COLUMN even on empty input —
    every branch is a whole-relation aggregate, which yields exactly one
    row (zero counts, NULL min/max) on zero input rows."""
    df = df.select(*[F.col(_bt(c)) for c in cols])
    scalars = [F.count(F.lit(1)).cast("long").alias("_n")]
    for i, c in enumerate(cols):
        col = F.col(_bt(c))
        scalars.append(F.count(col).cast("long").alias(f"_nn_{i}"))
        scalars.append(F.min(col).cast("string").alias(f"_min_{i}"))
        scalars.append(F.max(col).cast("string").alias(f"_max_{i}"))
    one = df.agg(*scalars)
    nd = _distinct_branches(df, cols, "_nd")
    out = nd.crossJoin(F.broadcast(one))
    # each output row picks its own column's scalar slots; coalesce over
    # the positional WHENs keeps NULL min/max for all-null columns
    pick = lambda fmt: F.coalesce(  # noqa: E731
        *[F.when(F.col("column_name") == c, F.col(fmt % i)) for i, c in enumerate(cols)]
    )
    return out.select(
        "column_name",
        F.col("_n").alias("n_rows"),
        (F.col("_n") - pick("_nn_%d")).cast("long").alias("n_null"),
        F.col("_nd").alias("n_distinct"),
        pick("_min_%d").alias("min_value"),
        pick("_max_%d").alias("max_value"),
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
    boolean, same validation pattern as q47. The exact side runs as its
    OWN per-column native-typed distinct branches (profile_columns' shape)
    broadcast-joined back on column_name — NOT as count_distinct inside
    the sketch agg: mixing k count_distinct columns with the HLL
    aggregates makes Catalyst rewrite through an Expand whose cost was
    measured near scale-INVARIANT and pathological (138 s at sf0.1, 133 s
    at sf1.0, vs 1.8 s for the exact profile + 0.8 s for the sketch pass
    at sf0.1 — the audit shape is now the sum of those two, ~40×
    cheaper). ``exact_check=False`` emits the raw ``n_distinct_approx``
    and stays the one-scan production path.
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
    one = df.agg(*aggs)
    tail_name = "distinct_within_tol" if exact_check else "n_distinct_approx"
    stacked = ", ".join(
        f"{_slit(c)}, _n - _nn_{i}, _min_{i}, _max_{i}, _ad_{i}"
        for i, c in enumerate(cols)
    )
    out = one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_null, min_value, max_value, _ad)"
        ),
        F.col("_n").alias("n_rows"),
    )
    if exact_check:
        # exact side: the shared per-column native distinct branches,
        # broadcast-joined back — NOT count_distinct inside the sketch agg
        # (the Expand disease above)
        exact = _distinct_branches(df, cols, "_ed")
        # whole-relation agg branches always emit one row per column, so
        # all-null columns carry an explicit _ed = 0 (COUNT(DISTINCT) = 0
        # on both engines) and the contract reads |ad - 0| <= 0 -> ad = 0
        out = out.join(F.broadcast(exact), "column_name", "left").withColumn(
            tail_name, F.abs(F.col("_ad") - F.col("_ed")) <= 0.10 * F.col("_ed")
        )
    else:
        out = out.withColumn(tail_name, F.col("_ad"))
    return out.select(
        "column_name", "n_rows", "n_null", "min_value", "max_value", tail_name
    )
