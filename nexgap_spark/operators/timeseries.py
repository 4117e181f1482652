"""Time-series operators: inter-arrival deltas, hopping windows, date-spine
gap fill, and fixed-range histograms.

The reference has no time-series engine (its only temporal ops are the
chronological sorts at ``converter/trace/langfuse_utils.py:102`` and the
tumbling-window shapes the events table invites); these are the scale
extensions a 100 TB event pipeline needs. Everything stays JVM-side
(``F.window``, ``lag``, ``sequence``/``explode``) — no Python in the hot
path, so whole-stage codegen covers every operator here.

Scale notes:
  * inter-arrival: one shuffle on the partition key; the lag window and the
    downstream aggregate reuse that partitioning.
  * hopping windows: Spark's ``F.window(slide < window)`` replicates each row
    window/slide times *after* filters/projections — project first.
  * gap fill: the spine is driver-small (months × keys); it broadcast-joins
    against the aggregated fact side, never against raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .timeutil import as_timestamp, epoch_us


def interarrival_deltas(
    df: DataFrame,
    *,
    partition_cols: list[str],
    ts_col: str = "ts",
    tiebreak_cols: list[str] | None = None,
    out_col: str = "delta_us",
) -> DataFrame:
    """Per-key event inter-arrival gap in microseconds (NULL for each key's
    first event). Deterministic under timestamp ties via ``tiebreak_cols``."""
    from pyspark.sql.window import Window

    df = as_timestamp(df, ts_col)  # NTZ-tolerant, loud on bigint
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    us = epoch_us(ts_col)
    return df.withColumn(out_col, us - F.lag(us).over(w))


def hopping_window_agg(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    aggs: list[Column],
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Sliding (hopping) window aggregate; emits ``window_start`` as epoch
    seconds. Windows align to multiples of ``slide`` from the epoch, matching
    SQL ``FLOOR(epoch/slide)*slide`` bucketing — each event lands in
    window/slide buckets."""
    keys = [F.window(ts_col, window, slide).alias("_w")] + [
        F.col(k) for k in (extra_keys or [])
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.select(
        F.unix_timestamp("_w.start").alias("window_start"),
        *[c for c in out.columns if c != "_w"],
    )


def month_spine(df: DataFrame, *, date_col: str) -> DataFrame:
    """One row per calendar month spanning [min, max] of ``date_col``.
    Built from a 1-row aggregate + ``sequence``/``explode`` — the spine is
    tiny (decades → hundreds of rows) so downstream joins broadcast it."""
    bounds = df.agg(
        F.date_trunc("month", F.min(date_col)).alias("lo"),
        F.date_trunc("month", F.max(date_col)).alias("hi"),
    )
    return bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month")
    )


def gap_fill_monthly(
    fact: DataFrame,
    dims: DataFrame,
    spine: DataFrame,
    *,
    month_col: str = "month",
    fill: dict[str, Column] | None = None,
) -> DataFrame:
    """Dense (month × dim) grid with missing fact cells filled. ``fact`` must
    already be aggregated to (month, dim) grain, so BOTH sides are small;
    broadcast the fact side — for a LEFT OUTER join only the right side can
    be the broadcast build side (a left-side hint is silently unusable)."""
    grid = spine.crossJoin(dims)
    joined = grid.join(F.broadcast(fact), on=[month_col, *dims.columns], how="left")
    for col, expr in (fill or {}).items():
        joined = joined.withColumn(col, F.coalesce(F.col(col), expr))
    return joined


def fixed_histogram(
    df: DataFrame,
    *,
    value_col: str,
    lo: float,
    hi: float,
    nbuckets: int,
) -> DataFrame:
    """Counts + sums per fixed-width bucket. ``width_bucket`` semantics:
    bucket 0 below ``lo``, ``nbuckets+1`` at/above ``hi`` — a single
    map-side-combinable groupBy, the cheapest possible full-scan profile."""
    b = F.width_bucket(F.col(value_col), F.lit(lo), F.lit(hi), F.lit(nbuckets))
    return df.groupBy(b.cast("long").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.sum(value_col), 2).alias("total"),
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the month of their first
    event; for each (cohort_month, month_offset) count how many of the
    cohort were active. (reference: analytics/retention rollup — recomputed
    here as two hash aggregations.)

    Plan: one groupBy(user) for first-event month (map-side combinable MIN),
    one groupBy(user, month) for activity, a user-key co-partitioned join
    (both sides already hashed on user), then the small matrix agg. No
    windows — the per-user MIN is cheaper than a window sort at corpus
    scale.
    """
    ev = df.select(
        F.col(user_col).alias("u"), F.date_trunc("month", F.col(ts_col)).alias("m")
    )
    first = ev.groupBy("u").agg(F.min("m").alias("cohort_m"))
    active = ev.distinct()
    joined = active.join(first, on="u")
    offset = (
        F.months_between(F.col("m"), F.col("cohort_m")).cast("int").alias("month_offset")
    )
    return (
        joined.select(
            F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"), offset, "u"
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count_distinct("u").cast("long").alias("n_active"))
    )


def rolling_distinct(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Trailing-N-day distinct keys (and event count) per calendar day —
    e.g. rolling 7-day active users.

    COUNT(DISTINCT) over a sliding range window is not supported by either
    engine's window machinery; the distributed formulation explodes each
    event into the ``window_days`` window-end days it contributes to
    (bounded fan-out), then runs ONE hash aggregate keyed by day. Shuffle
    volume = window_days × |events| (key, day) pairs — linear, no
    per-day self-joins.
    """
    day = F.date_trunc("day", F.col(ts_col))
    bounds = F.broadcast(
        df.agg(
            F.date_trunc("day", F.min(ts_col)).alias("_min_d"),
            F.date_trunc("day", F.max(ts_col)).alias("_max_d"),
        )
    )
    contrib = (
        df.select(F.col(key_col).alias("_k"), day.alias("_d"))
        .join(bounds)
        .select(
            "_k",
            F.explode(
                F.sequence(
                    F.col("_d"),
                    F.least(
                        F.date_add(F.col("_d"), window_days - 1).cast("timestamp"),
                        F.col("_max_d"),
                    ),
                    F.expr("interval 1 day"),
                )
            ).alias("_end_d"),
        )
    )
    return (
        contrib.groupBy(F.date_format("_end_d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count_distinct("_k").cast("long").alias("n_distinct"),
            F.count("*").cast("long").alias("n_events"),
        )
    )


def ordered_funnel(
    df: DataFrame,
    *,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel match (MATCH_RECOGNIZE-lite): rows of the
    FINAL step that complete the chain steps[0] < steps[1] < ... < final,
    optionally within ``within_seconds`` of the chain's first step.

    Greedy chained running-max windows, one shuffle (all windows share the
    per-key sort): m0 = latest step0 time strictly before the row;
    m_i = latest (m_{i-1} observed at a step_i row) strictly before the row.
    Propagating the MAXIMUM first-step time through the chain is optimal
    for the existence test, so this is exact, with none of the quadratic
    self-joins of the naive formulation.

    Returns the final-step rows plus ``chain_start`` (the matched first-step
    timestamp).
    """
    df = as_timestamp(df, ts_col)  # NTZ-tolerant, loud on bigint
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = F.max(F.when(F.col(type_col) == steps[0], F.col(ts_col))).over(w)
    for s in steps[1:-1]:
        m = F.max(F.when(F.col(type_col) == s, m)).over(w)
    out = df.withColumn("chain_start", m).filter(
        (F.col(type_col) == steps[-1]) & F.col("chain_start").isNotNull()
    )
    if within_seconds is not None:
        out = out.filter(
            epoch_us(ts_col) - epoch_us("chain_start")
            <= within_seconds * 1_000_000
        )
    return out
