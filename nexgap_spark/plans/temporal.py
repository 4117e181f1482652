"""Temporal join queries over the ``events`` table (operators in
nexgap_spark.operators.temporal_join) — as-of and range joins, the standard
event/feature-pipeline primitives Spark lacks as built-ins.

Determinism: the as-of right side is deduplicated to one row per (key, ts)
before the join, because "latest right row at equal timestamps" is otherwise
unordered on both engines. Time gaps are emitted as exact BIGINT microsecond
differences — no float discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.operators.temporal_join import asof_join, range_join
from nexgap_spark.operators.timeutil import epoch_us
from nexgap_spark.plans.registry import query
from nexgap_spark.session import load_table as t


# ---------------------------------------------------------------------------
# q41 — as-of join: for each purchase, the user's most recent view at-or-
# before it. One shuffle on user_id (union-and-window), no nested loop.
# ---------------------------------------------------------------------------


@query(
    "q41_asof_join",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           v.view_event_id,
           CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def q41_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(purchases, views, on="user_id", right_cols=["view_event_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.col("view_event_id_asof").alias("view_event_id"),
        (epoch_us("ts") - epoch_us("ts_asof")).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# q42 — range join: per purchase, how many views (and their total value) the
# same user produced in the preceding hour. Bucketized to two hash joins —
# Spark's native plan for this inequality predicate is a nested loop.
# ---------------------------------------------------------------------------


@query(
    "q42_range_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_prior_views,
           ROUND(COALESCE(SUM(v.value), 0.0), 2) AS prior_view_value
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
)
def q42_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    pairs = range_join(
        purchases, views, on="user_id", window_s=3600.0, suffix="_v"
    )
    counts = pairs.groupBy("event_id").agg(
        F.count("event_id_v").alias("n_prior_views"),
        F.sum("value_v").alias("sum_value"),
    )
    return purchases.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_prior_views", F.lit(0)).alias("n_prior_views"),
        F.round(F.coalesce("sum_value", F.lit(0.0)), 2).alias("prior_view_value"),
    )


# ---------------------------------------------------------------------------
# q64 — funnel conversion (click → purchase within the preceding hour),
# built on operators.temporal_join.range_join: the bucketized two-hash-join
# plan, never a nested loop. The distinct collapses multi-click matches
# before the tiny final aggregate; streaming twin:
# streaming/pipeline.stream_stream_conversions (same semantics, watermarked
# stream-stream join).
# ---------------------------------------------------------------------------


@query(
    "q64_funnel_conversions",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    conv AS (
      SELECT DISTINCT p.event_id
      FROM p JOIN c ON p.user_id = c.user_id
        AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
        AND epoch_us(c.ts) <  epoch_us(p.ts)
    )
    SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchases,
           CAST((SELECT COUNT(*) FROM conv) AS BIGINT) AS n_converted,
           ROUND((SELECT COUNT(*) FROM conv) * 1.0
                 / (SELECT COUNT(*) FROM p), 6) AS conversion_rate
    """,
)
def q64_funnel_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    conv = (
        range_join(purchases, clicks, on="user_id", window_s=3600.0, suffix="_c")
        .select("event_id")
        .distinct()
    )
    n_p = purchases.agg(F.count("*").alias("n_purchases"))
    n_c = conv.agg(F.count("*").alias("n_converted"))
    return n_p.crossJoin(n_c).select(
        "n_purchases",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_purchases"), 6).alias(
            "conversion_rate"
        ),
    )
