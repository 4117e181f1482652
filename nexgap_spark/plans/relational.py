"""Relational core queries (SURVEY.md §2.2-§2.8, §2.10-§2.11 analogs).

Each query maps reference operators onto the driver's TPC-H-ish tables and is
written Spark-first: declarative DataFrame plans so Catalyst pushes filters
into the parquet scan, prunes columns, and picks broadcast joins for the dim
tables. Scale notes are on each query — these run identically on a
1000-executor cluster; nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nexgap_spark.plans.registry import query
from nexgap_spark.session import load_table as t

# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape; SURVEY A1-family aggregations).
# Scale: single shuffle on 2 low-cardinality keys; partial aggregation
# (map-side combine) does almost all the work, so it scales linearly.
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                                   AS avg_price,
           ROUND(AVG(l_discount), 6)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q02 — regional revenue (TPC-H Q5 shape; reference J2/J5-style enrichment
# joins). Scale: region/nation/supplier/customer are broadcast (dims ≪ fact);
# the only shuffle is lineitem⋈orders on orderkey. AQE handles skew.
# ---------------------------------------------------------------------------


@query(
    "q02_regional_revenue",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*)                                              AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q02_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        cust.join(
            F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
            cust.c_nationkey == nation.n_nationkey,
        ).select("c_custkey", "n_name")
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — top-10 orders by revenue for one segment (TPC-H Q3 shape; SURVEY
# O3/O5 top-N). Deterministic tiebreak on orderkey. Scale: top-k after a
# shuffle agg — Spark's TakeOrderedAndProject avoids a global sort.
# ---------------------------------------------------------------------------


@query(
    "q03_top_orders",
    oracle="""
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           STRFTIME(o.o_orderdate, '%Y-%m-%d')                   AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1996-06-30'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — EXISTS / left-semi (SURVEY U3 family): count orders per priority that
# have at least one lineitem shipped more than 60 days after the order date.
# Scale: semi-join shuffles only the keys; no row multiplication.
# ---------------------------------------------------------------------------


@query(
    "q04_priority_semi_join",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def q04_priority_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # EXISTS over a correlated inequality folds to an AGGREGATE before the
    # join: "some lineitem shipped > o_orderdate+60" ⇔ "MAX(l_shipdate) per
    # order > o_orderdate+60". Pre-aggregating lineitem to one row per
    # orderkey (map-side partial combine shrinks the shuffle ~4:1 to
    # distinct keys) and joining that to orders replaces the r7 shape —
    # which shuffled EVERY lineitem row through the join and then paid a
    # two-phase count_distinct — with key-sized shuffles and a plain count
    # (r13: 5.47 s → measured below at sf1.0; value-identical). At 100 TB
    # this is the difference between shuffling the fact table and shuffling
    # its key set.
    orders = t(spark, sf_dir, "orders")
    late = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_max_ship"))
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("_max_ship") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


# ---------------------------------------------------------------------------
# q05 — NOT EXISTS / left-anti (reference S4/S5 skip-if-processed semantics,
# SURVEY U3): customers with no orders, per market segment.
# ---------------------------------------------------------------------------


@query(
    "q05_customers_no_orders",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
)
def q05_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return (
        cust.join(orders, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# q06 — single-table filter + agg (TPC-H Q6 shape; SURVEY P-family filters).
# Scale: fully pushed-down scan, one partial+final agg; the plan to check
# with .explain is PushedFilters on all three predicates.
# ---------------------------------------------------------------------------


@query(
    "q06_revenue_filter",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 25
    """,
)
def q06_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.08))
            & (F.col("l_quantity") < 25)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — top-k per group (SURVEY W1/A1 pattern generalized): 3 priciest parts
# per brand. Window + row_number, deterministic tiebreak.
# ---------------------------------------------------------------------------


@query(
    "q07_topk_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rk
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rk
      FROM part
    )
    WHERE rk <= 3
    """,
)
def q07_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# q08 — last-event-per-user (the reference's A1 last-generation-per-group
# dedup, convert_spans_to_chatcompletion.py:1637-1687, re-expressed on the
# events table): keep each user's chronologically last event.
# Scale: one shuffle on user_id; no sort of the whole table.
# ---------------------------------------------------------------------------


@query(
    "q08_last_event_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def q08_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


# ---------------------------------------------------------------------------
# q09 — cumulative daily revenue (SURVEY W4 cumulative-distribution window).
# Scale: daily pre-agg shrinks data before the (single-partition) cumsum;
# at 100 TB the pre-agg output is only #days rows, so the unpartitioned
# window is safe.
# ---------------------------------------------------------------------------


@query(
    "q09_cumulative_revenue",
    oracle="""
    SELECT d, ROUND(SUM(day_rev) OVER (ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_rev
    FROM (
      SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS d,
             SUM(o_totalprice) AS day_rev
      FROM orders GROUP BY 1
    )
    """,
)
def q09_cumulative_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d")
    ).agg(F.sum("o_totalprice").alias("day_rev"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    return daily.select("d", F.round(F.sum("day_rev").over(w), 2).alias("cum_rev"))


# ---------------------------------------------------------------------------
# q10 — event funnel counts (reference A2/A4/A5 distribution counters).
# ---------------------------------------------------------------------------


@query(
    "q10_event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*)                                  AS n,
           ROUND(SUM(value), 2)                      AS total_value,
           ROUND(AVG(value), 6)                      AS avg_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)   AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q10_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# q11 — ROLLUP (beyond-reference grouping sets, SURVEY §2.4 "missing vs full
# engine"). NULL rollup keys coalesced to 'ALL' for stable hashing.
# ---------------------------------------------------------------------------


@query(
    "q11_rollup_sales",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice), 2) AS sales,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q11_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("sales"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sales",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# q12 — distinct aggregates (SURVEY §2.4 extension; exact on both sides —
# approx_count_distinct is exercised in bench/tests where cross-engine
# equality is not required).
# ---------------------------------------------------------------------------


@query(
    "q12_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q12_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Multi-column COUNT(DISTINCT) rewrites through Catalyst's Expand (row
    # set ×3 before the shuffle). Measured at sf1.0 (r13 A/B): the Expand
    # shape is FASTER here — 3.07 s vs 4.34 s for per-column two-stage aggs
    # joined back — because Expand reads the fact table ONCE while the
    # split shape scans it once per distinct column, and each expanded
    # replica still partial-dedups map-side. The q47/q75b "never Expand"
    # lesson is scoped to distinct MIXED WITH HLL sketches in one agg,
    # which disables partial aggregation entirely; pure multi-distinct
    # keeps it and scales with the key sets.
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# q13 — scalar string functions (SURVEY F1 regexp_extract, F2 sanitize,
# F14 md5, F16 truncate, F20 normalize): customer key extraction from c_name,
# name digest, sanitized segment.
# ---------------------------------------------------------------------------


@query(
    "q13_string_functions",
    oracle="""
    SELECT c_custkey,
           CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_key,
           md5(c_name)                                                  AS name_md5,
           substr(c_name, 1, 10)                                        AS name_prefix,
           lower(regexp_replace(c_mktsegment, '[^a-zA-Z0-9]+', '_', 'g')) AS segment_norm
    FROM customer
    """,
)
def q13_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("long").alias("name_key"),
        F.md5("c_name").alias("name_md5"),
        F.substring("c_name", 1, 10).alias("name_prefix"),
        F.lower(F.regexp_replace("c_mktsegment", "[^a-zA-Z0-9]+", "_")).alias(
            "segment_norm"
        ),
    )


# ---------------------------------------------------------------------------
# q14 — date bucketing (SURVEY F13 timestamp handling): orders per month.
# ---------------------------------------------------------------------------


@query(
    "q14_monthly_orders",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT)  AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           COUNT(*)                        AS n_orders,
           ROUND(AVG(o_totalprice), 6)     AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def q14_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
    )


# ---------------------------------------------------------------------------
# q15 — set operations (SURVEY U1/U2): nations with customers vs nations
# with suppliers — intersect and except, tagged and unioned.
# ---------------------------------------------------------------------------


@query(
    "q15_nation_set_ops",
    oracle="""
    SELECT 'both' AS tag, n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only' AS tag, n_nationkey FROM (
      SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey FROM supplier
    )
    """,
)
def q15_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust_n = (
        t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    )
    supp_n = (
        t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    )
    both = cust_n.intersect(supp_n).select(F.lit("both").alias("tag"), "n_nationkey")
    only = cust_n.exceptAll(supp_n).select(
        F.lit("customer_only").alias("tag"), "n_nationkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# q16 — sessionization (SURVEY T-family streaming analog, batch form):
# a session break is a >30-minute gap; count sessions and mean session span
# per user. Scale: one shuffle on user_id; lag + running sum windows.
# ---------------------------------------------------------------------------


@query(
    "q16_sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
             ts
      FROM flagged
    )
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
)
def q16_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.sessionize import sessionize

    ev = t(spark, sf_dir, "events")
    sess = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30, order_tiebreak="event_id")
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q17 — tumbling time-window aggregation (SURVEY T2/T3 batch analog): 15-min
# buckets × event_type. Bucket = floor(epoch/900)*900 so the oracle is exact.
# ---------------------------------------------------------------------------


@query(
    "q17_tumbling_window_agg",
    oracle="""
    SELECT CAST(FLOOR(epoch(ts) / 900) * 900 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q17_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 900) * 900).cast("long")
    return ev.groupBy(
        bucket.alias("bucket_start"), F.col("event_type")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


# ---------------------------------------------------------------------------
# q18 — JSON extraction (SURVEY F11/F12 from_json family): pull int k out of
# the props JSON string.
# ---------------------------------------------------------------------------


@query(
    "q18_json_extraction",
    oracle="""
    SELECT event_type,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q18_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.max(k).alias("max_k")
    )


# ---------------------------------------------------------------------------
# q19 — inverse-frequency sampling weights (the reference's R2 weighted path
# sample, sampling_manager.py:192-228: weight = 1/(count+1)^1.5 normalized to
# probabilities), computed over event_type histogram as the "paths" table.
# ---------------------------------------------------------------------------


@query(
    "q19_sampling_weights",
    oracle="""
    WITH counts AS (
      SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    ),
    weighted AS (
      SELECT event_type, cnt, 1.0 / POW(cnt + 1, 1.5) AS w FROM counts
    )
    SELECT event_type, cnt,
           ROUND(w / SUM(w) OVER (), 9) AS prob
    FROM weighted
    """,
)
def q19_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.sampling import inverse_frequency_weights

    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return inverse_frequency_weights(counts, cnt_col="cnt", out_col="prob", round_to=9)


# ---------------------------------------------------------------------------
# q20 — inverse-CDF pick (the reference's W4 cumulative-distribution sampling,
# sampling_manager.py:222-228) made deterministic: pick the first path whose
# cumulative probability reaches 0.5 (the "median-weighted" element).
# ---------------------------------------------------------------------------


@query(
    "q20_inverse_cdf_pick",
    oracle="""
    WITH counts AS (
      SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
    ),
    weighted AS (
      SELECT event_type, cnt, 1.0 / POW(cnt + 1, 1.5) AS w FROM counts
    ),
    cdf AS (
      SELECT event_type,
             SUM(w) OVER (ORDER BY event_type
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / SUM(w) OVER () AS cum
      FROM weighted
    )
    SELECT event_type, ROUND(cum, 9) AS cum FROM cdf
    WHERE cum >= 0.5
    ORDER BY cum, event_type
    LIMIT 1
    """,
)
def q20_inverse_cdf_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the running sum goes through keyed_running_sum (one-row aggregate
    # fold, bit-identical addition order to the SQL window) instead of a
    # global-order window — the empty-partition window logs Spark's
    # single-partition WindowExec warning on every run (VERDICT r15 item 7)
    from nexgap_spark.operators.sampling import keyed_running_sum

    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    weighted = counts.withColumn("w", F.lit(1.0) / F.pow(F.col("cnt") + 1, 1.5))
    total = weighted.agg(F.sum("w").alias("_w_total"))
    cdf = (
        keyed_running_sum(
            weighted.select("event_type", "w"),
            key_col="event_type",
            val_col="w",
            out_col="_cum_w",
        )
        .crossJoin(F.broadcast(total))
        .select("event_type", (F.col("_cum_w") / F.col("_w_total")).alias("cum"))
    )
    return (
        cdf.filter(F.col("cum") >= 0.5)
        .select("event_type", F.round("cum", 9).alias("cum"))
        .orderBy("cum", "event_type")
        .limit(1)
    )


# ---------------------------------------------------------------------------
# q46 — CUBE aggregation (SURVEY §2.4 extension alongside q11's ROLLUP):
# all 2^k grouping combinations in ONE pass — Spark expands the grouping
# sets before the shuffle, so the exchange carries each row once per set
# with map-side partial aggregation, not 2^k separate scans.
# ---------------------------------------------------------------------------


@query(
    "q46_cube_sales",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           ROUND(SUM(o_totalprice), 2) AS sales,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q46_cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sales"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "sales",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# q47 — approximate distinct counts (HyperLogLog++ sketch). At 100 TB the
# sketch is the difference between a shuffle of every distinct key and a
# few KB of mergeable state per partition.
#
# Oracle note: raw HLL estimates are engine-specific by construction, so a
# value oracle on the estimates themselves cannot exist; instead the query
# emits the sketch's CONTRACT — estimate within ±10 % of the exact count
# (5× the configured rsd=0.02, i.e. >5σ) — as deterministic booleans that
# both engines' HLL implementations satisfy, alongside the exact group
# counts. A broken sketch flips the booleans and fails the hash. The
# tighter 5 % bound on the raw estimates is pinned in
# tests/test_oracle_queries.py::test_q47_approx_distinct_within_rsd.
#
# Scale note (r13): the exact sides run as their own two-stage
# aggregations joined back on the group key — the earlier in-agg
# count_distinct formulation rewrote through an Expand (3× row multiplier)
# that measured 4 s at sf0.1 / 38 s at sf1.0 vs ~1 s / ~4.4 s for this
# split shape. The production sketch path is approx_count_distinct alone:
# mergeable KB-sized state, no exact twin — that is what runs at 100 TB.
# ---------------------------------------------------------------------------


@query(
    "q47_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(*)::BIGINT AS n_rows,
           ABS(APPROX_COUNT_DISTINCT(l_partkey) - COUNT(DISTINCT l_partkey))
             <= 0.10 * COUNT(DISTINCT l_partkey) AS parts_within_tol,
           ABS(APPROX_COUNT_DISTINCT(l_suppkey) - COUNT(DISTINCT l_suppkey))
             <= 0.10 * COUNT(DISTINCT l_suppkey) AS supps_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q47_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The exact sides run as their own two-stage aggregations joined back
    # on the (3-row) group key, NOT as count_distinct next to the HLL
    # sketches: mixed distinct+sketch aggregates rewrite through an Expand
    # (every row replicated per distinct column) that measured 4.0 s at
    # sf0.1 / 86 s at sf1.0, vs ~1 s for this split shape. Each exact agg
    # scans only its two columns (column pruning reaches the scan), and
    # the map-side combine bounds its shuffle by per-partition key
    # cardinality — the same argument as profile_columns' stage 1.
    li = t(spark, sf_dir, "lineitem")
    ap = F.approx_count_distinct("l_partkey", rsd=0.02)
    asu = F.approx_count_distinct("l_suppkey", rsd=0.02)
    base = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"), ap.alias("_ap"), asu.alias("_as")
    )

    def exact(col: str, alias: str, key: str) -> DataFrame:
        # COUNT(DISTINCT col) semantics: NULL values are not distinct
        # values (hence the isNotNull filter), but a NULL GROUP KEY still
        # forms a group — callers join back with eqNullSafe (r13 review)
        return (
            li.where(F.col(col).isNotNull())
            .groupBy(F.col("l_returnflag").alias(key), col)
            .agg(F.lit(1).alias("_one"))
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias(alias))
        )

    ep = exact("l_partkey", "_ep", "_rf1")
    es = exact("l_suppkey", "_es", "_rf2")
    joined = base.join(
        F.broadcast(ep), F.col("l_returnflag").eqNullSafe(F.col("_rf1")), "left"
    ).join(F.broadcast(es), F.col("l_returnflag").eqNullSafe(F.col("_rf2")), "left")
    # a group whose values are ALL null has no exact row: 0 distinct, and
    # the sketch also reports 0 -> contract holds as 0 <= 0
    ep0 = F.coalesce(F.col("_ep"), F.lit(0))
    es0 = F.coalesce(F.col("_es"), F.lit(0))
    return joined.select(
        "l_returnflag",
        "n_rows",
        (F.abs(F.col("_ap") - ep0) <= 0.10 * ep0).alias("parts_within_tol"),
        (F.abs(F.col("_as") - es0) <= 0.10 * es0).alias("supps_within_tol"),
    )
