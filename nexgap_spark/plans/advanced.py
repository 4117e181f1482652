"""Advanced pipeline queries: rolling-window distinct counts, ordered
funnel pattern matching, domain rebalancing, a k-means Lloyd iteration,
and CDC upsert apply.

Operators in nexgap_spark.operators.{timeseries,sampling,similarity,cdc};
oracles reproduce the exact arithmetic (same greedy window chains, same
md5 ranks, same decimal summation) in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.operators import cdc, sampling, timeseries
from nexgap_spark.operators import similarity as sim
from nexgap_spark.plans.registry import query
from nexgap_spark.plans.similarity import _cos
from nexgap_spark.session import load_table as t

# ---------------------------------------------------------------------------
# q77 — rolling 7-day distinct users (trailing-window active-user curve).
# COUNT(DISTINCT) over a sliding range window exists in neither engine's
# window machinery; both sides use the bounded explode-to-window-end
# formulation (one hash aggregate, shuffle = 7×|events|).
# ---------------------------------------------------------------------------


@query(
    "q77_rolling_active_users",
    oracle="""
    WITH ev AS (SELECT user_id AS k, date_trunc('day', ts) AS d FROM events),
    b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd FROM ev),
    days AS (
      SELECT UNNEST(generate_series((SELECT mind FROM b),
                                    (SELECT maxd FROM b),
                                    INTERVAL 1 DAY)) AS end_d
    )
    SELECT strftime(end_d, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT e.k) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM days JOIN ev e ON e.d BETWEEN end_d - INTERVAL 6 DAY AND end_d
    GROUP BY end_d
    """,
)
def q77_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return timeseries.rolling_distinct(ev, window_days=7)


# ---------------------------------------------------------------------------
# q78 — strictly-ordered funnel (view < click < purchase, purchase within
# 1h of the matched view) via chained greedy running-max windows — the
# MATCH_RECOGNIZE workload without quadratic self-joins.
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW = (
    "OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
)


@query(
    "q78_ordered_funnel",
    oracle=f"""
    WITH m0 AS (
      SELECT *, MAX(CASE WHEN event_type = 'view' THEN ts END) {_FUNNEL_WINDOW} AS lv
      FROM events
    ),
    m1 AS (
      SELECT *, MAX(CASE WHEN event_type = 'click' THEN lv END) {_FUNNEL_WINDOW} AS chain_start
      FROM m0
    ),
    p AS (
      SELECT date_trunc('day', ts) AS d,
             CASE WHEN chain_start IS NOT NULL
                   AND epoch_us(ts) - epoch_us(chain_start) <= 3600000000
                  THEN 1 ELSE 0 END AS conv
      FROM m1 WHERE event_type = 'purchase'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(conv) AS BIGINT) AS n_converted
    FROM p GROUP BY d
    """,
)
def q78_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    conv = timeseries.ordered_funnel(
        ev, steps=["view", "click", "purchase"], within_seconds=3600
    )
    day = lambda c: F.date_format(F.date_trunc("day", c), "yyyy-MM-dd")  # noqa: E731
    conv_by_day = conv.groupBy(day(F.col("ts")).alias("day")).agg(
        F.count("*").cast("long").alias("n_converted")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day(F.col("ts")).alias("day"))
        .agg(F.count("*").cast("long").alias("n_purchases"))
    )
    return purchases.join(conv_by_day, on="day", how="left").select(
        "day",
        "n_purchases",
        F.coalesce("n_converted", F.lit(0).cast("long")).alias("n_converted"),
    )


# ---------------------------------------------------------------------------
# q79 — domain-mixture rebalance: deterministically downsample every source
# to the smallest source's size (content-hash rank, no RNG).
# ---------------------------------------------------------------------------


@query(
    "q79_rebalance_domains",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ),
    floor_n AS (
      SELECT MIN(cnt) AS tgt
      FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY source)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM ranked, floor_n WHERE rk <= tgt
    GROUP BY source
    """,
)
def q79_rebalance_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    kept = sampling.rebalance_groups(docs, group_col="source", key_col="doc_id")
    return kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


# ---------------------------------------------------------------------------
# q80 — one k-means Lloyd iteration over the embedding corpus (centroids =
# vec_id < 8, routing by cosine as in q35): per-centroid per-dimension
# member sums. Decimal summation keeps the result exactly order-independent.
# ---------------------------------------------------------------------------


@query(
    "q80_kmeans_step",
    oracle=f"""
    WITH centroids AS (
      SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
      SELECT vec_id, embedding, c_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY {_cos('embedding', 'c_vec')} DESC, c_id) AS rn
      FROM embeddings CROSS JOIN centroids
    ),
    clusters AS (SELECT vec_id, embedding, c_id FROM assigned WHERE rn = 1),
    ex AS (
      SELECT c_id, i - 1 AS pos,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE), 9) AS DECIMAL(18,9)) AS d
      FROM clusters CROSS JOIN range(1, 65) r(i)
    )
    SELECT c_id AS centroid_id,
           CAST(pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(d) AS DOUBLE), 6) AS dim_sum
    FROM ex GROUP BY c_id, pos
    """,
)
def q80_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return sim.kmeans_update(emb, centroids)


# ---------------------------------------------------------------------------
# q81 — CDC upsert apply (MERGE INTO semantics): a derived change set
# (10% price updates + sparse deletes) merged into orders, latest version
# wins; digest of the resulting snapshot.
# ---------------------------------------------------------------------------

_ORDER_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
)


@query(
    "q81_cdc_apply",
    oracle=f"""
    WITH changes AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice,
             o_orderdate, o_orderpriority, 1 AS version, 'U' AS op
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT {_ORDER_COLS}, 2 AS version, 'D' AS op
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    base AS (SELECT {_ORDER_COLS}, 0 AS version, 'U' AS op FROM orders),
    merged AS (SELECT * FROM base UNION ALL SELECT * FROM changes),
    won AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                ORDER BY version DESC, op DESC) AS rk
      FROM merged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_price,
           CAST(SUM(CASE WHEN version = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
    FROM won WHERE rk = 1 AND op <> 'D'
    """,
)
def q81_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + 10.0)
        .withColumn("version", F.lit(1).cast("long"))
        .withColumn("op", F.lit("U"))
    )
    deletes = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("version", F.lit(2).cast("long"))
        .withColumn("op", F.lit("D"))
    )
    changes = updates.unionByName(deletes)
    snapshot = cdc.apply_changes(
        orders, changes, key_cols=["o_orderkey"], version_col="version", op_col="op"
    )
    return snapshot.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double"), 2).alias("sum_price"),
        F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_updated"),
    )


# ---------------------------------------------------------------------------
# q82 — run summary (A8, run_end_to_end.py:1047-1052): success/failed counts
# and rate over a status column; events.event_type plays the status role
# ('purchase' = success). One hash aggregate, no window. The operator's
# per-status map column is dropped here because map values don't have a
# stable cross-engine hash; the scalar columns are the contract.
# ---------------------------------------------------------------------------


@query(
    "q82_run_summary",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
           CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS success_rate
    FROM events
    """,
)
def q82_run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.runstats import run_summary

    ev = t(spark, sf_dir, "events")
    return run_summary(
        ev, status_col="event_type", success_value="purchase"
    ).select("n_total", "n_success", "n_failed", "success_rate")


# ---------------------------------------------------------------------------
# q83 — empty-query guard (P8, run_end_to_end.py:826-830) exercised as a
# partitioned count: how many work items survive the guard vs are rejected
# per document language bucket (doc_id % 5 keeps the oracle deterministic).
# Blank-ish texts are synthesized for a sliver of docs so both branches are
# non-trivially exercised.
# ---------------------------------------------------------------------------


@query(
    "q83_query_guard",
    oracle="""
    WITH work AS (
      SELECT doc_id,
             CASE WHEN doc_id % 37 = 0 THEN '   ' ELSE text END AS query
      FROM documents
    )
    SELECT CAST(doc_id % 5 AS BIGINT) AS bucket,
           CAST(SUM(CASE WHEN LENGTH(TRIM(COALESCE(query,''))) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN LENGTH(TRIM(COALESCE(query,''))) > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_rejected
    FROM work
    GROUP BY doc_id % 5
    ORDER BY bucket
    """,
)
def q83_query_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.runstats import filter_nonempty_query

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 37 == 0, F.lit("   ")).otherwise(F.col("text")).alias("query"),
    )
    kept, rejected = filter_nonempty_query(docs)
    k = kept.groupBy((F.col("doc_id") % 5).cast("long").alias("bucket")).agg(
        F.count("*").alias("n_kept")
    )
    r = rejected.groupBy((F.col("doc_id") % 5).cast("long").alias("bucket")).agg(
        F.count("*").alias("n_rejected")
    )
    return (
        k.join(r, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_rejected", F.lit(0)).cast("long").alias("n_rejected"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q84 — URL parsing (F22, file_system_agent.py:235-251) over synthesized
# URLs: scheme extraction, whitelist, and filename inference must agree with
# the oracle's string ops. data: URLs get the media-type extension path.
# ---------------------------------------------------------------------------


@query(
    "q84_url_parse",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             CASE doc_id % 3
               WHEN 0 THEN 'https://corpus.example/docs/doc_' || doc_id || '.txt'
               WHEN 1 THEN 'data:text/csv;base64,QQ=='
               ELSE 'ftp://blocked.example/f_' || doc_id
             END AS url
      FROM documents
    )
    SELECT CASE doc_id % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'data' ELSE 'ftp' END AS scheme,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN doc_id % 3 IN (0, 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
           MIN(CASE doc_id % 3
                 WHEN 0 THEN 'doc_' || doc_id || '.txt'
                 WHEN 1 THEN 'data_' || md5('data:text/csv;base64,QQ==') || '.csv'
                 ELSE 'f_' || doc_id
               END) AS sample_filename
    FROM urls
    GROUP BY 1
    ORDER BY scheme
    """,
)
def q84_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.sources.files import url_allowed, url_filename, url_scheme

    docs = t(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("https://corpus.example/docs/doc_"), F.col("doc_id"), F.lit(".txt")),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("data:text/csv;base64,QQ=="))
        .otherwise(F.concat(F.lit("ftp://blocked.example/f_"), F.col("doc_id")))
        .alias("url"),
    )
    return (
        urls.select(
            url_scheme("url").alias("scheme"),
            url_allowed("url").cast("int").alias("_ok"),
            url_filename("url").alias("_fname"),
        )
        .groupBy("scheme")
        .agg(
            F.count("*").alias("n"),
            F.sum("_ok").cast("long").alias("n_allowed"),
            F.min("_fname").alias("sample_filename"),
        )
        .orderBy("scheme")
    )


# ---------------------------------------------------------------------------
# q114 — Z-order (Morton) clustering curve: the layout-optimization primitive
# for multi-column data skipping (operators/zorder.py; the write path is
# zorder_write, exercised in tests + SCALE.md). The query pins the whole
# curve computation — linear bucketing of (user_id, ts) to 8 bits each and
# the bit interleave — by aggregating per curve CELL (top 6 of 16 z bits):
# a scan pruned by z-range touches exactly the cells the predicate's
# hyper-rectangle intersects, so cell extents ARE the skipping contract.
# Both engines compute ranges, buckets, and interleave in plain arithmetic.
# ---------------------------------------------------------------------------


def _zorder_oracle() -> str:
    # interleave 8 bits of ub (bit j -> 2j) and tb (bit j -> 2j+1)
    terms = " + ".join(
        f"(((ub >> {i}) & 1) << {2 * i}) + (((tb >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    bucket = (
        "CAST(LEAST(GREATEST(FLOOR(({x} - {mn}) / ({mx} - {mn}) * 256.0), 0), 255) AS BIGINT)"
    )
    ub = bucket.format(x="CAST(user_id AS DOUBLE)", mn="r.mnu", mx="r.mxu")
    tb = bucket.format(x="epoch(ts)", mn="r.mnt", mx="r.mxt")
    return f"""
    WITH r AS (
      SELECT CAST(MIN(user_id) AS DOUBLE) AS mnu, CAST(MAX(user_id) AS DOUBLE) AS mxu,
             MIN(epoch(ts)) AS mnt, MAX(epoch(ts)) AS mxt
      FROM events
    ),
    b AS (
      SELECT user_id, {ub} AS ub, {tb} AS tb FROM events, r
    ),
    z AS (SELECT user_id, ub, tb, {terms} AS zv FROM b)
    SELECT zv >> 10 AS cell,
           CAST(COUNT(*) AS BIGINT)  AS n_events,
           CAST(MIN(zv) AS BIGINT)   AS min_z,
           CAST(MAX(zv) AS BIGINT)   AS max_z,
           CAST(MIN(ub) AS BIGINT)   AS min_ub,
           CAST(MAX(ub) AS BIGINT)   AS max_ub,
           CAST(MIN(tb) AS BIGINT)   AS min_tb,
           CAST(MAX(tb) AS BIGINT)   AS max_tb,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM z GROUP BY 1
    """


@query("q114_zorder_curve", oracle=_zorder_oracle())
def q114_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators import zorder

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("double").alias("_ts")
    )
    # the operator's own range helper, so the query pins exactly the
    # convention zorder_frame/zorder_write use (r13 review)
    ranges = zorder.column_ranges(ev, ["user_id", "_ts"])
    ub = zorder.linear_bucket(
        F.col("user_id").cast("double"),
        F.lit(ranges["user_id"][0]),
        F.lit(ranges["user_id"][1]),
        8,
    )
    tb = zorder.linear_bucket(
        F.col("_ts"), F.lit(ranges["_ts"][0]), F.lit(ranges["_ts"][1]), 8
    )
    z = zorder.zvalue([ub, tb], 8)
    return (
        ev.select("user_id", ub.alias("ub"), tb.alias("tb"), z.alias("zv"))
        .groupBy(F.shiftright("zv", 10).alias("cell"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("zv").alias("min_z"),
            F.max("zv").alias("max_z"),
            F.min("ub").alias("min_ub"),
            F.max("ub").alias("max_ub"),
            F.min("tb").alias("min_tb"),
            F.max("tb").alias("max_tb"),
            F.min("user_id").alias("min_user"),
        )
    )
