"""Unit tests for the time-series + deterministic-sampling operators
(q48-q58 family) on small in-memory frames — properties the oracle
hash-compare can't express: replication counts, per-stratum exactness,
cross-partitioning stability."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nexgap_spark.operators import sampling, timeseries


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_interarrival_deltas_per_key(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(2), "b"), (1, _ts(5), "c"), (2, _ts(1), "d")],
        "user_id int, ts timestamp, event_id string",
    )
    out = timeseries.interarrival_deltas(
        df, partition_cols=["user_id"], tiebreak_cols=["event_id"]
    )
    rows = {r.event_id: r.delta_us for r in out.collect()}
    assert rows["a"] is None and rows["d"] is None  # first event per key
    assert rows["b"] == 120_000_000 and rows["c"] == 180_000_000


def test_hopping_windows_replicate_each_event_twice(spark):
    # window=10min slide=5min → every event lands in exactly 2 windows
    df = spark.createDataFrame(
        [(_ts(0, 30),), (_ts(7, 1),), (_ts(14, 59),)], "ts timestamp"
    )
    out = timeseries.hopping_window_agg(
        df, window="10 minutes", slide="5 minutes", aggs=[F.count("*").alias("n")]
    )
    rows = out.collect()
    assert sum(r.n for r in rows) == 2 * 3
    # window starts align to 5-minute boundaries
    assert all(r.window_start % 300 == 0 for r in rows)


def test_month_spine_dense(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2023, 11, 20),), (dt.datetime(2024, 2, 3),)], "d timestamp"
    )
    months = [
        r.month.strftime("%Y-%m")
        for r in timeseries.month_spine(df, date_col="d").collect()
    ]
    assert months == ["2023-11", "2023-12", "2024-01", "2024-02"]


def test_gap_fill_produces_dense_grid(spark):
    orders = spark.createDataFrame(
        [(dt.datetime(2024, 1, 5), "HI", 10.0), (dt.datetime(2024, 3, 5), "LO", 5.0)],
        "d timestamp, prio string, v double",
    )
    spine = timeseries.month_spine(orders, date_col="d")
    dims = orders.select("prio").distinct()
    fact = orders.groupBy(
        F.date_trunc("month", "d").alias("month"), "prio"
    ).agg(F.sum("v").alias("v"))
    filled = timeseries.gap_fill_monthly(
        fact, dims, spine, fill={"v": F.lit(0.0)}
    )
    assert filled.count() == 3 * 2  # 3 months × 2 priorities, gaps zero-filled
    assert filled.filter(F.col("v") == 0.0).count() == 4


def test_fixed_histogram_bucket_edges(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (49.9,), (50.0,), (499.9,), (500.0,)], "value double"
    )
    out = {r.bucket: r.n for r in
           timeseries.fixed_histogram(df, value_col="value", lo=0.0, hi=500.0, nbuckets=10).collect()}
    assert out[0] == 1      # below range
    assert out[1] == 2      # [0, 50)
    assert out[2] == 1      # [50, 100)
    assert out[10] == 1     # [450, 500)
    assert out[11] == 1     # at/above hi


def test_deterministic_sample_is_partitioning_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sampling.deterministic_sample(df, key_col="k")
    b = sampling.deterministic_sample(df.repartition(13), key_col="k")
    ka = sorted(r.k for r in a.collect())
    kb = sorted(r.k for r in b.collect())
    assert ka == kb  # pure function of the key, not of layout or RNG
    assert 0.05 < len(ka) / 2000 < 0.15  # ~10%


def test_stratified_sample_exact_per_stratum(spark):
    import math

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)], "k int, s string"
    )
    out = sampling.stratified_sample(
        df, strata_cols=["s"], key_col="k", fraction=0.05
    )
    got = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    # exact ceil(n * fraction) per stratum — even the small one is covered
    assert got == {"big": math.ceil(900 * 0.05), "small": math.ceil(100 * 0.05)}


def test_q63_approx_quantiles_near_exact(spark):
    # sketch answers must land within 1% of the exact q49 quantiles
    from nexgap_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    exact = {r.o_orderpriority: r for r in QUERIES["q49_price_quantiles"](spark, SF_DIR).collect()}
    approx = {r.o_orderpriority: r for r in QUERIES["q63_approx_quantiles"](spark, SF_DIR).collect()}
    assert exact.keys() == approx.keys()
    for k in exact:
        for c in ("p25", "p50", "p75", "p90"):
            e, a = getattr(exact[k], c), getattr(approx[k], c)
            assert abs(a - e) <= 0.01 * e, (k, c, e, a)


def test_new_operators_handle_empty_input(spark):
    # every round-2 operator must plan and run on an empty frame — the
    # all-rows-filtered partition is a normal state at 100 TB
    from nexgap_spark.operators import similarity, text

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, value double"
    )
    empty_docs = spark.createDataFrame([], "doc_id long, text string, n_chars long, lang string")
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")

    assert timeseries.interarrival_deltas(
        empty_ev, partition_cols=["user_id"]
    ).count() == 0
    assert timeseries.hopping_window_agg(
        empty_ev, aggs=[F.count("*").alias("n")]
    ).count() == 0
    assert timeseries.fixed_histogram(
        empty_ev, value_col="value", lo=0, hi=500, nbuckets=10
    ).count() == 0
    assert sampling.deterministic_sample(empty_ev, key_col="event_id").count() == 0
    assert sampling.stratified_sample(
        empty_ev, strata_cols=["user_id"], key_col="event_id", fraction=0.1
    ).count() == 0
    assert text.term_counts(empty_docs).count() == 0
    assert text.tfidf(empty_docs).count() == 0
    assert text.length_zscore(empty_docs).count() == 0
    assert similarity.centroid_outliers(empty_emb).count() == 0
    # month_spine on an empty frame: bounds are NULL → sequence yields no rows
    assert timeseries.month_spine(empty_ev, date_col="ts").count() == 0


def test_bigint_ts_rejected_loudly(spark):
    import pytest as _pytest

    from nexgap_spark.operators import timeseries as ts

    df = spark.createDataFrame([(1, 1_700_000_000_000_000_000, 1)],
                               "event_id long, ts long, user_id long")
    with _pytest.raises(TypeError, match="nanos-as-long"):
        ts.interarrival_deltas(df, partition_cols=["user_id"])
