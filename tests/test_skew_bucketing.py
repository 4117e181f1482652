"""Skew mitigation + bucketing: semantic equivalence and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexgap_spark.operators import skew
from nexgap_spark.session import load_table
from nexgap_spark.sources.bucketed import read_bucketed, write_bucketed
from tests.conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_agg_equals_plain_agg(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    got = skew.salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", "*"),
            "total": ("sum", "value"),
            "first_id": ("min", "event_id"),
            "last_id": ("max", "event_id"),
        },
        buckets=8,
    )
    want = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("total"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )
    cols = ["event_type", "n", "first_id", "last_id"]
    assert _rows(got, cols) == _rows(want, cols)
    # float sums: order differs between salted/plain, compare rounded
    assert sorted(
        (r["event_type"], round(r["total"], 6)) for r in got.collect()
    ) == sorted((r["event_type"], round(r["total"], 6)) for r in want.collect())


def test_salted_agg_rejects_non_mergeable(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    with pytest.raises(ValueError):
        skew.salted_agg(ev, ["event_type"], {"a": ("avg", "value")})


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, how):
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "event_type")
    users = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    got = skew.salted_join(ev, users, ["user_id"], buckets=8, how=how)
    want = ev.join(users, ["user_id"], how)
    cols = ["event_id", "user_id", "event_type", "user_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_distributes_hot_key(spark):
    # one key owning 99% of rows: salted shuffle must spread it over >1
    # partition of the join exchange — measured via the salt distribution
    hot = spark.range(10_000).select(
        F.lit(1).alias("k"), F.col("id").alias("payload")
    )
    left = hot.union(
        spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("payload"))
    )
    right = left.select("k").distinct().withColumn("tag", F.col("k") * 10)
    got = skew.salted_join(left, right, ["k"], buckets=8)
    assert got.count() == left.count()
    salted = left.withColumn("_salt", F.floor(F.rand(42) * 8).cast("int"))
    n_salts = salted.filter(F.col("k") == 1).select("_salt").distinct().count()
    assert n_salts > 1


def test_top_keys_diagnostic(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    top = skew.top_keys(ev, ["user_id"], n=5)
    rows = top.collect()
    assert len(rows) == 5
    shares = [r["share"] for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_number_rows_scalable_matches_global_window(spark):
    from nexgap_spark.operators.span_tree import number_rows, number_rows_scalable

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    got = number_rows_scalable(ev, order_col="event_id")
    want = number_rows(ev, order_col="event_id")
    assert _rows(got, ["event_id", "seq"]) == _rows(want, ["event_id", "seq"])
    # the big side is range-partitioned, not funneled through one partition
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    by_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    write_bucketed(
        ev.select("event_id", "user_id", "value"),
        "ev_bucketed",
        str(tmp_path / "ev"),
        bucket_cols=["user_id"],
        buckets=8,
        sort_cols=["user_id"],
    )
    write_bucketed(
        by_user,
        "users_bucketed",
        str(tmp_path / "users"),
        bucket_cols=["user_id"],
        buckets=8,
        sort_cols=["user_id"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge plan: broadcast would hide the exchange question
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_bucketed(spark, "ev_bucketed").join(
            read_bucketed(spark, "users_bucketed"), "user_id"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it computes the right thing
        assert joined.count() == ev.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS ev_bucketed")
        spark.sql("DROP TABLE IF EXISTS users_bucketed")
