"""Session-level helpers: the fan-out guard's no-op contract."""

from __future__ import annotations


def test_wide_table_noop_when_already_wide(spark, tmp_path):
    # the 100 TB contract: an input already at least cluster-wide passes
    # through UNTOUCHED (no extra exchange), narrow inputs get exactly one
    # round-robin repartition to defaultParallelism
    from nexgap_spark.session import fan_out_python_stage

    par = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(par + 4)
    assert fan_out_python_stage(wide) is wide  # identical object: no-op
    narrow = spark.range(10_000).coalesce(1)
    out = fan_out_python_stage(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == par
    assert out.count() == 10_000
