"""Every registered query with an oracle must hash-match DuckDB at sf0.01 —
the local twin of the driver's correctness gate."""

from __future__ import annotations

import pytest

from nexgap_spark.plans import ORACLES, QUERIES
from tests.conftest import SF_DIR
from tests.oracle_utils import compare

ORACLE_NAMES = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    rel = duck.sql(ORACLES[name])
    ok, msg = compare(sdf, rel)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark):
    # non-oracle queries still need to run and produce a stable schema
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} has no columns"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_q47_approx_distinct_within_rsd(spark):
    # bound the RAW HLL estimates against the exact distinct counts at 5%
    # (tighter than the 10% contract the registered query/oracle emit as
    # booleans); q12 computes the exact twin
    from pyspark.sql import functions as F

    from nexgap_spark.plans.registry import QUERIES
    from nexgap_spark.session import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem")
    approx = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        )
        .collect()
    }
    exact = {r.l_returnflag: r for r in QUERIES["q12_distinct_counts"](spark, SF_DIR).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        assert abs(approx[k].approx_parts - exact[k].n_parts) <= 0.05 * exact[k].n_parts
        assert abs(approx[k].approx_supps - exact[k].n_supps) <= 0.05 * exact[k].n_supps
    # the registered query's tolerance booleans must all hold
    for r in QUERIES["q47_approx_distinct"](spark, SF_DIR).collect():
        assert r.parts_within_tol and r.supps_within_tol, r
