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
