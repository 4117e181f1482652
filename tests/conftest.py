"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper."""

from __future__ import annotations

import os

import duckdb
import pytest

from nexgap_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("NEXGAP_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nexgap_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()
