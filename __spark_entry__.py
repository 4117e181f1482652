"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (+ scale extensions) as
(spark, sf_dir) -> DataFrame callables; ``oracle_sql()`` holds the matching
DuckDB SQL. The catalog itself lives in nexgap_spark.plans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nexgap_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: regional revenue — the
    multi-join + broadcast-dim + aggregate shape the engine is built around."""
    return QUERIES["q02_regional_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; keys without an entry are
    non-SQL-expressible ops checked rows-only by the driver."""
    return dict(ORACLES)
