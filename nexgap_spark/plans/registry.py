"""Registry for named queries and their DuckDB oracles.

Conventions that make the driver's order-insensitive hash compare pass:
  * alias every computed column identically in Spark and SQL;
  * round double aggregates (2dp for money sums, 6dp for ratios/cosines);
  * cast integer aggregates to BIGINT on both sides (DuckDB SUM(int) is
    HUGEINT otherwise);
  * emit timestamps as formatted strings (Spark session TZ pinned to UTC,
    DuckDB is UTC-naive);
  * every LIMIT/top-k has a total deterministic ORDER BY (unique tiebreak).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with an
    equivalent DuckDB SQL oracle. No oracle => driver runs rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
