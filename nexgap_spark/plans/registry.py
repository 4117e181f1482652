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

# Declared-quadratic oracle baselines (r13 verdict item 1): correct at any
# scale but deliberately NOT scale-economical — they exist to cross-check
# their sub-quadratic scale twins (banded LSH / sign-LSH / SemDeDup), and
# the bench reports them SEPARATELY from the headline totals so no
# scale-claimed number includes a query that cannot run at 100x. Names in
# this set carry the `baseline_` prefix and sort last among NON-WINDOW
# catalog entries (driver-window membership is the one exception — r14
# put both baselines in the window so the rename gets external rows).
BASELINE_QUERIES: set[str] = set()


def query(name: str, oracle: str | None = None, *, baseline: bool = False):
    """Register a (spark, sf_dir) -> DataFrame callable, optionally with an
    equivalent DuckDB SQL oracle. No oracle => driver runs rows-only check
    (reserved for genuinely non-SQL-expressible ops). ``baseline=True``
    marks a declared-quadratic oracle baseline (see BASELINE_QUERIES)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if baseline:
            BASELINE_QUERIES.add(name)
        return fn

    return deco
