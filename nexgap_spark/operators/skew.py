"""Skew mitigation: salted aggregation and salted joins.

At 100 TB a single hot key (one power-user in `events`, one giant dup
cluster in `documents`) turns a shuffle into one straggler task. AQE's skew
handling (enabled in session.get_spark) rebalances *sort-merge join* and
*rebalance* shuffles at runtime; these helpers cover the cases AQE does not:
hash aggregations with hot grouping keys, and broadcast-ineligible joins
where one side's key distribution is pathological.

Semantics are identical to the unsalted groupBy/join — tests assert row-level
equality — only the shuffle distribution changes: a hot key's rows spread
over ``buckets`` partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def hashable_cols(df: DataFrame, cols: list[str] | None = None) -> list[Column]:
    """Columns made safe for xxhash64/hash: MapType is not hashable in Spark
    (HASH_MAP_TYPE analysis error by default), so map columns go through
    to_json first. Deterministic per physical row — the same row binary
    always serializes the same way — which is exactly the retry-safety
    property the salting/tiebreak hashes need."""
    cols = df.columns if cols is None else cols
    types = dict(df.dtypes)
    return [
        F.to_json(F.col(c)) if types.get(c, "").startswith("map<") else F.col(c)
        for c in cols
    ]

# (partial expr per (key, salt) group, final re-combine over salt groups)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) recombine. ``aggs`` maps output column → (fn, input col)
    with fn ∈ {sum, count, min, max} (the mergeable aggregates; avg = sum
    and count recombined by the caller).

    The first shuffle spreads each hot key across ``buckets`` partitions;
    the second shuffles only ``|distinct keys| × buckets`` partial rows —
    negligible next to the raw data. Map-side partial aggregation already
    softens skew for built-in aggs; salting is for when the *reduce* side
    still concentrates (e.g. high-cardinality payloads per hot key).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"{name}: {fn} is not mergeable; use sum/count/min/max")
    # DETERMINISTIC salt (hash of the whole row), not rand(): under partial
    # stage recomputation a retried map task must send each row to the SAME
    # reduce partition the first attempt did, or already-fetched outputs
    # double-count/lose rows. Full-duplicate rows share a salt — at full-row
    # granularity that residual hotspot is acceptable; rand()'s correctness
    # hole is not.
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*hashable_cols(df), F.lit(seed)), F.lit(buckets))
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _MERGEABLE[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGEABLE[fn][1](F.col(name)).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    buckets: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted: each skewed row gets a random
    salt in [0, buckets); ``other`` is replicated once per salt value; the
    join key becomes (on..., salt). A hot key's probe rows land on
    ``buckets`` partitions instead of one; the build side grows ``buckets``×,
    so keep ``other`` the smaller side (if it were broadcast-small you
    wouldn't salt at all — broadcast joins don't shuffle the skewed side).

    Row-level semantics equal ``skewed.join(other, on, how)`` for how ∈
    {inner, left}: every skewed row carries exactly one salt and every
    (key, salt) it can need exists on the replicated side.

    WHEN TO SALT — measured, not assumed (tools_skew.py, SCALE.md
    round-15): at 20 M rows on 32 cores the hot-key straggler is real
    (parallel efficiency 0.74 → 0.15 as one key grows to 50 % of rows)
    but cheap (~0.43 s per 10 M hot rows of serial sort-merge), and the
    salt's per-row tax exceeded the saving at EVERY hot share in both
    dim regimes — `salted_join_wins_at_shares: []`. Salting is insurance
    against the partition-size wall, not a wall-clock optimization at
    comfortable sizes: reach for it when hot_rows × bytes/row approaches
    one executor's memory (a 10 % key of a 100 TB fact is 10 TB in ONE
    sort task — that partition doesn't straggle, it dies). Below that
    threshold, plain shuffle join + AQE is faster.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt_values = skewed.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias(_SALT)
    )
    # deterministic for the same retry-safety reason as salted_agg
    left = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*hashable_cols(skewed), F.lit(seed)), F.lit(buckets)).cast("int"),
    )
    right = other.crossJoin(F.broadcast(salt_values))
    return left.join(right, on + [_SALT], how).drop(_SALT)


def top_keys(df: DataFrame, keys: list[str], *, n: int = 20) -> DataFrame:
    """Skew diagnostic: the n heaviest key groups with their share of rows —
    the thing to look at before deciding between AQE, salting, or isolating
    hot keys into a broadcast path."""
    total = df.count()
    counts = df.groupBy(*keys).count()
    return (
        counts.withColumn("share", F.round(F.col("count") / F.lit(total), 6))
        .orderBy(F.col("count").desc(), *keys)
        .limit(n)
    )
