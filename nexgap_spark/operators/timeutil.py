"""Dtype-tolerant timestamp helpers.

The driver's ``events.parquet`` encoding has changed across rounds:
TIMESTAMP(NANOS) (read as ``bigint`` under ``nanosAsLong``), then plain
``timestamp[us]`` with no UTC flag (read as ``timestamp_ntz``). Spark's
``F.unix_micros`` accepts only TIMESTAMP (with local time zone), so every
temporal operator must tolerate whatever dtype the caller hands it.

``epoch_us`` casts through ``timestamp`` first: a no-op for TIMESTAMP
columns, and value-identical for TIMESTAMP_NTZ because the engine pins
``spark.sql.session.timeZone=UTC`` (session.py) — the NTZ wall-clock is
reinterpreted as UTC, which is exactly what the data means.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP **or** TIMESTAMP_NTZ input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def as_timestamp(df: DataFrame, col: str) -> DataFrame:
    """Normalize ``col`` to TIMESTAMP (ltz) if it is TIMESTAMP_NTZ.

    A ``bigint`` column is rejected loudly: it is almost certainly the
    nanos-as-long parquet encoding, and ``epoch_us``'s cast would silently
    reinterpret nanoseconds as SECONDS (year ~55 billion) — the silent
    version of the DATATYPE_MISMATCH the raw unix_micros would have raised.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    elif dtype == "bigint":
        raise TypeError(
            f"column {col!r} is bigint — likely the nanos-as-long events "
            "encoding; load it via nexgap_spark.session.load_table, which "
            "converts to a proper timestamp"
        )
    return df


def pin_utc_session(spark) -> None:
    """Pin the session timezone to UTC (required for NTZ→timestamp casts to
    be value-identical) and make the nanos-as-long parquet read work on ANY
    caller-supplied session. A non-UTC session gets a warning rather than a
    silent semantics change to its own timestamp parsing/rendering — the
    shared guard for session.load_table AND streaming.read_event_stream
    (one definition, so the two load paths cannot drift)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if prev_tz not in (None, "UTC", "Etc/UTC", "GMT"):
        import warnings

        warnings.warn(
            f"nexgap_spark pins spark.sql.session.timeZone=UTC (was "
            f"{prev_tz!r}); timestamp string conversions in this session "
            "now render in UTC",
            stacklevel=3,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Scan-width pin: delegated to the named helper, which RESPECTS a
    # caller-tuned value (r14 review: the unconditional set here was a
    # scan-planning side effect outside this function's contract that
    # silently clobbered caller tuning).
    pin_scan_width(spark)


_SCAN_OPEN_COST = str(512 * 1024)


def pin_scan_width(spark, *, force: bool = False) -> bool:
    """Set ``spark.sql.files.openCostInBytes`` to 512 KB — the scan-width
    pin the engine's per-row-heavy projections need (the small-file corpora
    this engine reads bin-pack into 1-2 scan tasks under the 4 MB HDFS-era
    default; see the get_spark builder comment for the derivation).

    A caller who EXPLICITLY configured a different value keeps it (the
    conf being unset — ``conf.get(key, None) is None`` — or already equal
    to the pin are the only states overwritten); pass ``force=True`` to
    clobber anyway. Returns whether the pin was applied. Called by
    :func:`pin_utc_session` on the engine's load paths, so a
    caller-supplied session gets the same split planning as
    ``session.get_spark``'s builder unless the caller tuned it."""
    key = "spark.sql.files.openCostInBytes"
    current = spark.conf.get(key, None)
    if force or current in (None, _SCAN_OPEN_COST):
        spark.conf.set(key, _SCAN_OPEN_COST)
        return True
    return False


def normalize_ts_encoding(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Normalize every known driver ts encoding to TIMESTAMP: bigint
    (TIMESTAMP(NANOS) under nanosAsLong — integer div, not float: the double
    path rounds ±1 µs at epoch magnitudes) and TIMESTAMP_NTZ (cast is
    value-identical under the UTC session pin_utc_session establishes).
    ``cols=None`` normalizes every bigint column named 'ts' and every NTZ
    column of any name."""
    dtypes = dict(df.dtypes)
    if cols is None:  # explicit cols=[] means "normalize nothing", not auto-detect
        cols = [
            c for c, t in dtypes.items() if t == "timestamp_ntz" or (c == "ts" and t == "bigint")
        ]
    targets = cols
    for c in targets:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
