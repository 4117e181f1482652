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
