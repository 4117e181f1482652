"""JSONL scan/sink with bad-row side channel (SURVEY S1/S6/S7).

The reference parses each line and skips invalid JSON with a warning
(run_end_to_end.py:163-176, convert_spans_to_chatcompletion.py:1777-1783).
Spark-first: a PERMISSIVE schema-bound scan routes unparseable lines into a
``_corrupt_record`` column instead of a Python loop; the count of dropped rows
is a cheap side output rather than log noise. At 100 TB this is the only
design that works — the scan stays JVM-side, columns prune, and filters push
down into the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    keep_corrupt_column: bool = True,
) -> DataFrame:
    """Schema-bound JSONL scan; malformed lines land in ``_corrupt_record``.

    Always pass an explicit schema: inference costs a full extra pass over
    the data (fatal at scale) and produces unstable types.
    """
    read_schema = schema
    if keep_corrupt_column and CORRUPT_COL not in schema.fieldNames():
        read_schema = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Return (good_rows_without_corrupt_col, corrupt_rows).

    Spark requires caching before filtering on the corrupt column in the
    same plan; the caller decides lifetime, we mark it here.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_jsonl(df: DataFrame, path: str, *, mode: str = "append") -> None:
    """JSONL append sink (reference S7 writes one object per line per record,
    Gyrfalcon/core/pipeline.py:1058-1060). Distributed append-mode JSON write;
    per-record immediate append has no distributed analog — micro-batching via
    foreachBatch covers the streaming case (see streaming/)."""
    df.write.mode(mode).json(path)
