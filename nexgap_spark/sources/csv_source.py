"""CSV scan/sink with the same bad-row side channel as the JSONL source.

Same design rules: explicit schema (inference = an extra full pass),
PERMISSIVE mode routing malformed lines into ``_corrupt_record``, scan
stays JVM-side so filters push down and columns prune. Quote/escape/header
handling is the reader's job, never a UDF's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from nexgap_spark.sources.jsonl import CORRUPT_COL


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    keep_corrupt_column: bool = True,
) -> DataFrame:
    """Schema-bound CSV scan; rows with the wrong arity or unparseable
    cells land in ``_corrupt_record`` instead of killing the job."""
    read_schema = schema
    if keep_corrupt_column and CORRUPT_COL not in schema.fieldNames():
        read_schema = T.StructType(
            schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("enforceSchema", "true")
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink. ``single_file`` coalesces to one output part — only for
    small exports (reports, samples); a corpus-scale write keeps one file
    per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.option("header", str(header).lower()).mode(mode).csv(path)
