"""Bucketed tables: co-located joins and aggregations without a shuffle.

Bucketing pre-hashes rows into a fixed number of files per partition at
WRITE time; a later join or aggregation on the bucket key reads data
already distributed the way the shuffle would have distributed it, so the
Exchange disappears from the plan. At 100 TB this converts every repeated
join against a fact table's key (events by user_id, lineitem by orderkey)
from a full-data shuffle into a local zip of matching buckets — the single
biggest recurring saving in a pipeline that joins the same big tables
round after round.

Spark's bucketing rides the table catalog (`saveAsTable`); these helpers
use EXTERNAL tables (explicit ``path``) so data lands where the caller
says and the catalog entry is just metadata. Both sides of a join must be
bucketed on the same key with the same bucket count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_cols: list[str],
    buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and optionally
    sorted) by ``bucket_cols``. Sorting within buckets additionally removes
    the Sort from sort-merge joins on the same key.

    The pre-write repartition on the bucket columns is load-bearing: each
    write TASK emits one file per bucket it holds rows for, so an
    unrepartitioned wide DataFrame (say 2 000 partitions × 32 buckets)
    writes up to 64 000 small files; clustering first caps it at ~1 file
    per bucket."""
    df = df.repartition(buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    # a cached plain-parquet scan of the same directory is now stale
    from nexgap_spark.session import invalidate_scan_path

    invalidate_scan_path(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; bucket metadata comes from the catalog, which
    is what lets the planner drop the Exchange."""
    return spark.table(table)
