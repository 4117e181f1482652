"""Partitioned parquet sink — the landing format of a 100 TB pipeline.

Hive-style directory partitioning gives readers partition pruning for free
(a filter on the partition column never touches other directories), and
``maxRecordsPerFile`` bounds file sizes so a wide cluster write produces
neither multi-GB files (no read parallelism) nor milli-KB files (metadata
storms). Pre-repartitioning on the partition columns keeps it to one task
per partition value — skip it (``repartition_first=False``) when partition
values are few and hot, where write parallelism matters more than file
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    max_records_per_file: int | None = 1_000_000,
    repartition_first: bool = True,
    mode: str = "overwrite",
) -> None:
    out = df.repartition(*partition_cols) if repartition_first else df
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back from directory names; filters on them
    show up as PartitionFilters in the scan (pruning, not reading)."""
    return spark.read.parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    *,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: ``repartitionByRange`` + ``sortWithinPartitions``
    on the cluster columns, so each parquet file (and each row group inside
    it) covers a narrow, disjoint value range.

    This is the complement of Hive partitioning for HIGH-cardinality keys
    where one-directory-per-value would be a metadata storm: the parquet
    footer min/max statistics become selective, so a point or range filter
    on the cluster key skips whole files/row groups at scan time instead of
    reading and discarding. The range exchange samples the key distribution,
    so skewed keys still land in balanced files."""
    out = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    out.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)
