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

from nexgap_spark.session import invalidate_scan_path


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
    invalidate_scan_path(path)  # a cached scan of this dir is now stale


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
    invalidate_scan_path(path)  # a cached scan of this dir is now stale


def read_with_schema_evolution(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written across schema versions (columns added over
    time): ``mergeSchema`` unions the footer schemas and nulls the missing
    columns in old files.

    mergeSchema costs a footer read per file at planning time — acceptable
    for a landing zone; a curated table should instead be rewritten to the
    current schema (see compact_parquet). Filters and pruning still apply
    to whichever columns a given file has.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_rows_per_file: int = 1_000_000,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a fragmented directory into
    ceil(rows/target) right-sized files, optionally re-clustering on
    ``sort_cols`` so footer min/max stay selective after the rewrite.
    Returns the number of output files requested.

    This is the maintenance job every streaming/append pipeline needs —
    micro-batch sinks leave thousands of KB-scale files whose per-file open
    cost dominates scans.

    Plan shape: the count pass is nearly free — count() over a bare parquet
    scan is answered from footer row counts (an empty projection, no data
    pages), and the expensive part it shares with the rewrite (the 50k-file
    directory listing) is cached in the session's shared FileIndex. Do NOT
    persist the source to "share the scan": that forces a full
    materialization of every column into the block store — strictly more
    I/O than the footer-only count, and it can fill executor disks on
    exactly the large inputs compaction targets. The unsorted path uses
    repartition, NOT coalesce — coalesce propagates its low partition count
    INTO the scan, serializing the very read this job exists to speed up;
    the repartition shuffle costs one pass of right-sized blocks and keeps
    the scan wide.
    """
    df = spark.read.parquet(src)
    n_rows = df.count()
    n_files = max(1, -(-n_rows // target_rows_per_file))
    _compaction_rewrite(df, dst, n_files, sort_cols)
    return n_files


def _compaction_rewrite(df, dst: str, n_files: int, sort_cols: list[str] | None) -> None:
    """Shared rewrite core for both compaction entry points (rows-targeted
    compact_parquet, bytes-targeted compact_parquet_dir)."""
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst)
    invalidate_scan_path(dst)  # a cached scan of this dir is now stale


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    out_path: str,
    *,
    target_mb: int = 256,
    sort_cols: list[str] | None = None,
) -> dict:
    """BYTES-targeted small-file compaction: rewrite a parquet directory
    into ``ceil(data_bytes / target_mb)`` files (the rows-targeted twin is
    :func:`compact_parquet`; both share one rewrite core, including the
    optional ``sort_cols`` re-clustering).

    Small-file corpora are the default outcome of incremental ingestion
    (one file per micro-batch/task) and they hurt twice at scale: metadata
    storms on the namenode/object store, and — measured in this repo —
    ``maxPartitionBytes`` PACKING many small files into few scan splits,
    which serializes per-row Python stages (SCALE.md round-10 media
    family, 6–15×). ``session.fan_out_python_stage`` guards the latter
    per-query; compaction fixes the layout once AT REST, which also
    restores JVM-scan parallelism that the guard deliberately leaves
    alone.

    Writes to ``out_path`` (never in place — overwriting a directory while
    scanning it is undefined), returns
    ``{files_before, bytes, files_after, rows}`` counting ONLY parquet
    data files (``_SUCCESS``/checksum artifacts excluded — a local
    checksummed FS would otherwise double the counts). Sizing uses the
    Hadoop FileSystem API, so any supported scheme works.
    """

    def _data_file_stats(dir_path: str) -> tuple[int, int]:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(dir_path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        it = fs.listFiles(jpath, True)
        n, total = 0, 0
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue  # _SUCCESS, .crc, _committed markers
            n += 1
            total += st.getLen()
        return n, total

    files_before, total_bytes = _data_file_stats(path)
    n_out = max(1, -(-int(total_bytes) // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    rows = df.count()
    _compaction_rewrite(df, out_path, n_out, sort_cols)
    files_after, _ = _data_file_stats(out_path)
    return {
        "files_before": int(files_before),
        "bytes": int(total_bytes),
        "files_after": int(files_after),
        "rows": int(rows),
    }
