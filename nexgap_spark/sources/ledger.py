"""Idempotent-ingest ledger (SURVEY S4/S5, U3).

The reference checks per-trace output files / a JSON ledger with flock
(get_traces.py:158-161, converter/cache_manager.py:64-76). Spark-first: the
ledger is a parquet table of processed keys and "skip if processed" is a
``left_anti`` join — no locks, no per-key filesystem stats, scales to
billions of keys (the anti-join broadcasts when the ledger is small and
shuffles cleanly when it is not).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def anti_join_processed(candidates: DataFrame, ledger: DataFrame, key: str) -> DataFrame:
    """Rows of ``candidates`` whose ``key`` is NOT in the ledger."""
    return candidates.join(ledger.select(key).distinct(), on=key, how="left_anti")


def mark_processed(done: DataFrame, ledger_path: str, key: str) -> None:
    """Append newly-processed keys to the ledger table (idempotent:
    duplicates are harmless because readers always ``distinct()``)."""
    done.select(key).distinct().write.mode("append").parquet(ledger_path)
    # an append changes the file listing — drop any cached scan of it
    from nexgap_spark.session import invalidate_scan_path

    invalidate_scan_path(ledger_path)


def read_ledger(spark: SparkSession, ledger_path: str, key: str) -> DataFrame:
    """Read the ledger; empty DataFrame when it does not exist yet.

    Existence goes through the path's own Hadoop FileSystem — a driver-local
    ``os.path.exists`` reads every remote scheme (s3a://, hdfs://) as
    missing, which would silently disable idempotency and reprocess the
    whole corpus on exactly the filesystems a large pipeline uses."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(ledger_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path):
        return spark.createDataFrame([], f"{key} string")
    return spark.read.parquet(ledger_path)
