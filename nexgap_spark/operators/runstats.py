"""Run-lifecycle predicates and summaries (SURVEY P8 / A8).

P8 empty-query guard — the reference rejects a work item with an empty
``query`` before spending an agent run on it (run_end_to_end.py:826-830).
A8 run summary — success/failed counts and rate over per-item statuses
(run_end_to_end.py:1047-1052; get_traces.py saved/failed/skipped/exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_nonempty_query(
    df: DataFrame, *, query_col: str = "query"
) -> tuple[DataFrame, DataFrame]:
    """P8: (rows with a non-empty query, rejected rows tagged with the
    reference's stop reason). Whitespace-only counts as empty — the
    reference's falsy check fires on '' after its strip."""
    nonempty = F.length(F.trim(F.coalesce(F.col(query_col), F.lit("")))) > 0
    kept = df.filter(nonempty)
    rejected = df.filter(~nonempty).withColumn("stop", F.lit("empty_query"))
    return kept, rejected


def run_summary(
    df: DataFrame,
    *,
    status_col: str = "status",
    success_value: str = "success",
) -> DataFrame:
    """A8: one row — (n_total, n_success, n_failed, success_rate) plus a
    per-status breakdown map. Single hash aggregate; the map is built from
    the same pass (map_from_entries over a collected-small statuses agg
    would add a shuffle, so the breakdown rides a pivot-free conditional
    count only for the two reference statuses and the map covers the rest)."""
    by_status = df.groupBy(status_col).agg(F.count("*").alias("n"))
    return by_status.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum(F.when(F.col(status_col) == success_value, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_success"),
        F.sum(F.when(F.col(status_col) != success_value, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_failed"),
        F.round(
            F.sum(F.when(F.col(status_col) == success_value, F.col("n")).otherwise(0))
            / F.sum("n"),
            4,
        ).alias("success_rate"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col(status_col), F.col("n")))
        ).alias("by_status"),
    )
