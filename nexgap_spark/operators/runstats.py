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
    per-status breakdown map, from one two-stage hash aggregate.

    NULL statuses count as failures (anything-but-success, the reference's
    binary view) and appear in the map under '__null__' — map keys cannot
    be NULL and silently dropping rows would break n_total. Empty input
    yields zeros (not NULLs) with a NULL rate (0/0 is undefined, not 0%).
    """
    status = F.coalesce(F.col(status_col).cast("string"), F.lit("__null__"))
    by_status = df.groupBy(status.alias("_status")).agg(F.count("*").alias("n"))
    n_success = F.sum(
        F.when(F.col("_status") == success_value, F.col("n")).otherwise(0)
    )
    return by_status.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_total"),
        F.coalesce(n_success, F.lit(0)).cast("long").alias("n_success"),
        F.coalesce(F.sum("n") - n_success, F.lit(0)).cast("long").alias("n_failed"),
        F.round(n_success / F.sum("n"), 4).alias("success_rate"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_status"), F.col("n")))
        ).alias("by_status"),
    )
