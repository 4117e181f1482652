"""Span-tree operators under the oracle gate (SURVEY §2.3-§2.5: A1, J1/J2,
J3-companion root walk).

No spans table ships in /root/testdata, so each query first derives a
deterministic parent-pointer forest from ``events`` (pure arithmetic on
event_id — identical in Spark and the DuckDB oracle), then runs the real
library operators from nexgap_spark.operators.span_tree on it. The library's
fixture-based tests cover the string-typed Langfuse shape; these queries prove
the join/window plans against an independent engine.

Derived forest: event_id % 100 == 0 → root; % 10 == 0 → child of the
enclosing 100-block root; otherwise → child of the enclosing 10-block node.
Depth ≤ 2, mirroring the reference's shallow span trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.operators import span_tree
from nexgap_spark.plans.registry import query
from nexgap_spark.session import load_table as t

_DERIVED_SPANS_SQL = """
      SELECT event_id AS span_id,
             CASE WHEN event_id % 100 = 0 THEN NULL
                  WHEN event_id % 10 = 0 THEN event_id - (event_id % 100)
                  ELSE event_id - (event_id % 10) END AS parent_id,
             event_type AS span_name,
             ts
      FROM events
"""


def _derived_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    parent = (
        F.when(F.col("event_id") % 100 == 0, F.lit(None).cast("long"))
        .when(F.col("event_id") % 10 == 0, F.col("event_id") - (F.col("event_id") % 100))
        .otherwise(F.col("event_id") - (F.col("event_id") % 10))
    )
    return ev.select(
        F.col("event_id").alias("span_id"),
        parent.alias("parent_id"),
        F.col("event_type").alias("span_name"),
        F.col("ts"),
    )


# ---------------------------------------------------------------------------
# q21 — A1 last-per-group dedup (reference
# convert_spans_to_chatcompletion.py:1637-1687) through the real operator.
# ---------------------------------------------------------------------------


@query(
    "q21_span_last_per_group",
    oracle=f"""
    WITH spans AS ({_DERIVED_SPANS_SQL})
    SELECT group_key, span_id, span_name
    FROM (
      SELECT COALESCE(parent_id, span_id) AS group_key, span_id, span_name,
             ROW_NUMBER() OVER (
               PARTITION BY COALESCE(parent_id, span_id)
               ORDER BY ts DESC, span_id DESC) AS rn
      FROM spans
    )
    WHERE rn = 1
    """,
)
def q21_span_last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # startTime stays timestamp-typed: the operator's to_timestamp() is an
    # identity on it, and formatting 10 M rows to microsecond strings just
    # to parse them back measured ~40% of the whole query at spans ×100
    spans = _derived_spans(spark, sf_dir).select(
        F.col("span_id"),
        F.col("parent_id").alias("parentObservationId"),
        F.col("span_name"),
        F.col("ts").alias("startTime"),
    )
    deduped = span_tree.last_generation_per_group(spans)
    return deduped.select(
        F.coalesce("parentObservationId", "span_id").alias("group_key"),
        "span_id",
        "span_name",
    )


# ---------------------------------------------------------------------------
# q22 — J1/J2 broadcast parent join (reference :454-526): child count per
# parent span name; roots tagged 'ROOT'.
# ---------------------------------------------------------------------------


@query(
    "q22_span_parent_join",
    oracle=f"""
    WITH spans AS ({_DERIVED_SPANS_SQL})
    SELECT COALESCE(p.span_name, 'ROOT') AS parent_name, COUNT(*) AS n_children
    FROM spans c
    LEFT JOIN spans p ON c.parent_id = p.span_id
    GROUP BY 1
    """,
)
def q22_span_parent_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = _derived_spans(spark, sf_dir).withColumnRenamed(
        "parent_id", "parentObservationId"
    )
    joined = span_tree.join_parent(spans)
    return joined.groupBy(
        F.coalesce("parent_span_name", F.lit("ROOT")).alias("parent_name")
    ).agg(F.count("*").alias("n_children"))


# ---------------------------------------------------------------------------
# q23 — J3 multi-hop root resolution (reference :460-509 walk) through the
# iterative self-join operator; per-tree span counts.
# ---------------------------------------------------------------------------


@query(
    "q23_span_root_walk",
    oracle=f"""
    WITH spans AS ({_DERIVED_SPANS_SQL})
    SELECT root_id, COUNT(*) AS tree_size
    FROM (
      SELECT s.span_id,
             COALESCE(gp.span_id, p.span_id, s.span_id) AS root_id
      FROM spans s
      LEFT JOIN spans p  ON s.parent_id = p.span_id
      LEFT JOIN spans gp ON p.parent_id = gp.span_id
    )
    GROUP BY root_id
    """,
)
def q23_span_root_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = _derived_spans(spark, sf_dir)
    resolved = span_tree.resolve_root(
        spans, id_col="span_id", parent_col="parent_id", max_hops=3
    )
    return resolved.groupBy("root_id").agg(F.count("*").alias("tree_size"))
