"""Converter-pipeline queries under the oracle gate: the pandas-UDF document
ops (XML extraction, validators, format emitters) driven end-to-end on spans
synthesized deterministically from the ``documents`` table.

The synthesis rule is pure column arithmetic, so the DuckDB oracle can state
the *expected* outcome independently (golden-by-construction): the Spark side
runs the real distributed pipeline (P2/P10 filters → A1 window → J3 agent
joins → mapInPandas document transform); the oracle just knows what the
answer must be. This is the strongest check available for non-SQL operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nexgap_spark.plans.registry import query
from nexgap_spark.session import load_table as t

# Synthesized assistant content: a prose frame around one <tool_use> block
# whose parameter comes from the document text.
_PRE = (
    "Processing document.\n<tool_use>\n<tool_name>lookup</tool_name>\n"
    "<parameter>\n<query>"
)
_POST_OK = "</query>\n<topk>5</topk>\n</parameter>\n</tool_use>\nDone."
_POST_BAD = "</query>\n<topk>5</topk>\n</parameter>\nDone."  # unclosed tool_use

CONFIG_AGENTS = [f"src{i}" for i in range(40)]


def _content_col(malformed_every: int | None = None):
    q = F.substring("text", 1, 40)
    ok = F.concat(F.lit(_PRE), q, F.lit(_POST_OK))
    if malformed_every is None:
        return ok
    bad = F.concat(F.lit(_PRE), q, F.lit(_POST_BAD))
    return F.when(F.col("doc_id") % malformed_every == 0, bad).otherwise(ok)


def _synth_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one 2-span trace each: an agent root span (named by
    source) and a generation child carrying the synthesized content."""
    docs = t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    null_map = F.lit(None).cast("map<string,bigint>")
    null_meta = F.lit(None).cast("map<string,string>")
    gen = docs.select(
        F.concat(F.lit("t"), did).alias("trace_id"),
        F.concat(F.lit("g"), did).alias("span_id"),
        F.lit("GENERATION").alias("span_type"),
        F.lit("OpenAI-generation").alias("span_name"),
        F.lit("synth-model").alias("model"),
        F.array(
            F.struct(F.lit("system").alias("role"), F.lit("You are an assistant.").alias("content")),
            F.struct(F.lit("user").alias("role"), F.substring("text", 1, 60).alias("content")),
        ).alias("input"),
        F.array(
            F.struct(F.lit("assistant").alias("role"), _content_col().alias("content"))
        ).alias("output"),
        F.lit("2025-01-01T00:00:01").alias("startTime"),
        F.lit("2025-01-01T00:00:02").alias("endTime"),
        null_map.alias("usage"),
        null_meta.alias("metadata"),
        F.concat(F.lit("r"), did).alias("parentObservationId"),
        F.lit(0).alias("level"),
    )
    empty_msgs = F.lit(None).cast("array<struct<role:string,content:string>>")
    roots = docs.select(
        F.concat(F.lit("t"), did).alias("trace_id"),
        F.concat(F.lit("r"), did).alias("span_id"),
        F.lit("SPAN").alias("span_type"),
        F.col("source").alias("span_name"),
        F.lit(None).cast("string").alias("model"),
        empty_msgs.alias("input"),
        empty_msgs.alias("output"),
        F.lit("2025-01-01T00:00:00").alias("startTime"),
        F.lit("2025-01-01T00:00:03").alias("endTime"),
        null_map.alias("usage"),
        null_meta.alias("metadata"),
        F.lit(None).cast("string").alias("parentObservationId"),
        F.lit(0).alias("level"),
    )
    return gen.unionByName(roots)


# ---------------------------------------------------------------------------
# q37 — full converter pipeline (P2→P10→A1→J3→P3→mapInPandas transform);
# outcome known by construction: 3 messages, agent = source, tool 'lookup'.
# ---------------------------------------------------------------------------


@query(
    "q37_convert_pipeline",
    oracle="""
    SELECT 'g' || CAST(doc_id AS VARCHAR) AS span_id,
           source AS agent_name,
           3 AS n_messages,
           'lookup' AS tool_name
    FROM documents
    """,
)
def q37_convert_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.converter import convert_spans

    spans = _synth_spans(spark, sf_dir)
    out = convert_spans(spans, config_agents=CONFIG_AGENTS)
    return out.select(
        "span_id",
        "agent_name",
        F.size("messages").cast("int").alias("n_messages"),
        F.element_at(F.element_at("messages", -1)["tool_calls"], 1)["function"]["name"].alias(
            "tool_name"
        ),
    )


# ---------------------------------------------------------------------------
# q38 — V1-V6 validators over content with planted malformations (every 7th
# doc has an unclosed <tool_use>); expected verdict known by construction.
# ---------------------------------------------------------------------------


@query(
    "q38_validate_xml",
    oracle="""
    SELECT doc_id, (doc_id % 7 <> 0) AS valid FROM documents
    """,
)
def q38_validate_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.functions.validators import validate_message

    @F.pandas_udf(T.BooleanType())
    def valid_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda c: validate_message(c)[0])

    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", valid_udf(_content_col(malformed_every=7)).alias("valid")
    )


# ---------------------------------------------------------------------------
# q39 — F7 qwen-format rewrite; the oracle constructs the expected emission
# string directly (block replaced in place, prose frame preserved).
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# q40 — multimodal plumbing: binary payload + typed metadata through the
# mapInPandas feature-extraction stage (deterministic fake kernel; the real
# decoder slots into the same signature). The oracle reconstructs the fake
# kernel's md5-derived features byte by byte.
# ---------------------------------------------------------------------------


@query(
    "q40_media_features",
    # features land as eight scalar f0..f7 columns (not array<double>): the
    # driver's canonicalization sorts/hashes cell values and cannot hash lists.
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
           md5(text) AS digest,
           round((('0x' || substr(md5(text), 1, 2))::INT) / 255.0, 6) AS f0,
           round((('0x' || substr(md5(text), 3, 2))::INT) / 255.0, 6) AS f1,
           round((('0x' || substr(md5(text), 5, 2))::INT) / 255.0, 6) AS f2,
           round((('0x' || substr(md5(text), 7, 2))::INT) / 255.0, 6) AS f3,
           round((('0x' || substr(md5(text), 9, 2))::INT) / 255.0, 6) AS f4,
           round((('0x' || substr(md5(text), 11, 2))::INT) / 255.0, 6) AS f5,
           round((('0x' || substr(md5(text), 13, 2))::INT) / 255.0, 6) AS f6,
           round((('0x' || substr(md5(text), 15, 2))::INT) / 255.0, 6) AS f7
    FROM documents
    """,
)
def q40_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.operators.multimodal import (
        extract_features,
        fake_decode_kernel,
        media_from_documents,
    )

    docs = t(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media, kernel=fake_decode_kernel)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)],
    )


@query(
    "q39_emit_qwen",
    oracle="""
    SELECT doc_id,
           md5('Processing document.' || chr(10)
               || '<tool_call>' || chr(10)
               || '<function=lookup>' || chr(10)
               || '<parameter=query>' || trim(substr(text, 1, 40)) || '</parameter>' || chr(10)
               || '<parameter=topk>5</parameter>' || chr(10)
               || '</function>' || chr(10)
               || '</tool_call>' || chr(10)
               || 'Done.') AS rewritten_md5
    FROM documents
    """,
)
def q39_emit_qwen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexgap_spark.functions.emitters import rewrite_content_udf

    docs = t(spark, sf_dir, "documents")
    rewritten = rewrite_content_udf("qwen")(_content_col())
    return docs.select("doc_id", F.md5(rewritten).alias("rewritten_md5"))
