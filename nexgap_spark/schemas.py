"""Explicit StructTypes for the engine's record types (SURVEY.md §1.1,
FIXTURES.md). The reference keeps these implicit as dict key conventions
(spans: reference converter/trace/langfuse_utils.py:105-125; query records:
Gyrfalcon/core/pipeline.py:1039-1056; chatcompletion:
convert_spans_to_chatcompletion.py:1749-1759). Here they are first-class so
scans never infer and nested-column pruning works.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# (a) Span — one observation in a Langfuse trace tree.
# The reference's union-typed `output` (dict OR list,
# convert_spans_to_chatcompletion.py:1527-1532) is normalized at ingest to
# array<struct> — see sources/jsonl.normalize_output.
# ---------------------------------------------------------------------------

MESSAGE_TYPE = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

SPAN_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("span_type", T.StringType()),  # GENERATION / SPAN / EVENT
        T.StructField("span_name", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("input", T.ArrayType(MESSAGE_TYPE)),
        T.StructField("output", T.ArrayType(MESSAGE_TYPE)),
        T.StructField("startTime", T.StringType()),  # ISO-8601, nullable
        T.StructField("endTime", T.StringType()),
        T.StructField("usage", T.MapType(T.StringType(), T.LongType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("parentObservationId", T.StringType()),  # tree edge
        T.StructField("level", T.IntegerType()),
    ]
)

# Enrichment columns added downstream (reference run_end_to_end.py:366-374).
SPAN_ENRICHED_SCHEMA = T.StructType(
    SPAN_SCHEMA.fields
    + [
        T.StructField("query", T.StringType()),
        T.StructField("framework", T.StringType()),
        T.StructField("langfuse_trace_id", T.StringType()),
        T.StructField("stop", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# (b) Generated query record (Gyrfalcon output).
# ---------------------------------------------------------------------------

QUERY_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("query", T.StringType(), False),
        T.StructField("difficulty", T.StringType()),  # easy / medium / hard
        T.StructField("trace_context", T.ArrayType(T.StringType())),
        T.StructField("framework", T.StringType()),
        T.StructField("problem_type", T.StringType()),
        T.StructField("requires_local_files", T.BooleanType()),
        T.StructField("used_web_search", T.BooleanType()),
        T.StructField("fuzzified", T.BooleanType()),
        T.StructField("original_query", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# ---------------------------------------------------------------------------
# (c) ChatCompletion training record (converter output,
# docs/converter.md:123-155 shape).
# ---------------------------------------------------------------------------

TOOL_CALL_TYPE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField(
            "function",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    # JSON-encoded string-in-string, as in the reference
                    # (convert_spans_to_chatcompletion.py:1001).
                    T.StructField("arguments", T.StringType()),
                ]
            ),
        ),
    ]
)

CHAT_MESSAGE_TYPE = T.StructType(
    [
        T.StructField("role", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("tool_calls", T.ArrayType(TOOL_CALL_TYPE)),
        T.StructField("tool_call_id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

TOOL_DEFINITION_TYPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "function",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("description", T.StringType()),
                    # parameters kept as a JSON string: tool schemas are
                    # free-form JSON-Schema objects, not a fixed struct.
                    T.StructField("parameters", T.StringType()),
                ]
            ),
        ),
    ]
)

CHATCOMPLETION_SCHEMA = T.StructType(
    [
        T.StructField("messages", T.ArrayType(CHAT_MESSAGE_TYPE)),
        T.StructField("tools", T.ArrayType(TOOL_DEFINITION_TYPE)),
        T.StructField("agent_name", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("framework", T.StringType()),
        T.StructField("langfuse_trace_id", T.StringType()),
        T.StructField("stop", T.StringType()),
    ]
)

# The NexAU wire format keeps assistant content as raw XML (no tool_calls
# extraction) and never attaches tool definitions or enrichment columns —
# its records are exactly {messages, agent_name, trace_id, span_id}
# (reference convert_spans_to_chatcompletion_nexau.py:256-312).
NEXAU_CHATCOMPLETION_SCHEMA = T.StructType(
    [
        T.StructField("messages", T.ArrayType(CHAT_MESSAGE_TYPE)),
        T.StructField("agent_name", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# (d) Taxonomy paths — driver-side recursion over {id,en,zh,children}
# exploded once into a flat paths table (SURVEY §1.3; reference
# tree_manager.py:60-71 is the explode).
# ---------------------------------------------------------------------------

TAXONOMY_PATHS_SCHEMA = T.StructType(
    [
        T.StructField("framework", T.StringType()),
        T.StructField("path_id", T.StringType(), False),
        T.StructField("node_ids", T.ArrayType(T.StringType())),
        T.StructField("en_labels", T.ArrayType(T.StringType())),
        T.StructField("zh_labels", T.ArrayType(T.StringType())),
        T.StructField("depth", T.IntegerType()),
    ]
)

# (e) Sampling-statistics histogram (reference sampling_manager.py:41-58).
SAMPLING_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("framework", T.StringType()),
        T.StructField("path_id", T.StringType(), False),
        T.StructField("cnt", T.LongType()),
    ]
)

# (f) Persona rows (reference framework_manager.py:33-54).
PERSONA_SCHEMA = T.StructType(
    [
        T.StructField("framework", T.StringType()),
        T.StructField("persona", T.StringType()),
        T.StructField("persona_chinese", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Multimodal rows: opaque binary payload + typed metadata (scale extension).
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image / audio / video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)
