"""Span-tree → ChatCompletion converter pipeline (the reference's core
workload, convert_spans_to_chatcompletion.py:1511-1820, re-planned for Spark).

Relational stages (filters, window dedup, agent-resolution joins) run JVM-side
via operators.span_tree; the document transform (XML extraction, prompt
cleanup, tool pairing) is row-local and runs as one Arrow-batched
mapInPandas stage over the narrowed span set — mirroring the reference's
order (narrow first, transform last) so the expensive Python stage sees the
minimum row count.

The per-span pure core (`convert_span_record`) is shared by the Spark stage,
golden-file tests, and the driver's rows-only pipeline query.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexgap_spark.functions.prompts import clean_system_prompt
from nexgap_spark.functions.xml_tools import (
    deterministic_id_gen,
    extract_tool_calls,
    restore_closing_tags,
)
from nexgap_spark.operators import span_tree
from nexgap_spark.operators.pairing import pair_tool_results
from nexgap_spark.schemas import CHATCOMPLETION_SCHEMA, NEXAU_CHATCOMPLETION_SCHEMA

DEFAULT_MODEL = "nex"


def _normalize_output(output: Any) -> dict | None:
    """Union-typed output (dict OR list, reference :1527-1532) → first dict.
    Sequence check is duck-typed: Arrow batches surface arrays as numpy
    arrays, not lists."""
    if isinstance(output, dict):
        return output
    if output is None or isinstance(output, (str, bytes)):
        return None
    try:
        if len(output) > 0:
            first = output[0]
            return first if isinstance(first, dict) else None
    except TypeError:
        pass
    return None


def _tools_to_schema(tools: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Tool definitions with `parameters` JSON-encoded (schemas store the
    free-form JSON-Schema object as a string)."""
    out = []
    for t in tools:
        fn = t.get("function", {})
        params = fn.get("parameters")
        out.append(
            {
                "type": t.get("type", "function"),
                "function": {
                    "name": fn.get("name"),
                    "description": fn.get("description"),
                    "parameters": params
                    if isinstance(params, str) or params is None
                    else json.dumps(params, ensure_ascii=False),
                },
            }
        )
    return out


def convert_span_record(
    span: dict[str, Any],
    *,
    agent_name: str | None,
    agent_tools: dict[str, list[dict[str, Any]]] | None = None,
) -> dict[str, Any] | None:
    """Pure per-span conversion (reference :1511-1635 + the :1689-1759
    flatten, minus the relational stages which run in Spark):

    system messages    → F9 cleanup + J5 tool attach
    assistant messages → F3/F4/F5 XML extraction → tool_calls
    user tool results  → J4 ordered pairing → tool-role messages
    output             → F3 extraction → final assistant message
    """
    input_data = span.get("input")
    if input_data is None or len(input_data) == 0:  # numpy-array-safe (P10)
        return None
    next_id = deterministic_id_gen(str(span.get("span_id", "span")))
    tools: list[dict[str, Any]] = []
    messages: list[dict[str, Any]] = []

    for message in input_data:
        msg = dict(message or {})
        role = msg.get("role")
        if role == "system":
            messages.append({"role": "system", "content": clean_system_prompt(msg.get("content") or "")})
            # attach once — a conversation that re-injects its system
            # prompt mid-stream must not duplicate every tool definition.
            # (The reference extends per system message, but its tools are
            # EXTRACTED from each message's content (:1544-1561) — ours
            # come from the config map, where repeating is pure duplication.)
            if not tools and agent_tools and agent_name and agent_name in agent_tools:
                tools.extend(agent_tools[agent_name])
        elif role == "assistant":
            cleaned, calls = extract_tool_calls(msg.get("content") or "", next_id)
            msg["content"] = cleaned
            if calls:
                msg["tool_calls"] = calls
            messages.append(msg)
        else:
            messages.append(msg)

    messages = pair_tool_results(messages, next_id)

    response_content, response_calls = "", []
    output_data = _normalize_output(span.get("output"))
    if output_data and output_data.get("role") == "assistant":
        response_content, response_calls = extract_tool_calls(
            output_data.get("content") or "", next_id
        )
    response_msg: dict[str, Any] = {
        "role": "assistant",
        "content": response_content if response_content else None,
    }
    if response_calls:
        response_msg["tool_calls"] = response_calls
    messages.append(response_msg)

    return {
        "messages": messages,
        "tools": _tools_to_schema(tools),
        "agent_name": agent_name,
        "trace_id": span.get("trace_id"),
        "span_id": span.get("span_id"),
        "query": span.get("query"),
        "framework": span.get("framework"),
        "langfuse_trace_id": span.get("langfuse_trace_id"),
        "stop": span.get("stop", ""),
    }


def convert_span_record_nexau(
    span: dict[str, Any], *, agent_name: str | None
) -> dict[str, Any] | None:
    """Pure per-span NexAU conversion (reference
    convert_spans_to_chatcompletion_nexau.py:118-313). Deliberately much
    simpler than the OpenAI-format core above — the NexAU wire format
    keeps assistant content as raw XML:

    * input messages pass through VERBATIM except assistant messages,
      whose content gets closing-tag restoration (F4, :149-155);
    * no system-prompt cleanup, no tool-definition attach, no tool-call
      extraction, no tool-result pairing;
    * the response is one assistant message carrying the raw output
      content (:163-166);
    * a span whose output is not a dict (or first-of-list dict) is
      SKIPPED — the reference's ``.get`` on it raises inside the
      per-span try/except (:352-366) and the span is dropped, not
      emitted with empty content. Same for an assistant input message
      whose content is not a string (None/list): the restoration's
      ``in`` test raises and the span is dropped (:149-151).
    """
    input_data = span.get("input")
    if input_data is None or len(input_data) == 0:  # :139-140
        return None
    output_data = _normalize_output(span.get("output"))
    if output_data is None:
        return None
    messages: list[dict[str, Any]] = []
    for message in input_data:
        msg = dict(message or {})
        if msg.get("role") == "assistant":
            content = msg.get("content", "")
            if not isinstance(content, str):
                return None
            msg["content"] = restore_closing_tags(content)
        messages.append(msg)
    messages.append(
        {"role": "assistant", "content": output_data.get("content", "")}
    )
    return {
        "messages": messages,
        "agent_name": agent_name,
        "trace_id": span.get("trace_id"),
        "span_id": span.get("span_id"),
    }


def _message_to_schema(msg: dict[str, Any]) -> dict[str, Any]:
    calls = msg.get("tool_calls")
    return {
        "role": msg.get("role"),
        "content": msg.get("content"),
        "tool_calls": [
            {
                "id": c.get("id"),
                "type": c.get("type"),
                "function": {
                    "name": (c.get("function") or {}).get("name"),
                    "arguments": (c.get("function") or {}).get("arguments"),
                },
            }
            for c in calls
        ]
        if calls
        else None,
        "tool_call_id": msg.get("tool_call_id"),
        "name": msg.get("name"),
    }


def convert_spans(
    spans: DataFrame,
    *,
    config_agents: list[str],
    agent_tools: dict[str, list[dict[str, Any]]] | None = None,
    generation_marker: str | tuple[str, ...] = span_tree.GENERATION_MARKERS,
    trace_col: str | None = None,
) -> DataFrame:
    """Full converter pipeline: P2 → P10 → A1 window dedup → J3 agent
    resolution → P3 → per-row document transform (mapInPandas).

    `agent_tools` is captured in the UDF closure; Spark broadcasts it with
    the serialized task (keep it ≤ a few MB, as the reference's MCP cache is,
    docs/converter.md:184-185).

    ``trace_col``: trace-co-located mode — over a span store bucketed on
    the trace column (span_tree.join_parent's docstring) the J3 resolver
    runs every hop as an exchange-free bucket-local join instead of the
    capped-broadcast build. Same output as the broadcast path for rows
    with NON-NULL trace ids (pinned in tests); a NULL trace id cannot
    co-locate, so such a row keeps agent_name NULL here where the
    broadcast path would still resolve it — don't enable trace mode on
    tables with null trace ids.
    """
    # Materialize an expensive input (synthesized / window-fed span tables)
    # ONCE: the pipeline reads `spans` as the probe AND as the unfiltered
    # parent source, and the resolver's exit branches re-read it — over a
    # parquet scan those re-reads are free and no checkpoint happens, but
    # re-running a per-row Python synthesis for each consumer took q37
    # ×100 from 17.6 s to 47 s during round 10's rework.
    spans = span_tree._ensure_cheap(spans)
    narrowed = span_tree.filter_generation_spans(spans, generation_marker)
    narrowed = span_tree.filter_nonempty_input(narrowed)
    # The transform below is CPU-bound per RECORD (~100 µs each), so the
    # right fan-out is core count — NOT the byte-based size AQE coalesces
    # the A1 window exchange to. session.py deliberately sets
    # parallelismFirst=false (64 MB advisory targets are correct for JVM
    # stages at scale), but compressed span text makes that exchange look
    # tiny: at docs ×100 AQE handed this stage ONE partition and 500 k
    # records ran serially. Fix: the window PRE-partitions on its own
    # group key to exactly defaultParallelism — the keyed repartition
    # satisfies the window's required distribution (it replaces the
    # window exchange, not adds one) and its REPARTITION_BY_NUM origin is
    # AQE-coalesce-exempt, so everything downstream (broadcast joins,
    # filters, the Arrow stage) inherits guaranteed width with zero extra
    # exchange. (Do NOT probe partition counts via df.rdd here: under AQE
    # that executes every upstream stage just to read the number.)
    from nexgap_spark.session import adaptive_width

    narrowed = span_tree.last_generation_per_group(
        narrowed, pre_partition=adaptive_width(spans)
    )
    # parents resolve against the UNFILTERED table — ancestors are usually
    # non-generation spans that P2 just removed
    resolved = span_tree.resolve_agent_name(
        narrowed, config_agents, parent_source=spans, trace_col=trace_col
    )
    resolved = span_tree.exclude_meta(resolved)

    out_fields = [f.name for f in CHATCOMPLETION_SCHEMA.fields]

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for span in pdf.to_dict("records"):
                rec = convert_span_record(
                    span, agent_name=span.get("agent_name"), agent_tools=agent_tools
                )
                if rec is None:
                    continue
                rec["messages"] = [_message_to_schema(m) for m in rec["messages"]]
                rows.append({k: rec.get(k) for k in out_fields})
            yield pd.DataFrame(rows, columns=out_fields)

    return resolved.mapInPandas(transform, schema=CHATCOMPLETION_SCHEMA)


def convert_spans_nexau(
    spans: DataFrame,
    *,
    config_agents: list[str] | None = None,
    agent_tools: dict[str, list[dict[str, Any]]] | None = None,
    generation_marker: str | tuple[str, ...] = span_tree.GENERATION_MARKERS,
    trace_col: str | None = None,
) -> DataFrame:
    """NexAU whole-record pipeline (reference
    convert_spans_to_chatcompletion_nexau.py:314-373): P2 → P10 → A1
    window dedup → J2 parent-name attach → meta exclusion → per-row NexAU
    transform. Same relational skeleton as convert_spans, with two
    deliberate differences that make it a distinct pipeline rather than a
    flag:

    * ``agent_name`` is the VERBATIM immediate parent span_name (:55-70)
      — no 'Sub-agent: ' strip, no config-agent matching, no multi-hop
      ancestor walk. ``config_agents``/``agent_tools`` are accepted for
      dispatch-signature compatibility (operators/dispatch.py) and
      ignored, exactly as the reference's __init__ ignores its
      framework_config_path argument (:45-47).
    * the document transform is convert_span_record_nexau (raw-XML
      passthrough; see its docstring).
    """
    # same single-materialization rationale as convert_spans
    spans = span_tree._ensure_cheap(spans)
    narrowed = span_tree.filter_generation_spans(spans, generation_marker)
    narrowed = span_tree.filter_nonempty_input(narrowed)
    # keyed pre-window repartition: replaces the window exchange with an
    # AQE-coalesce-exempt one, guaranteeing Python-stage width with zero
    # extra shuffle (same rationale as convert_spans above)
    from nexgap_spark.session import adaptive_width

    narrowed = span_tree.last_generation_per_group(
        narrowed, pre_partition=adaptive_width(spans)
    )
    # immediate parent only, resolved against the UNFILTERED span table —
    # parents are usually the non-generation agent spans P2 removed;
    # build side is cap-checked (span_tree._parent_side) like every other
    # parent join, so a giant span table degrades to a shuffle, not an OOM.
    # trace_col: exchange-free bucket-local join over a trace-bucketed
    # store instead (span_tree.join_parent's docstring)
    if trace_col is not None:
        parents = spans.select(
            F.col(trace_col).alias("_p_trace"),
            F.col("span_id").alias("_p_id"),
            F.col("span_name").alias("agent_name"),
        ).hint("shuffle_hash")
        resolved = narrowed.join(
            parents,
            (narrowed[trace_col] == parents["_p_trace"])
            & (narrowed["parentObservationId"] == parents["_p_id"]),
            "left",
        ).drop("_p_trace", "_p_id")
    else:
        parents, _, _hinted = span_tree._parent_side(
            spans.select(
                F.col("span_id").alias("_p_id"), F.col("span_name").alias("agent_name")
            ),
            None,
        )
        resolved = narrowed.join(
            parents, narrowed["parentObservationId"] == parents["_p_id"], "left"
        ).drop("_p_id")
    resolved = span_tree.exclude_meta(resolved)

    out_fields = [f.name for f in NEXAU_CHATCOMPLETION_SCHEMA.fields]

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for span in pdf.to_dict("records"):
                rec = convert_span_record_nexau(
                    span, agent_name=span.get("agent_name")
                )
                if rec is None:
                    continue
                rec["messages"] = [_message_to_schema(m) for m in rec["messages"]]
                rows.append({k: rec.get(k) for k in out_fields})
            yield pd.DataFrame(rows, columns=out_fields)

    return resolved.mapInPandas(transform, schema=NEXAU_CHATCOMPLETION_SCHEMA)
