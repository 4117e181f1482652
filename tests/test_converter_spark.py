"""End-to-end converter pipeline on Spark: fixture span forest → filtered,
deduped, agent-resolved, document-transformed ChatCompletion records."""

from __future__ import annotations

import json

import pytest

from nexgap_spark.operators import span_tree
from nexgap_spark.operators.converter import convert_span_record, convert_spans
from nexgap_spark.schemas import SPAN_SCHEMA
from tests.fixtures_spans import CONFIG_AGENTS, build_spans


@pytest.fixture(scope="module")
def spans_df(spark):
    # Union-typed `output` (dict OR list) is normalized at ingest per
    # SURVEY §1.3; the pure-core test below exercises the dict path directly.
    rows = []
    for s in build_spans():
        s = dict(s)
        if isinstance(s["output"], dict):
            s["output"] = [s["output"]]
        rows.append(s)
    return spark.createDataFrame(rows, schema=SPAN_SCHEMA)


def test_a1_last_per_group(spans_df):
    gen = span_tree.filter_generation_spans(spans_df)
    kept = span_tree.last_generation_per_group(gen)
    ids = {r.span_id for r in kept.select("span_id").collect()}
    # span_0002 (early sibling under same parent) dropped; 0003 kept
    assert "span_0003" in ids and "span_0002" not in ids
    assert "span_0030" in ids  # null startTime → epoch floor, own group


def test_agent_resolution(spans_df):
    gen = span_tree.filter_generation_spans(spans_df)
    resolved = span_tree.resolve_agent_name(gen, CONFIG_AGENTS, parent_source=spans_df)
    by_id = {r.span_id: r.agent_name for r in resolved.collect()}
    assert by_id["span_0003"] == "planner"
    assert by_id["span_0011"] == "researcher"  # 'Sub-agent: ' prefix stripped
    assert by_id["span_0021"] == "meta"
    assert by_id["span_0030"] is None  # orphan


def test_full_pipeline(spans_df):
    out = convert_spans(spans_df, config_agents=CONFIG_AGENTS).collect()
    by_span = {r.span_id: r for r in out}
    # meta excluded (P3), event excluded (P2), early sibling deduped (A1)
    assert set(by_span) == {"span_0003", "span_0011", "span_0030"}

    rec = by_span["span_0003"]
    assert rec.agent_name == "planner"
    roles = [m.role for m in rec.messages]
    # system, user, assistant(with tool_calls), tool×2, assistant response
    assert roles == ["system", "user", "assistant", "tool", "tool", "assistant"]
    assistant = rec.messages[2]
    assert assistant.tool_calls[0].function.name == "web_search"
    tool_msg = rec.messages[3]
    assert tool_msg.name == "web_search"
    assert tool_msg.tool_call_id == assistant.tool_calls[0].id
    response = rec.messages[-1]
    assert response.tool_calls[0].function.name == "researcher_sub_agent"
    # F9: tool-definition section stripped from system prompt
    assert "TOOL_DEFINITIONS_START" not in rec.messages[0].content


def test_pure_core_matches_reference_shape():
    # dict-typed output (union normalization) and deterministic ids
    span = build_spans()[-2]  # span_0030 with dict output
    rec1 = convert_span_record(span, agent_name=None)
    rec2 = convert_span_record(span, agent_name=None)
    assert rec1 == rec2
    assert rec1["messages"][-1]["content"] == "hi"


def test_agent_tools_attach(spans_df):
    tools = {
        "planner": [
            {
                "type": "function",
                "function": {
                    "name": "web_search",
                    "description": "search",
                    "parameters": {"type": "object", "properties": {}},
                },
            }
        ]
    }
    out = convert_spans(spans_df, config_agents=CONFIG_AGENTS, agent_tools=tools).collect()
    rec = {r.span_id: r for r in out}["span_0003"]
    assert rec.tools[0].function.name == "web_search"
    assert json.loads(rec.tools[0].function.parameters) == {
        "type": "object",
        "properties": {},
    }
