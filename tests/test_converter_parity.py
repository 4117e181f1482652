"""Whole-record parity: our converter vs the actual reference converter run
end-to-end on the same spans file with an equivalent framework config
(SURVEY §5 item 2 — the golden-establishment strategy).

Comparison is modulo tool-call ids (reference ids are uuid4, ours are
content-derived and deterministic) and modulo the enrichment columns our
pipeline adds (query/framework/langfuse_trace_id/stop are constants).
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

from tests.fixtures_spans import CONFIG_AGENTS, build_spans

REF_CONVERTER = "/root/reference/converter/trace/convert_spans_to_chatcompletion.py"


def _strip_ids(obj, key=None):
    if isinstance(obj, dict):
        return {
            k: _strip_ids(v, k)
            for k, v in obj.items()
            if k not in ("id", "tool_call_id")
        }
    if isinstance(obj, list):
        return [_strip_ids(x, key) for x in obj]
    if key == "arguments" and isinstance(obj, str):
        # ours serializes tool-call arguments to an OpenAI-spec JSON string;
        # the reference leaves the parsed dict in place — compare structurally
        try:
            return json.loads(obj)
        except ValueError:
            return obj
    return obj


@pytest.fixture(scope="module")
def ref_records(tmp_path_factory):
    if not os.path.exists(REF_CONVERTER):
        pytest.skip("reference unavailable")
    d = tmp_path_factory.mktemp("refconv")
    spans_path = str(d / "spans.jsonl")
    with open(spans_path, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
    # minimal framework config naming the same agents our converter gets
    cfg = d / "framework_config.yaml"
    sysprompt = d / "sys.md"
    sysprompt.write_text("prompt")
    cfg.write_text(
        "agents:\n"
        + "".join(
            f"  - agent_name: {a}\n    sysprompt_path: sys.md\n    llm_config: main\n"
            for a in CONFIG_AGENTS
        )
        + "llm_configs:\n  - llm_name: main\n    provider: openai\n    model: gpt-x\n"
    )
    spec = importlib.util.spec_from_file_location("ref_conv_e2e", REF_CONVERTER)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    conv = ref.SpansToChatCompletionConverter(framework_config_path=str(cfg))
    out = conv.convert_spans_file(spans_path, str(d / "out.jsonl"))
    return [json.loads(line) for line in open(out)]


def test_whole_record_parity_with_reference(spark, ref_records, tmp_path):
    from nexgap_spark.engine import Engine

    eng = Engine(spark)
    spans_path = str(tmp_path / "spans.jsonl")
    with open(spans_path, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
    spans = eng.read_spans(spans_path)
    ours = {
        r["span_id"]: r
        for r in (
            json.loads(row)
            for row in eng.convert(spans, config_agents=CONFIG_AGENTS)
            .toJSON()
            .collect()
        )
    }
    theirs = {r["span_id"]: r for r in ref_records}
    assert ours.keys() == theirs.keys()
    for span_id in theirs:
        ref_r = theirs[span_id]
        my_r = ours[span_id]
        # Known, deliberate divergence: the reference's "Sub-agent: " strip
        # (convert_spans_to_chatcompletion.py:494-504) is unreachable — the
        # verbatim-parent fallback at :483-486 returns first — so it emits
        # "Sub-agent: researcher". We implement the evidently intended
        # semantics (strip, then match config agents); normalize here.
        ref_agent = (ref_r.get("agent_name") or "").removeprefix("Sub-agent: ") or None
        assert my_r.get("agent_name") == ref_agent, span_id
        assert _strip_ids(my_r["messages"]) == _strip_ids(ref_r["messages"]), span_id


# ---------------------------------------------------------------------------
# NexAU whole-record parity: the actual reference NexAU converter
# (convert_spans_to_chatcompletion_nexau.py) vs our nexau dispatch path.
# The NexAU format has no ids to strip (assistant content stays raw XML),
# so records compare exactly — modulo None-valued keys, which Spark's
# toJSON omits while the reference's json.dumps keeps as null.
# ---------------------------------------------------------------------------

REF_NEXAU_CONVERTER = (
    "/root/reference/converter/trace/convert_spans_to_chatcompletion_nexau.py"
)


def _drop_nones(obj):
    if isinstance(obj, dict):
        return {k: _drop_nones(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_drop_nones(x) for x in obj]
    return obj


@pytest.fixture(scope="module")
def ref_nexau_records(tmp_path_factory):
    if not os.path.exists(REF_NEXAU_CONVERTER):
        pytest.skip("reference unavailable")
    # the reference resolves its generation marker from env at import time;
    # pin the default ("OpenAI-generation") for a deterministic golden
    os.environ.pop("USE_ANTHROPIC_API", None)
    d = tmp_path_factory.mktemp("refconv_nexau")
    spans_path = str(d / "spans.jsonl")
    with open(spans_path, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
    spec = importlib.util.spec_from_file_location("ref_conv_nexau_e2e", REF_NEXAU_CONVERTER)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    conv = ref.SpansToChatCompletionConverter()
    out = conv.convert_spans_file(spans_path, str(d / "out.jsonl"))
    return [json.loads(line) for line in open(out)]


def test_whole_record_parity_nexau(spark, ref_nexau_records, tmp_path):
    from nexgap_spark.engine import Engine

    eng = Engine(spark)
    spans_path = str(tmp_path / "spans.jsonl")
    with open(spans_path, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
    spans = eng.read_spans(spans_path)
    records, mode = eng.convert_framework(
        spans, "nexau", config_agents=CONFIG_AGENTS
    )
    assert mode == "nexau"
    ours = {
        r["span_id"]: r
        for r in (json.loads(row) for row in records.toJSON().collect())
    }
    theirs = {r["span_id"]: r for r in ref_nexau_records}
    assert ours.keys() == theirs.keys()
    for span_id in theirs:
        ref_r = _drop_nones(theirs[span_id])
        my_r = _drop_nones(ours[span_id])
        # agent_name is the VERBATIM parent span name in NexAU — including
        # the 'Sub-agent: ' prefix the a4a path strips
        assert my_r.get("agent_name") == ref_r.get("agent_name"), span_id
        assert my_r.get("trace_id") == ref_r.get("trace_id"), span_id
        assert my_r["messages"] == ref_r["messages"], span_id
    # the fixture's Sub-agent parent must surface verbatim (divergence from
    # the a4a path, which strips the prefix) and meta must be excluded
    by_agent = {r.get("agent_name") for r in ours.values()}
    assert "Sub-agent: researcher" in by_agent
    assert "meta" not in by_agent
