"""F7/F8 emitter tests: golden shapes per target format + full parity with
the reference implementation across the fixture corpus × all five targets."""

from __future__ import annotations

import importlib.util
import os

import pytest

from nexgap_spark.functions.emitters import TARGET_FORMATS, convert_message, convert_nested
from tests import fixtures_xml as FX

REF = "/root/reference/converter/trace/convert_trace_to_specific_tool_call_style.py"


def test_qwen_shape():
    out = convert_message(FX.TOOL_USE_SIMPLE, "qwen")
    assert "<tool_call>" in out and "<function=web_search>" in out
    assert "<parameter=query>spark window functions</parameter>" in out


def test_minimax_shape():
    out = convert_message(FX.TOOL_USE_SIMPLE, "minimax")
    assert "<invoke name=web_search>" in out
    assert "<parameter name=max_results>5</parameter>" in out


def test_glm_shape():
    out = convert_message(FX.TOOL_USE_SIMPLE, "glm")
    assert "<tool_call>web_search" in out
    assert "<arg_key>query</arg_key>" in out


def test_openrouter_shape():
    out = convert_message(FX.TOOL_USE_SIMPLE, "openrouter")
    assert "<web_search>" in out and "</web_search>" in out


def test_deepseek_shape():
    out = convert_message(FX.TOOL_USE_SIMPLE, "deepseek")
    assert "<｜tool▁calls▁begin｜>" in out and "<｜tool▁sep｜>" in out
    assert '"query": "spark window functions"' in out


def test_parallel_wrapper_preserved():
    out = convert_message(FX.PARALLEL_TOOLS, "qwen")
    assert out.startswith("<use_parallel_tool_calls>")
    assert out.count("<tool_call>") == 2


def test_sub_agent_becomes_tool():
    out = convert_message(FX.SUB_AGENT, "qwen")
    assert "<function=sub-agent>" in out
    assert "<parameter=agent_name>researcher</parameter>" in out


def test_malformed_kept():
    # unparseable tool_use stays as-is
    bad = "<tool_use><parameter><a>1</a></parameter></tool_use>"
    assert convert_message(bad, "qwen") == bad


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        convert_message("x", "nope")


def test_nested_transform():
    record = {"tools": [{"function": {"description": FX.TOOL_USE_SIMPLE, "n": 1}}]}
    out = convert_nested(record, "glm")
    assert "<arg_key>query</arg_key>" in out["tools"][0]["function"]["description"]
    assert out["tools"][0]["function"]["n"] == 1


@pytest.mark.skipif(not os.path.exists(REF), reason="reference unavailable")
@pytest.mark.parametrize("target", TARGET_FORMATS)
def test_parity_with_reference(target):
    spec = importlib.util.spec_from_file_location("ref_fmt", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    for content in FX.ALL_CONTENTS:
        assert convert_message(content, target) == ref.convert_message_format(
            content, target
        ), f"[{target}] mismatch for: {content[:60]}"
