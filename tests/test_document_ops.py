"""Document-ops unit + parity tests (no Spark needed — pure cores).

Parity: the actual reference converter at /root/reference is imported and run
on the same fixture corpus; extraction results must match modulo tool-call
ids (ours are deterministic, the reference's are uuid4). This is the
golden-establishment strategy from SURVEY §5/§7.
"""

from __future__ import annotations

import importlib.util
import json
import os
import re

import pytest

from nexgap_spark.functions import validators as V
from nexgap_spark.functions.xml_tools import (
    deterministic_id_gen,
    extract_tool_calls,
    restore_closing_tags,
)
from nexgap_spark.operators.pairing import pair_tool_results
from tests import fixtures_xml as FX

REF_CONVERTER = "/root/reference/converter/trace/convert_spans_to_chatcompletion.py"
REF_VALIDATOR = "/root/reference/converter/trace/filter_xml_errors.py"


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _strip_ids(calls):
    return [
        {"type": c["type"], "function": c["function"]}
        for c in calls
    ]


# ---------------------------------------------------------------------------
# Extraction unit tests
# ---------------------------------------------------------------------------


def test_simple_tool_use():
    cleaned, calls = extract_tool_calls(FX.TOOL_USE_SIMPLE)
    assert len(calls) == 1
    fn = calls[0]["function"]
    assert fn["name"] == "web_search"
    assert json.loads(fn["arguments"]) == {
        "query": "spark window functions",
        "max_results": "5",
    }
    assert "<tool_use>" not in cleaned
    assert "Let me search." in cleaned and "Done." in cleaned


def test_truncated_tool_use_restored():
    cleaned, calls = extract_tool_calls(FX.TOOL_USE_TRUNCATED)
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "calculator"


def test_restore_idempotent():
    once = restore_closing_tags(FX.TOOL_USE_TRUNCATED)
    assert restore_closing_tags(once) == once


def test_sub_agent():
    _, calls = extract_tool_calls(FX.SUB_AGENT)
    assert calls[0]["function"]["name"] == "researcher_sub_agent"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "message": "Find recent OLAP papers"
    }


def test_parallel_tools_order():
    _, calls = extract_tool_calls(FX.PARALLEL_TOOLS)
    assert [c["function"]["name"] for c in calls] == ["search_a", "search_b"]


def test_parallel_sub_agents_mixed():
    _, calls = extract_tool_calls(FX.PARALLEL_SUB_AGENTS)
    names = [c["function"]["name"] for c in calls]
    assert names == ["alpha_agent_sub_agent", "beta_agent_sub_agent", "gamma_tool"]


def test_batch_agent():
    _, calls = extract_tool_calls(FX.BATCH_AGENT)
    args = json.loads(calls[0]["function"]["arguments"])
    assert args == {
        "batch_mode": True,
        "input_file": "items.jsonl",
        "format": "jsonl",
        "message_template": "Process {item} carefully",
    }


def test_cjk_params():
    _, calls = extract_tool_calls(FX.CJK_TAGS)
    assert calls[0]["function"]["name"] == "翻译工具"
    assert json.loads(calls[0]["function"]["arguments"]) == {"文本": "你好世界"}


def test_plain_text_untouched():
    cleaned, calls = extract_tool_calls(FX.PLAIN_TEXT)
    assert calls == []
    assert cleaned == FX.PLAIN_TEXT


def test_deterministic_ids():
    _, a = extract_tool_calls(FX.PARALLEL_TOOLS, deterministic_id_gen("s1"))
    _, b = extract_tool_calls(FX.PARALLEL_TOOLS, deterministic_id_gen("s1"))
    _, c = extract_tool_calls(FX.PARALLEL_TOOLS, deterministic_id_gen("s2"))
    assert [x["id"] for x in a] == [x["id"] for x in b]
    assert [x["id"] for x in a] != [x["id"] for x in c]
    assert all(re.fullmatch(r"call_[0-9a-f]{32}", x["id"]) for x in a)


# ---------------------------------------------------------------------------
# Validator unit tests
# ---------------------------------------------------------------------------


def test_validators_pass_well_formed():
    for content in (
        FX.TOOL_USE_SIMPLE,
        FX.SUB_AGENT,
        FX.PARALLEL_TOOLS,
        FX.PARALLEL_SUB_AGENTS,
        FX.BATCH_AGENT,
        FX.SUB_AGENT_WITH_HISTORY,
        FX.PLAIN_TEXT,
        FX.CJK_TAGS,
    ):
        ok, errs = V.validate_message(content)
        assert ok, errs


def test_validators_fail_malformed():
    ok, errs = V.validate_message(FX.MALFORMED_UNBALANCED)
    assert not ok and any("mismatch" in e or "Unclosed" in e for e in errs)


def test_validator_bad_history():
    ok, errs = V.validate_message(FX.SUB_AGENT_BAD_HISTORY)
    assert not ok and any("CDATA" in e for e in errs)


def test_validator_truncated():
    ok, errs = V.validate_message("<tool_use><tool_name>x</tool_name>")
    assert not ok


def test_nexau_agent_message_required():
    content = (
        "<tool_use><tool_name>agent:researcher</tool_name>"
        "<parameter><q>x</q></parameter></tool_use>"
    )
    ok_a4a, _ = V.validate_message(content, mode="a4a")
    ok_nexau, errs = V.validate_message(content, mode="nexau")
    assert ok_a4a and not ok_nexau
    assert any("<message>" in e for e in errs)


# ---------------------------------------------------------------------------
# Pairing (J4) unit tests
# ---------------------------------------------------------------------------


def _assistant(calls):
    return {
        "role": "assistant",
        "content": "",
        "tool_calls": [
            {"id": f"id_{n}", "type": "function", "function": {"name": n, "arguments": "{}"}}
            for n in calls
        ],
    }


def test_pairing_name_first():
    msgs = [
        _assistant(["alpha", "beta"]),
        {"role": "user", "content": "Tool execution results:\n<tool_result><tool_name>beta</tool_name><result>B</result></tool_result>"},
        {"role": "user", "content": "Tool execution results:\n<tool_result><tool_name>alpha</tool_name><result>A</result></tool_result>"},
    ]
    out = pair_tool_results(msgs)
    tools = [m for m in out if m["role"] == "tool"]
    assert [(t["name"], t["tool_call_id"]) for t in tools] == [
        ("beta", "id_beta"),
        ("alpha", "id_alpha"),
    ]


def test_pairing_fifo_fallback():
    msgs = [
        _assistant(["alpha"]),
        {"role": "user", "content": "Tool execution results:\n<tool_result><tool_name>other</tool_name><result>X</result></tool_result>"},
    ]
    out = pair_tool_results(msgs)
    tool = [m for m in out if m["role"] == "tool"][0]
    assert tool["tool_call_id"] == "id_alpha"  # FIFO pop despite name mismatch
    assert tool["name"] == "other"


def test_pairing_synthesizes_id_when_no_pending():
    msgs = [
        {"role": "user", "content": "Tool execution results:\n<tool_result><tool_name>ghost</tool_name><result>X</result></tool_result>"},
    ]
    out = pair_tool_results(msgs)
    tool = out[0]
    assert tool["role"] == "tool" and tool["tool_call_id"].startswith("call_")


def test_pairing_unstructured_fallback():
    msgs = [
        _assistant(["alpha"]),
        {"role": "user", "content": "Tool execution results: raw text output"},
    ]
    out = pair_tool_results(msgs)
    tool = [m for m in out if m["role"] == "tool"][0]
    assert tool["name"] == "unknown_tool"
    assert tool["content"] == "raw text output"
    assert tool["tool_call_id"] == "id_alpha"


# ---------------------------------------------------------------------------
# Parity with the actual reference implementation
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(REF_CONVERTER), reason="reference unavailable")
def test_extraction_parity_with_reference():
    ref = _load_ref(REF_CONVERTER, "ref_conv")
    conv = ref.SpansToChatCompletionConverter()
    for content in FX.ALL_CONTENTS:
        ref_cleaned, ref_calls = conv.extract_tool_calls_from_xml(content)
        my_cleaned, my_calls = extract_tool_calls(content)
        assert my_cleaned == ref_cleaned, f"cleaned mismatch for: {content[:60]}"
        assert _strip_ids(my_calls) == _strip_ids(ref_calls), (
            f"calls mismatch for: {content[:60]}"
        )


@pytest.mark.skipif(not os.path.exists(REF_VALIDATOR), reason="reference unavailable")
@pytest.mark.parametrize("mode", ["a4a", "nexau"])
def test_validator_parity_with_reference(mode):
    ref = _load_ref(REF_VALIDATOR, "ref_val")
    rv = ref.XMLValidator(mode=mode)
    for content in FX.ALL_CONTENTS:
        ref_ok, ref_errs = rv.validate_message(content)
        my_ok, my_errs = V.validate_message(content, mode=mode)
        assert my_ok == ref_ok, f"[{mode}] verdict mismatch for: {content[:60]}"
        assert my_errs == ref_errs, f"[{mode}] errors mismatch for: {content[:60]}"


@pytest.mark.skipif(not os.path.exists(REF_CONVERTER), reason="reference unavailable")
def test_pairing_parity_with_reference():
    ref = _load_ref(REF_CONVERTER, "ref_conv")
    conv = ref.SpansToChatCompletionConverter()
    msgs = [
        {"role": "system", "content": "sys"},
        _assistant(["web_search", "calculator"]),
        {"role": "user", "content": FX.TOOL_RESULT_MESSAGE},
    ]
    import copy

    ref_out = conv.convert_tool_results_to_messages(copy.deepcopy(msgs))
    my_out = pair_tool_results(copy.deepcopy(msgs))
    assert my_out == ref_out


def test_language_id_zh_and_unknown(spark):
    from nexgap_spark.operators import text

    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and happy"),
            (2, "这是一个完全没有空格的中文句子和它的内容"),
            (3, "xyzzy plugh qwerty"),  # no marker hits anywhere
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.pred_lang, r.pred_lang_hits) for r in text.language_id(df).collect()}
    assert got[1][0] == "en"
    assert got[2][0] == "zh" and got[2][1] > 0  # substring scoring, not dead code
    assert got[3][0] == "und" and got[3][1] == 0  # unknown, not alphabetical-first


def test_pii_scan_mixed_case_email(spark):
    from nexgap_spark.operators import curation

    df = spark.createDataFrame(
        [(1, "Contact John.Doe@Gmail.COM please")], "id long, text string"
    )
    r = curation.pii_scan(df).first()
    assert r.n_emails == 1
    assert "John.Doe@Gmail.COM" not in r.redacted


def test_length_zscore_keeps_null_groups(spark):
    from pyspark.sql import functions as F

    from nexgap_spark.operators import text

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, None, 30), (4, None, 50)],
        "doc_id long, lang string, n_chars long",
    )
    out = text.length_zscore(df)
    assert out.count() == 4  # NULL-group rows scored, not dropped
    z_null = {r.doc_id: r.z for r in out.filter(F.col("lang").isNull()).collect()}
    assert z_null[3] is not None and abs(z_null[3] + z_null[4]) < 1e-9


def test_ngram_logprob_semantics(spark):
    # seen bigrams score higher than unseen; short/NULL docs survive with
    # NULL scores; repetition counts as instances, not distinct pairs
    from nexgap_spark.operators.text import ngram_logprob

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),       # all bigrams seen in train
            (2, "purple monkey dishwasher"),  # all unseen
            (3, "one"),               # < 2 tokens → NULL score
            (4, None),                # NULL text → NULL score
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_logprob(docs, train).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].n_bigrams == 2 and got[2].n_bigrams == 2
    assert got[1].avg_logprob > got[2].avg_logprob
    assert got[3].n_bigrams == 0 and got[3].avg_logprob is None
    assert got[4].n_bigrams == 0 and got[4].avg_logprob is None
