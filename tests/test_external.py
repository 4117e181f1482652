"""External-call layer: pure parsers + retry policy (no Spark needed)."""

from __future__ import annotations

import pytest

from nexgap_spark.external.client import (
    FlakyClient,
    MockLLMClient,
    call_with_retries,
)
from nexgap_spark.external.parse import (
    extract_json_object,
    parse_difficulty_distribution,
    parse_difficulty_variants,
)


def test_mock_deterministic():
    c1, c2 = MockLLMClient(seed=1), MockLLMClient(seed=1)
    assert c1.complete("hello") == c2.complete("hello")
    assert c1.complete("hello") != MockLLMClient(seed=2).complete("hello")


def test_difficulty_triplet_roundtrip():
    c = MockLLMClient()
    resp = c.complete("Generate EASY MEDIUM HARD variants for: do a thing")
    parsed = parse_difficulty_variants(resp)
    assert [p["difficulty"] for p in parsed] == ["easy", "medium", "hard"]
    assert all(p["content"] for p in parsed)


def test_chinese_parse():
    resp = "**简单:** 简单任务\n**中等:** 中等任务\n**困难:** 困难任务"
    parsed = parse_difficulty_variants(resp, language="chinese")
    assert [p["difficulty"] for p in parsed] == ["easy", "medium", "hard"]
    assert parsed[0]["content"] == "简单任务"


def test_parse_ignores_unknown_labels():
    resp = "**INTRO:** hi\n**EASY:** a\n**HARD:** b"
    parsed = parse_difficulty_variants(resp)
    assert [p["difficulty"] for p in parsed] == ["easy", "hard"]


def test_distribution_validation():
    assert parse_difficulty_distribution("easy:0.2,medium:0.5,hard:0.3") == {
        "easy": 0.2,
        "medium": 0.5,
        "hard": 0.3,
    }
    with pytest.raises(ValueError):
        parse_difficulty_distribution("easy:0.5,medium:0.5,hard:0.3")
    with pytest.raises(ValueError):
        parse_difficulty_distribution("easy:0.5,medium:0.5")
    with pytest.raises(ValueError):
        parse_difficulty_distribution("easy:0.5,weird:0.5")


def test_json_salvage():
    assert extract_json_object('noise {"a": 1, "b": [2]} trailing') == {"a": 1, "b": [2]}
    assert extract_json_object("no json here") == {}
    assert extract_json_object("{broken") == {}


def test_retries_succeed_after_transient_failures():
    flaky = FlakyClient(MockLLMClient(), fail_first=2)
    out = call_with_retries(flaky, "p", retries=3)
    assert out.startswith("mock-response-")


def test_retries_exhausted():
    flaky = FlakyClient(MockLLMClient(), fail_first=5)
    with pytest.raises(RuntimeError, match="after 3 attempts"):
        call_with_retries(flaky, "p", retries=3)
