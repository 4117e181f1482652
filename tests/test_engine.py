"""Engine facade: the reference's CLI surface as one end-to-end flow —
spans JSONL → convert → validate → emit → (separately) corpus dedup."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from nexgap_spark.engine import Engine
from nexgap_spark.session import load_table
from tests.conftest import SF_SMOKE
from tests.fixtures_spans import CONFIG_AGENTS, build_spans


@pytest.fixture(scope="module")
def engine(spark):
    return Engine(spark)


@pytest.fixture(scope="module")
def spans_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("spans") / "spans.jsonl"
    with open(p, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
        f.write("{not json\n")  # corrupt line: must be dropped, not fatal
    return str(p)


def test_read_convert_validate_emit(engine, spans_path):
    spans = engine.read_spans(spans_path)
    assert spans.count() == len(build_spans())

    records = engine.convert(spans, config_agents=CONFIG_AGENTS)
    n_records = records.count()
    assert n_records > 0

    valid, errors = engine.filter_valid(records)
    assert valid.count() + errors.count() == n_records
    assert "xml_errors" in errors.columns

    emitted = engine.emit(valid, "qwen")
    assert emitted.count() == valid.count()


def test_emit_rewrites_raw_xml_messages(engine):
    # the emitter path (reference convert_trace_to_specific_tool_call_style)
    # runs on records whose assistant content still embeds <tool_use> XML
    from tests import fixtures_xml as FX

    df = engine.spark.createDataFrame(
        [
            (
                [
                    {"role": "user", "content": "go"},
                    {"role": "assistant", "content": FX.TOOL_USE_SIMPLE},
                ],
            )
        ],
        "messages array<struct<role string, content string>>",
    )
    out = engine.emit(df, "qwen")
    contents = out.select(F.col("messages.content")).first()[0]
    assert "<tool_call>" in contents[1] and "<tool_use>" not in contents[1]
    assert contents[0] == "go"  # non-assistant untouched


def test_ledger_filter(engine, spans_path, tmp_path):
    spans = engine.read_spans(spans_path)
    led = str(tmp_path / "ledger")
    first = engine.ledger_filter(spans, led, key="trace_id")
    assert first.count() == spans.count()

    from nexgap_spark.sources.ledger import mark_processed

    mark_processed(spans, led, "trace_id")
    second = engine.ledger_filter(spans, led, key="trace_id")
    assert second.count() == 0


def test_dedup_corpus_keeps_canonicals(engine):
    docs = load_table(engine.spark, SF_SMOKE, "documents")
    kept = engine.dedup_corpus(docs)
    assert 0 < kept.count() <= docs.count()
    assert set(kept.columns) == set(docs.columns)
    # deduping the deduped corpus is a fixpoint
    again = engine.dedup_corpus(kept)
    assert again.count() == kept.count()


def test_run_query_catalog(engine):
    out = engine.run_query("q01_pricing_summary", SF_SMOKE)
    assert out.count() > 0


def test_synthesize_round_loop(engine):
    from tests.fixtures_tree import TREE

    out = engine.synthesize(TREE, rounds=2, batch=6, framework="medical", seed=7)
    rows = out.collect()
    # exactly one kept variant per draw per round
    assert len(rows) == 12
    assert {r.difficulty for r in rows} <= {"easy", "medium", "hard"}
    assert {r.round for r in rows} == {0, 1}
    assert all(r.query for r in rows)
    # deterministic for a fixed seed
    again = engine.synthesize(TREE, rounds=2, batch=6, framework="medical", seed=7)
    key = lambda r: (r.round, r.path_id, r.difficulty, r.query)
    assert sorted(map(key, rows)) == sorted(map(key, again.collect()))


def test_framework_dispatch(engine, spans_path):
    # registered framework wins; unknown falls back to the wire-format
    # default — the reference's exists()/else converter pick
    from nexgap_spark.operators.dispatch import (
        ConverterStrategy,
        register_framework,
        resolve_converter,
    )

    assert resolve_converter("nexau").validator_mode == "nexau"
    assert resolve_converter("nexa4a").validator_mode == "a4a"
    assert resolve_converter("unknown-fw").validator_mode == "nexau"
    assert resolve_converter("unknown-fw", use_openai_format=True).validator_mode == "a4a"

    register_framework("custom", ConverterStrategy(name="custom", validator_mode="a4a"))
    assert resolve_converter("custom").name == "custom"

    spans = engine.read_spans(spans_path)
    records, mode = engine.convert_framework(
        spans, "nexa4a", config_agents=CONFIG_AGENTS
    )
    assert mode == "a4a"
    assert records.count() == engine.convert(spans, config_agents=CONFIG_AGENTS).count()


def test_engine_side_channels(engine, tmp_path):
    import base64

    urls = engine.spark.createDataFrame(
        [("data:text/plain;base64," + base64.b64encode(b"hi").decode(),)],
        "url string",
    )
    status = engine.download(urls, str(tmp_path)).collect()
    assert status[0].status == "downloaded"

    from nexgap_spark.external.websearch import canned_transport

    q = engine.spark.createDataFrame([("x",)], "search_query string")
    hits = engine.web_search(
        q, canned_transport({"x": {"organic": [{"title": "t", "link": "u"}]}})
    )
    assert hits.count() == 1

    work = engine.spark.createDataFrame(
        [(1, "ok"), (2, "")], "id long, query string"
    )
    kept, rejected = engine.guard_queries(work)
    assert kept.count() == 1 and rejected.first().stop == "empty_query"

    s = engine.summary(
        engine.spark.createDataFrame([(1, "success"), (2, "failed")], "id long, status string")
    ).first()
    assert s.n_total == 2 and s.success_rate == 0.5


def test_engine_agent_facades(spark):
    from nexgap_spark.engine import Engine

    eng = Engine(spark)
    df = spark.createDataFrame(
        [("q1", '{"fuzzy_query": "soft"}'), ("q2", "junk")],
        "query string, response string",
    )
    parsed, fails = eng.fuzzify(df)
    assert {r.query: r.applied for r in parsed.collect()} == {"q1": True, "q2": False}
    assert fails.count() == 1

    from nexgap_spark.external.urlcheck import hash_transport

    urls = spark.createDataFrame([("https://u0.org",)], "url string")
    assert eng.validate_urls(urls, hash_transport).count() == 1

    from nexgap_spark.external.urlcheck import MockUrlPipelineClient

    queries = spark.createDataFrame([("nothing to do",)], "query string")
    out = eng.process_urls(
        queries, client_factory=MockUrlPipelineClient, transport_factory=hash_transport
    ).collect()[0]
    assert out.n_extracted == 0 and out.processed_query == "nothing to do"
