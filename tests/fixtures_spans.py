"""Deterministic span-tree fixture (FIXTURES.md §1 shape): a small forest of
Langfuse-style spans with generation spans, sub-agent parents, tool calls in
assistant output, tool results in input, and a meta span to exclude."""

from __future__ import annotations

from tests import fixtures_xml as FX

SYSTEM_PROMPT = """You are a helpful agent.
<TOOL_DEFINITIONS_START>
tool docs here
<TOOL_DEFINITIONS_END>
Stay concise."""


def build_spans() -> list[dict]:
    mk = lambda i: f"span_{i:04d}"  # noqa: E731
    t = lambda m: f"2025-01-01T00:{m:02d}:00"  # noqa: E731
    spans = [
        # trace A: root agent span → generation child (kept, last) + an
        # earlier generation sibling (dropped by A1)
        {
            "trace_id": "trace_a",
            "span_id": mk(1),
            "span_type": "SPAN",
            "span_name": "planner",
            "model": None,
            "input": [],
            "output": [],
            "startTime": t(0),
            "endTime": t(9),
            "usage": {},
            "metadata": {},
            "parentObservationId": None,
            "level": 0,
        },
        {
            "trace_id": "trace_a",
            "span_id": mk(2),
            "span_type": "GENERATION",
            "span_name": "OpenAI-generation",
            "model": "gpt-x",
            "input": [
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": "find stuff"},
            ],
            "output": [{"role": "assistant", "content": "early draft"}],
            "startTime": t(1),
            "endTime": t(2),
            "usage": {"total": 10},
            "metadata": {},
            "parentObservationId": mk(1),
            "level": 0,
        },
        {
            "trace_id": "trace_a",
            "span_id": mk(3),
            "span_type": "GENERATION",
            "span_name": "OpenAI-generation",
            "model": "gpt-x",
            "input": [
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": "find stuff"},
                {"role": "assistant", "content": FX.TOOL_USE_SIMPLE},
                {"role": "user", "content": FX.TOOL_RESULT_MESSAGE},
            ],
            "output": [{"role": "assistant", "content": FX.SUB_AGENT}],
            "startTime": t(3),
            "endTime": t(4),
            "usage": {"total": 20},
            "metadata": {},
            "parentObservationId": mk(1),
            "level": 0,
        },
        # trace B: Sub-agent parent chain → generation; parent name carries
        # the "Sub-agent: " prefix (J3 strip behavior)
        {
            "trace_id": "trace_b",
            "span_id": mk(10),
            "span_type": "SPAN",
            "span_name": "Sub-agent: researcher",
            "model": None,
            "input": [],
            "output": [],
            "startTime": t(0),
            "endTime": t(9),
            "usage": {},
            "metadata": {},
            "parentObservationId": None,
            "level": 0,
        },
        {
            "trace_id": "trace_b",
            "span_id": mk(11),
            "span_type": "GENERATION",
            "span_name": "OpenAI-generation",
            "model": "gpt-x",
            "input": [{"role": "user", "content": "dig deeper"}],
            "output": [{"role": "assistant", "content": "found it"}],
            "startTime": t(5),
            "endTime": t(6),
            "usage": {},
            "metadata": {},
            "parentObservationId": mk(10),
            "level": 0,
        },
        # trace C: meta parent → generation excluded by P3
        {
            "trace_id": "trace_c",
            "span_id": mk(20),
            "span_type": "SPAN",
            "span_name": "meta",
            "model": None,
            "input": [],
            "output": [],
            "startTime": t(0),
            "endTime": t(9),
            "usage": {},
            "metadata": {},
            "parentObservationId": None,
            "level": 0,
        },
        {
            "trace_id": "trace_c",
            "span_id": mk(21),
            "span_type": "GENERATION",
            "span_name": "OpenAI-generation",
            "model": "gpt-x",
            "input": [{"role": "user", "content": "meta work"}],
            "output": [{"role": "assistant", "content": "meta out"}],
            "startTime": t(5),
            "endTime": t(6),
            "usage": {},
            "metadata": {},
            "parentObservationId": mk(20),
            "level": 0,
        },
        # orphan generation with null startTime (A1 epoch-floor path), no parent
        {
            "trace_id": "trace_d",
            "span_id": mk(30),
            "span_type": "GENERATION",
            "span_name": "OpenAI-generation",
            "model": "gpt-x",
            "input": [{"role": "user", "content": "hello"}],
            "output": {"role": "assistant", "content": "hi"},  # dict-typed output
            "startTime": None,
            "endTime": None,
            "usage": {},
            "metadata": {},
            "parentObservationId": None,
            "level": 0,
        },
        # non-generation EVENT span, filtered by P2
        {
            "trace_id": "trace_d",
            "span_id": mk(31),
            "span_type": "EVENT",
            "span_name": "log",
            "model": None,
            "input": [{"role": "user", "content": "x"}],
            "output": [],
            "startTime": t(7),
            "endTime": t(7),
            "usage": {},
            "metadata": {},
            "parentObservationId": None,
            "level": 0,
        },
    ]
    return spans


CONFIG_AGENTS = ["planner", "researcher", "meta"]
