"""X11 agent-execution subprocess harness (external/execution.py) vs the
reference state machine (run_end_to_end.py:186-312)."""

from __future__ import annotations

from nexgap_spark.external.execution import (
    nexgap_command,
    run_agent_process,
    run_agent_queries,
)


def _sh(script: str):
    return lambda q, f: ["/bin/sh", "-c", script]


def test_success_and_trace_extraction():
    rec = run_agent_process(
        "q", "fw",
        command_builder=_sh("echo 'LangfuseTraceID: abc-123'; echo more"),
        timeout_s=10,
    )
    assert rec["success"] is True
    assert rec["returncode"] == 0
    assert rec["trace_id"] == "abc-123"
    assert rec["error"] is None
    assert "more" in rec["log_tail"]


def test_nonzero_exit_is_reference_error_string():
    rec = run_agent_process(
        "q", "fw", command_builder=_sh("echo nope; exit 3"), timeout_s=10
    )
    assert rec["success"] is False
    assert rec["returncode"] == 3
    assert rec["error"] == "Process exited with code 3"
    assert rec["trace_id"] is None  # extraction only on success (:252-283)


def test_trace_not_extracted_on_failure():
    rec = run_agent_process(
        "q", "fw",
        command_builder=_sh("echo 'LangfuseTraceID: zzz-9'; exit 1"),
        timeout_s=10,
    )
    assert rec["trace_id"] is None
    assert "zzz-9" in rec["log_tail"]  # but the log still carries it


def test_timeout_kills_and_reports():
    import time

    t0 = time.time()
    rec = run_agent_process(
        "q", "fw", command_builder=_sh("sleep 30"), timeout_s=1
    )
    assert time.time() - t0 < 10  # killed, not waited out
    assert rec["success"] is False
    assert rec["error"] == "Timeout after 1 seconds"
    assert rec["returncode"] is None


def test_spawn_failure_is_per_task_error():
    rec = run_agent_process(
        "q", "fw",
        command_builder=lambda q, f: ["/nonexistent/binary-xyz"],
        timeout_s=5,
    )
    assert rec["success"] is False
    assert rec["error"]  # FileNotFoundError message, task-isolated


def test_reference_command_shape():
    # run_end_to_end.py:210-221 verbatim
    assert nexgap_command("hello", "deer-flow") == [
        "uv", "run", "agent4agent.py", "use",
        "--agent", "deer-flow", "--query", "hello", "--single-turn",
    ]


def test_batch_operator(spark):
    tasks = spark.createDataFrame(
        [(f"task-{i}", "fw-a" if i % 2 == 0 else "fw-b") for i in range(12)],
        "query string, framework string",
    )

    def builder(q, f):
        i = int(q.removeprefix("task-"))
        code = 1 if i % 3 == 0 else 0
        return ["/bin/sh", "-c", f"echo 'LangfuseTraceID: t-{i}'; exit {code}"]

    rows = {r.query: r for r in run_agent_queries(
        tasks, command_builder=builder, timeout_s=30
    ).collect()}
    assert len(rows) == 12
    assert rows["task-1"].success and rows["task-1"].trace_id == "t-1"
    assert not rows["task-3"].success
    assert rows["task-3"].error == "Process exited with code 1"
    assert rows["task-3"].trace_id is None
