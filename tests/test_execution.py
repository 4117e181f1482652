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


def test_workflow_runs_over_a_stream(spark, tmp_path):
    # the composed synthesis workflow is one row-local Arrow stage, so it
    # runs unchanged over a streaming source — the continuous-ingestion
    # production shape (tasks arrive, records flow out)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nexgap_spark.external.urlcheck import MockUrlPipelineClient, hash_transport
    from nexgap_spark.external.workflow import run_synthesis_workflow
    from nexgap_spark.streaming.pipeline import run_batch_to_memory

    d = tmp_path / "tasks"
    d.mkdir()
    for part in range(2):
        rows = pd.DataFrame(
            {
                "persona": [f"P-{part}-{i}" for i in range(3)],
                "suit_response": ["SUITABLE", "NOT_SUITABLE", "SUITABLE"],
                "rewrite_response": ["A person R"] * 3,
                "synth_response": [
                    "**Easy:** E1\n**Medium:** M1\n**Hard:** H1",
                    "no variants",
                    "**Easy:** E2\n**Medium:** M2\n**Hard:** H2",
                ],
                "req_response": ['{"requires_files": false}'] * 3,
                "aug_response": [""] * 3,
                "fuzz_response": ['{"analysis": "a", "fuzzy_query": "fq"}'] * 3,
            }
        )
        pq.write_table(pa.Table.from_pandas(rows, preserve_index=False),
                       str(d / f"{part}.parquet"))

    stream = spark.readStream.schema(
        "persona string, suit_response string, rewrite_response string, "
        "synth_response string, req_response string, aug_response string, "
        "fuzz_response string"
    ).parquet(str(d))
    out = run_synthesis_workflow(
        stream, client_factory=MockUrlPipelineClient, transport_factory=hash_transport
    )
    q = run_batch_to_memory(out, "wf_stream")
    try:
        rows = spark.sql("select * from wf_stream").collect()
    finally:
        q.stop()
    # per file: 2 ok personas × 3 variants + 1 synthesis_failed = 7; ×2 files
    assert len(rows) == 14
    assert sum(1 for r in rows if r.status == "synthesis_failed") == 2
    assert all(r.final_query == "fq" for r in rows if r.status == "ok")


def test_timeout_keeps_partial_log_and_kills_group():
    import subprocess
    import time

    # child spawns a grandchild that would outlive a naive .kill(); the
    # group-kill must reap both, and the pre-timeout output must survive
    # into log_tail
    # a unique sleep duration so pgrep can't match unrelated processes
    script = "echo 'before hang'; sleep 31.7354 & wait"
    t0 = time.time()
    rec = run_agent_process(
        "q", "fw", command_builder=_sh(script), timeout_s=1
    )
    assert time.time() - t0 < 10
    assert rec["error"] == "Timeout after 1 seconds"
    assert rec["log_tail"] and "before hang" in rec["log_tail"]
    # no straggler grandchild from this test's group remains
    out = subprocess.run(
        ["pgrep", "-f", "sleep 31.7354"], capture_output=True, text=True
    )
    assert out.stdout.strip() == ""


def test_batch_operator_custom_column_names(spark):
    tasks = spark.createDataFrame(
        [("t-0", "fw-x"), ("t-1", "fw-y")], "my_q string, my_fw string"
    )
    rows = run_agent_queries(
        tasks,
        query_col="my_q",
        framework_col="my_fw",
        command_builder=_sh("echo ok"),
        timeout_s=30,
    ).collect()
    assert {r.query for r in rows} == {"t-0", "t-1"}
    assert {r.framework for r in rows} == {"fw-x", "fw-y"}
    assert all(r.success for r in rows)


def test_fused_validate_repair_skips_falsy_urls(spark):
    from nexgap_spark.external.urlcheck import (
        MockRepairClient,
        hash_transport,
        validate_and_repair_urls,
    )

    urls = spark.createDataFrame(
        [(None,), ("",), ("https://host1.example.org/p",)], "url string"
    )
    out = validate_and_repair_urls(
        urls, client_factory=MockRepairClient, transport_factory=hash_transport
    ).collect()
    # the falsy rows emit nothing (validate_urls' reference guard); only
    # the real URL can produce a change row
    assert all(r.original_url == "https://host1.example.org/p" for r in out)


def test_workflow_rejects_output_name_collision(spark):
    import pytest

    from nexgap_spark.external.urlcheck import MockUrlPipelineClient, hash_transport
    from nexgap_spark.external.workflow import run_synthesis_workflow

    df = spark.createDataFrame(
        [("p", "SUITABLE", "r", "**Easy:** E", "{}", "", "{}", "clash")],
        "persona string, suit_response string, rewrite_response string, "
        "synth_response string, req_response string, aug_response string, "
        "fuzz_response string, status string",
    )
    with pytest.raises(ValueError, match="collide"):
        run_synthesis_workflow(
            df, client_factory=MockUrlPipelineClient, transport_factory=hash_transport
        )
