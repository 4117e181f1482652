"""End-to-end pipeline throughput vs the reference's published numbers.

The ONE comparison BASELINE.md actually publishes is pipeline
throughput: query-synthesis at ~10 queries/min serial scaling to ~60/min
at 8 workers — its maximum published parallel point — and ~2-3 h wall
for 1000 queries end-to-end (reference docs/gyrfalcon.md:198-201,
docs/workflow.md:224-227, docs/workflow.md:424-430).

Those reference numbers include real LLM latency. The engine comparison
VERDICT r11 item 2 prescribes runs both designs' ORCHESTRATION on the
same deterministic stubs (the mock client/transport pattern the
reference's own tests use), so the measured quantity here is engine
orchestration throughput: what bounds the pipeline once LLM capacity is
no longer the limiter (batch APIs, many endpoints, self-hosted fleets) —
and the axis on which the reference's multiprocessing pool tops out at
8 workers while a Spark plan keeps scaling by partition count.

Stages measured (each a real catalog operator family, not a toy):
  synthesis   X2-X9: suitability -> rewrite -> synthesis parse -> URL
              extract/validate/repair -> file requirement/plan/augment ->
              fuzzify, one Arrow stage (external/workflow.py)
  convert     J1-J4/F3-F10: span forest -> chat-completion records
              (operators/converter.py)
  validate    V1-V6: XML validator battery (functions/validators.py)
  execute     X11: real subprocess per query (external/execution.py)
  e2e         synthesis -> ok-filter -> execute (the q109 pipeline)

Usage: python e2e_bench.py       (env: E2E_BENCH_N, default 10_000)
Emits one JSON line with per-stage sec + queries/min.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

from nexgap_spark.session import get_spark

N = int(os.environ.get("E2E_BENCH_N", "10000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from nexgap_spark.external.execution import run_agent_queries
    from nexgap_spark.external.urlcheck import MockUrlPipelineClient, hash_transport
    from nexgap_spark.external.workflow import run_synthesis_workflow
    from nexgap_spark.operators.converter import convert_spans
    from nexgap_spark.plans.agents import _wf_mock_cols
    from nexgap_spark.plans.document_pipeline import CONFIG_AGENTS, _synth_spans
    from nexgap_spark.plans.document_pipeline import _content_col

    spark = get_spark("nexgap_e2e_bench")
    par = spark.sparkContext.defaultParallelism
    # warm the python workers once so the first stage doesn't pay imports
    spark.range(32 * 1024).repartition(par).mapInPandas(
        lambda it: it, "id long"
    ).count()

    out: dict = {"n": N, "cpus": par, "sf_dir": SF_DIR}

    def stage(name: str, fn, n_items: int) -> None:
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        out[name] = {
            "sec": round(dt, 2),
            "items": n_items,
            "rows_out": rows,
            "per_min": round(n_items / dt * 60),
        }
        print(
            f"[e2e_bench] {name}: {n_items} items in {dt:.2f}s = "
            f"{out[name]['per_min']}/min ({rows} rows out)",
            file=sys.stderr,
        )

    # ---- synthesis workflow over N mocked task rows -----------------------
    # spark.range(N), not the documents table: the task count must be N
    # regardless of corpus size (the mock columns are pure doc_id functions)
    docs = _wf_mock_cols(spark.range(N).toDF("doc_id")).drop("doc_id")
    docs = docs.repartition(par).localCheckpoint()  # inputs OUTSIDE the timer

    def run_synth():
        return run_synthesis_workflow(
            docs, client_factory=MockUrlPipelineClient,
            transport_factory=hash_transport,
        ).count()

    stage("synthesis", run_synth, N)

    # ---- converter over an N-trace span forest ----------------------------
    spans = _synth_spans(spark, SF_DIR)
    n_traces = spans.select("trace_id").distinct().count()
    spans = spans.localCheckpoint()

    def run_convert():
        return convert_spans(spans, config_agents=CONFIG_AGENTS).count()

    stage("convert", run_convert, n_traces)

    # ---- validator battery over the documents corpus ----------------------
    from pyspark.sql import types as T

    from nexgap_spark.functions.validators import validate_message

    @F.pandas_udf(T.BooleanType())
    def valid_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda c: validate_message(c)[0])

    dt = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    val_in = dt.select(
        "doc_id", _content_col(malformed_every=7).alias("content")
    ).repartition(par).localCheckpoint()
    n_docs = val_in.count()

    def run_validate():
        return val_in.select(valid_udf("content").alias("v")).filter("v").count()

    stage("validate", run_validate, n_docs)

    # ---- agent execution: real fork/exec per query ------------------------
    n_exec = min(N, 2000)  # each row is a real subprocess
    tasks = (
        spark.range(n_exec)
        .select(
            F.format_string("task-%s", "id").alias("query"),
            F.lit("fw").alias("framework"),
        )
        .repartition(par)
        .localCheckpoint()
    )

    def builder(q: str, f: str) -> list[str]:
        i = int(q.removeprefix("task-"))
        # int(), not the bool: 'exit True' is an /bin/sh 'Illegal number'
        return [
            "/bin/sh", "-c",
            f"echo 'LangfuseTraceID: t-{i}'; exit {int(i % 3 == 0)}",
        ]

    def run_exec():
        return run_agent_queries(tasks, command_builder=builder, timeout_s=60).count()

    stage("execute", run_exec, n_exec)

    # ---- e2e: synthesis -> ok filter -> execute (q109 shape) --------------
    def ebuilder(q: str, f: str) -> list[str]:
        h = hashlib.md5(q.encode()).hexdigest()
        code = 0 if h[0] in "01234567" else 1
        return ["/bin/sh", "-c", f"echo 'LangfuseTraceID: t-{h[:6]}'; exit {code}"]

    def run_e2e():
        wf = run_synthesis_workflow(
            docs, client_factory=MockUrlPipelineClient,
            transport_factory=hash_transport,
        )
        ok = (
            wf.filter(F.col("status") == "ok")
            .select(
                F.col("final_query").alias("query"),
                F.col("difficulty").alias("framework"),
            )
            .repartition(par)
        )
        return run_agent_queries(ok, command_builder=ebuilder, timeout_s=60).count()

    stage("e2e_generate_execute", run_e2e, N)

    out["baseline"] = {
        "reference_synthesis_per_min_serial": 10,
        "reference_synthesis_per_min_8_workers": 60,
        "reference_e2e_1000_queries_hours": "2-3 (with real LLM+agent latency)",
        "note": (
            "reference numbers include real LLM latency; this bench runs "
            "both designs' orchestration on deterministic stubs (the "
            "reference's own mock pattern) - see SCALE.md round-12"
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
