"""Reference-orchestration-on-stubs: the missing e2e comparison cell.

VERDICT r12 item 5: e2e_bench.py measures THIS engine's orchestration
throughput on zero-latency deterministic LLM stubs; the reference's
published 10-60 queries/min includes real LLM latency, so the one missing
apples-to-apples cell is the reference's OWN orchestration
(Gyrfalcon/core/pipeline.py multiprocessing Pool path) run on the same
stub pattern. This harness runs it: N tasks at 1/4/8 workers with a
deterministic in-process LLMClient stub (the reference's own
debug/mock-injection seam — query_generator.LLMClient is the single LLM
construction point, reference core/pipeline.py:217), measuring pure
orchestration: per-task framework-config + taxonomy-tree reload, weighted
path sampling, the agent workflow, parse, JSONL append, sampling-stats
persistence.

The reference tree is copied to /tmp first because its pipeline WRITES
into its own source tree (sampling stats + new-tag persistence under
frameworks/, output/ under cwd) and /root/reference is read-only.

Stub contract (dispatch on the reference's own prompt markers):
  * persona suitability  -> "SUITABLE"
  * persona rewriting    -> short deterministic persona text
  * query synthesis      -> the **EASY:**/**MEDIUM:**/**HARD:** 3-variant
    shape its parser expects (query_generator.py:629-654), content derived
    from a hash of the prompt — same zero-latency deterministic-response
    pattern as e2e_bench.py's hash_transport stubs.

Usage: python ref_e2e_bench.py     (env: REF_E2E_N default 1000,
REF_E2E_WORKERS default "1,4,8", REF_E2E_FRAMEWORK default
menu_margin_pricing_system). Emits one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import time

REF_SRC = "/root/reference/Gyrfalcon"
RUN_DIR = "/tmp/gyr_stub_run"
N = int(os.environ.get("REF_E2E_N", "1000"))
WORKERS = [int(w) for w in os.environ.get("REF_E2E_WORKERS", "1,4,8").split(",")]
FRAMEWORK = os.environ.get("REF_E2E_FRAMEWORK", "menu_margin_pricing_system")


class StubLLMClient:
    """Drop-in for query_generator.LLMClient: same constructor surface,
    deterministic zero-latency completions keyed off the reference's own
    prompt markers."""

    def __init__(self, *args, **kwargs):  # accepts LLM_CONFIG verbatim
        pass

    def generate_completion(self, prompt: str, system_prompt=None) -> str:
        h = hashlib.md5(prompt.encode("utf-8", "ignore")).hexdigest()
        if "NOT_SUITABLE" in prompt or "不合适" in prompt:
            return "SUITABLE"
        if "Rewritten persona:" in prompt or "重写后的角色" in prompt:
            return f"A practitioner (variant {h[:8]}) who routinely asks about this problem type."
        # default: the 3-variant synthesis shape the reference parser expects
        return (
            f"**EASY:** How do I get started with task {h[:8]} given my constraints?\n\n"
            f"**MEDIUM:** Walk me through diagnosing scenario {h[8:16]} step by step, "
            f"including which data I need and how to interpret intermediate results.\n\n"
            f"**HARD:** Design a complete plan for {h[16:24]} under conflicting requirements, "
            f"justify each trade-off, quantify the expected impact, and describe how you "
            f"would validate the outcome end to end.\n"
        )


def _fresh_copy() -> None:
    if os.path.exists(RUN_DIR):
        shutil.rmtree(RUN_DIR)
    shutil.copytree(REF_SRC, os.path.join(RUN_DIR, "Gyrfalcon"))


def _reset_state(base: str) -> None:
    """Reset the MUTABLE state (frameworks/ sampling stats + trees, output
    dirs) between worker settings so each cell starts from identical state
    — without this, the w=8 run reloads sampling stats accumulated by the
    w=1/w=4 runs and the scaling comparison is not apples-to-apples (r13
    review). Code modules stay loaded; only data files are re-copied."""
    fw = os.path.join(base, "frameworks")
    shutil.rmtree(fw)
    shutil.copytree(os.path.join(REF_SRC, "frameworks"), fw)
    for d in os.listdir(base):
        if d.startswith("output"):
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _fake_module(name: str, **attrs):
    """Satisfy the reference's module-level imports for SDKs this container
    doesn't ship (openai, …). The stub client replaces every use, so the
    fake only needs the attribute surface touched at import time."""
    import types

    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)


def main() -> None:
    _fresh_copy()
    base = os.path.join(RUN_DIR, "Gyrfalcon")
    sys.path.insert(0, base)
    os.chdir(base)

    class _NeverConstructed:
        def __init__(self, *a, **k):
            raise RuntimeError("stub harness must not construct a real client")

    _fake_module("openai", OpenAI=_NeverConstructed)

    import core.pipeline as pl  # noqa: E402  (reference package, from the /tmp copy)
    import llm_interface.query_generator as qg  # noqa: E402

    # single patch point: both modules' LLMClient name (workers construct
    # via the pipeline module global; fork inherits the patch)
    pl.LLMClient = StubLLMClient
    qg.LLMClient = StubLLMClient

    results: dict[str, dict] = {}
    for w in WORKERS:
        _reset_state(base)
        cfg = pl.PipelineRunConfig(
            framework_name=FRAMEWORK,
            num_queries=N,
            num_workers=w,
            language="english",
            export_format="jsonl",
            output_dir=os.path.join(base, f"output_w{w}"),
            generate_visualization=False,
            web_search_probability=0.0,
            problem_type_expand_probability=0.0,
            fuzzify_probability=0.0,
            enable_file_analysis=False,
            enable_url_processing=False,
        )
        pipe = pl.GyrfalconPipeline(base)
        t0 = time.perf_counter()
        out = pipe.run_pipeline(cfg)
        dt = time.perf_counter() - t0
        qpm = out.total_queries_generated / dt * 60.0
        results[str(w)] = {
            "sec": round(dt, 2),
            "tasks": N,
            "queries_generated": out.total_queries_generated,
            "queries_per_min": round(qpm, 1),
            "errors": len(out.errors),
        }
        print(f"[ref_e2e] workers={w}: {dt:.1f}s, "
              f"{out.total_queries_generated} queries, {qpm:.0f} q/min",
              file=sys.stderr)
    print(json.dumps({
        "metric": "reference orchestration on stubs (queries/min)",
        "n_tasks": N,
        "framework": FRAMEWORK,
        "workers": results,
    }))


if __name__ == "__main__":
    main()
