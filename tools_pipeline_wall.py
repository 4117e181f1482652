#!/usr/bin/env python
"""Composed-pipeline memory wall (VERDICT r15 item 5): q118's composed
plan vs the staged (write-every-boundary) orchestration at x100 documents
under CONSTRAINED driver heaps.

PIPELINE_r15 priced the economics at x10 on an unconstrained heap:
composed+materialize = staged wall at one-job cost. The open question was
the memory side — staged orchestration NATURALLY bounds memory (every
boundary is a parquet write; nothing accumulates), while the composed
plan holds its materialize() checkpoint blocks and shuffle state inside
one job. This harness shows the composed plan's boundaries SPILL, not
OOM, when the heap can't hold them: one subprocess per ceiling (driver
memory is a JVM-launch conf), each running BOTH variants once and
recording wall, stage-level spill counters, peak JVM heap, and the
result hash; the parent asserts every cell's hash matches the
unconstrained reference.

Usage:  python tools_pipeline_wall.py     # ceilings 24g,4g,2g at x100
Env:    PIPEWALL_CEILINGS=24g,4g,2g  PIPEWALL_MULT=100
        PIPEWALL_TIMEOUT=2400 (per child, seconds)
Writes PIPELINE_r16.json and prints one PIPEWALL_JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

BUILD = r'''
import os
from nexgap_spark.session import get_spark
from scale_bench import build_pipeline_docs_dir

mult = int(os.environ["PIPEWALL_MULT"])
path = os.environ["PIPEWALL_DOCS_DIR"]
spark = get_spark("pipewall_build")
if not os.path.exists(f"{path}/documents.parquet/_SUCCESS"):
    build_pipeline_docs_dir(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        mult, path,
    )
print("BUILD_OK", spark.read.parquet(f"{path}/documents.parquet").count())
'''

CHILD = r'''
import hashlib, json, os, shutil, sys, tempfile, threading, time

from nexgap_spark.session import get_spark, wide_table
from nexgap_spark.plans.curation import corpus_pipeline

dp = os.environ["PIPEWALL_DOCS_DIR"]
spark = get_spark("pipewall", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

jvm = spark._jvm
rt = jvm.java.lang.Runtime.getRuntime()
peak = {"used": 0}
stop = threading.Event()

def sample():
    while not stop.is_set():
        used = rt.totalMemory() - rt.freeMemory()
        if used > peak["used"]:
            peak["used"] = used
        time.sleep(0.2)

threading.Thread(target=sample, daemon=True).start()

def spill_totals():
    store = spark.sparkContext._jsc.sc().statusStore()
    seq = store.stageList(
        jvm.java.util.ArrayList(),
        getattr(store, "stageList$default$2")(),
        getattr(store, "stageList$default$3")(),
        getattr(store, "stageList$default$4")(),
        getattr(store, "stageList$default$5")(),
    )
    mem = disk = 0
    for i in range(seq.size()):
        s = seq.apply(i)
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
    return mem, disk

def run(variant):
    work = tempfile.mkdtemp(prefix="pipewall_staged_")
    stage_out = None
    if variant == "staged":
        def stage_out(df, name):
            p = f"{work}/{name}"
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p)
    m0, d0 = spill_totals()
    peak["used"] = 0
    t0 = time.time()
    try:
        rows = corpus_pipeline(
            wide_table(spark, dp, "documents"), stage_out=stage_out
        ).collect()
        wall = round(time.time() - t0, 2)
        m1, d1 = spill_totals()
        return {
            "sec": wall,
            "rows": len(rows),
            "hash": hashlib.md5(repr(sorted(tuple(r) for r in rows)).encode()).hexdigest(),
            "mem_spill_mb": round((m1 - m0) / 1e6, 1),
            "disk_spill_mb": round((d1 - d0) / 1e6, 1),
            "peak_heap_gb": round(peak["used"] / 1e9, 2),
        }
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"[:400]}
    finally:
        shutil.rmtree(work, ignore_errors=True)

rt_max = round(rt.maxMemory() / 1e9, 2)
out = {"max_heap_gb": rt_max, "composed": run("composed"), "staged": run("staged")}
print("PIPEWALL_JSON:" + json.dumps(out), flush=True)
'''


def main() -> int:
    ceilings = os.environ.get("PIPEWALL_CEILINGS", "24g,4g,2g").split(",")
    mult = os.environ.get("PIPEWALL_MULT", "100")
    docs_dir = f"/tmp/nexgap_pipeline_docs_x{mult}"
    base_env = dict(
        os.environ, PYTHONPATH=REPO, PIPEWALL_MULT=mult, PIPEWALL_DOCS_DIR=docs_dir
    )
    r = subprocess.run(
        [sys.executable, "-c", BUILD], env=base_env, capture_output=True,
        text=True, timeout=1800, cwd=REPO,
    )
    build_line = next(
        (ln for ln in r.stdout.splitlines() if ln.startswith("BUILD_OK")), None
    )
    if r.returncode != 0 or build_line is None:
        print("[pipewall] corpus build failed:", r.stderr[-1000:], file=sys.stderr)
        return 1
    n_docs = int(build_line.split()[1])
    print(f"[pipewall] corpus ready: {n_docs} docs at {docs_dir}", file=sys.stderr)

    results: dict[str, dict] = {}
    for ceil in ceilings:
        env = dict(base_env, SPARK_GRAFT_DRIVER_MEM=ceil)
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD], env=env, capture_output=True,
                text=True, cwd=REPO,
                timeout=float(os.environ.get("PIPEWALL_TIMEOUT", "2400")),
            )
        except subprocess.TimeoutExpired:
            results[ceil] = {"error": "timeout"}
            print(f"[pipewall] {ceil}: TIMEOUT", file=sys.stderr)
            continue
        line = next(
            (ln for ln in r.stdout.splitlines() if ln.startswith("PIPEWALL_JSON:")),
            None,
        )
        if r.returncode != 0 or line is None:
            results[ceil] = {
                "error": (r.stderr[-1500:] or r.stdout[-1500:]) or "no output"
            }
            print(f"[pipewall] {ceil}: FAILED", file=sys.stderr)
            continue
        results[ceil] = json.loads(line[len("PIPEWALL_JSON:"):])
        print(f"[pipewall] {ceil}: ok", file=sys.stderr)

    # every cell (both variants, every ceiling) must hash-match the
    # unconstrained composed reference — spill-not-OOM with green results
    ref = results.get(ceilings[0], {}).get("composed", {}).get("hash")
    green = ref is not None
    for ceil, rec in results.items():
        for variant in ("composed", "staged"):
            if rec.get(variant, {}).get("hash") != ref:
                green = False
    verdict = {
        "mult": int(mult),
        "docs_rows": n_docs,
        "ceilings": results,
        "hashes_green": green,
    }
    with open(os.path.join(REPO, "PIPELINE_r16.json"), "w") as f:
        json.dump(verdict, f, indent=1)
    print("PIPEWALL_JSON:" + json.dumps(
        {
            "hashes_green": green,
            "cells": {
                c: {
                    v: {
                        k: rec.get(v, {}).get(k)
                        for k in ("sec", "disk_spill_mb", "peak_heap_gb", "error")
                        if rec.get(v, {}).get(k) is not None
                    }
                    for v in ("composed", "staged")
                }
                for c, rec in results.items()
            },
        }
    ))
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main())
