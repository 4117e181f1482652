#!/usr/bin/env python
"""Composed-pipeline memory wall (VERDICT r15 item 5): q118's composed
plan vs the staged (write-every-boundary) orchestration at x100 documents
under CONSTRAINED driver heaps.

PIPELINE_r15 priced the economics at x10 on an unconstrained heap:
composed+materialize = staged wall at one-job cost. The open question was
the memory side. The first r16 sweep answered it with a NEGATIVE the
harness now records on purpose: under the default localCheckpoint
materialize(), BOTH variants die at 4g/2g — the checkpoint blocks live in
the block manager, and under heap pressure eviction turns into
TaskResultLost / OOM / a dead JVM (the staged variant dies too: the
connected-components loop inside near-dup materializes every iteration).
That is the same failure class CLUSTER.json pinned for executor loss, and
the same one-line deployment flag fixes it: a RELIABLE checkpoint dir
(session.materialize upgrades to disk-backed checkpoint(eager=True)).
The harness therefore measures each constrained ceiling in BOTH modes —
localCheckpoint as the controlled negative, reliable as the deployment
answer — and gates every reliable/unconstrained cell's result hash
against the unconstrained composed reference.

Each (ceiling, variant, mode) runs in its OWN subprocess: driver memory
is a JVM-launch conf, and a dying JVM must not poison the sibling
variant's measurement (the first sweep's 2g staged row was a
ConnectionRefusedError from composed's corpse).

Usage:  python tools_pipeline_wall.py
Env:    PIPEWALL_CELLS=24g:local,4g:local,2g:local,4g:reliable,2g:reliable
        PIPEWALL_MULT=100  PIPEWALL_TIMEOUT=3600 (per variant, seconds)
        PIPEWALL_MERGE=1 (merge into an existing PIPELINE_r16.json
        instead of starting fresh — already-measured cells are kept)
Writes PIPELINE_r16.json and prints one PIPEWALL_JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "PIPELINE_r16.json")

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
variant = os.environ["PIPEWALL_VARIANT"]
mode = os.environ["PIPEWALL_MODE"]
extra_conf = {}
for kv in os.environ.get("PIPEWALL_EXTRA_CONF", "").split(","):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra_conf[k.strip()] = v.strip()
spark = get_spark(
    "pipewall",
    cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    extra_conf=extra_conf or None,
)
ckpt = None
if mode == "reliable":
    ckpt = tempfile.mkdtemp(prefix="pipewall_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt)

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

work = tempfile.mkdtemp(prefix="pipewall_staged_")
stage_out = None
if variant == "staged":
    def stage_out(df, name):
        p = f"{work}/{name}"
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)
m0, d0 = spill_totals()
t0 = time.time()
try:
    rows = corpus_pipeline(
        wide_table(spark, dp, "documents"), stage_out=stage_out
    ).collect()
    wall = round(time.time() - t0, 2)
    m1, d1 = spill_totals()
    rec = {
        "sec": wall,
        "rows": len(rows),
        "hash": hashlib.md5(repr(sorted(tuple(r) for r in rows)).encode()).hexdigest(),
        "mem_spill_mb": round((m1 - m0) / 1e6, 1),
        "disk_spill_mb": round((d1 - d0) / 1e6, 1),
        "peak_heap_gb": round(peak["used"] / 1e9, 2),
    }
except Exception as e:
    rec = {"error": f"{type(e).__name__}: {e}"[:400]}
finally:
    shutil.rmtree(work, ignore_errors=True)
    if ckpt:
        shutil.rmtree(ckpt, ignore_errors=True)

rec["max_heap_gb"] = round(rt.maxMemory() / 1e9, 2)
print("PIPEWALL_JSON:" + json.dumps(rec), flush=True)
'''


def _run_variant(env: dict, timeout: float) -> dict:
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, cwd=REPO, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    line = next(
        (ln for ln in r.stdout.splitlines() if ln.startswith("PIPEWALL_JSON:")),
        None,
    )
    if line is None:
        return {"error": (r.stderr[-1200:] or r.stdout[-1200:]) or "no output"}
    return json.loads(line[len("PIPEWALL_JSON:"):])


def main() -> int:
    cells_env = os.environ.get(
        "PIPEWALL_CELLS", "24g:local,4g:local,2g:local,4g:reliable,2g:reliable"
    )
    # cell grammar: ceil[:mode[:flag...]] — mode local|reliable; flags:
    # `nobc` (autoBroadcastJoinThreshold=-1, Spark's own low-memory
    # guidance, same protocol as tools_memsweep's tightest rows) and `cN`
    # (N task threads — bytes/core is the deployment knob the constrained
    # rows are really about)
    cells = []
    for tok in cells_env.split(","):
        parts = tok.strip().split(":")
        ceil, mode = parts[0], (parts[1] if len(parts) > 1 else "local")
        flags = parts[2:]
        cells.append((ceil, mode, flags))
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
    if os.environ.get("PIPEWALL_MERGE", "") and os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f).get("ceilings", {})
        print(f"[pipewall] merged {len(results)} existing cells", file=sys.stderr)

    timeout = float(os.environ.get("PIPEWALL_TIMEOUT", "3600"))
    for ceil, mode, flags in cells:
        key = "_".join([ceil] + ([mode] if mode != "local" else []) + flags)
        if key in results and os.environ.get("PIPEWALL_MERGE", ""):
            # under MERGE an existing cell is a MEASUREMENT, even when it
            # holds an error: the constrained localCheckpoint failures are
            # the controlled negative, not a crash to retry (delete the
            # artifact to re-measure from scratch)
            print(f"[pipewall] {key}: kept (merged)", file=sys.stderr)
            continue
        env = dict(base_env, SPARK_GRAFT_DRIVER_MEM=ceil, PIPEWALL_MODE=mode)
        conf = []
        for flag in flags:
            if flag == "nobc":
                conf.append("spark.sql.autoBroadcastJoinThreshold=-1")
            elif flag.startswith("c") and flag[1:].isdigit():
                env["SPARK_GRAFT_CPUS"] = flag[1:]
            else:
                raise SystemExit(f"unknown cell flag {flag!r} in {key}")
        if conf:
            env["PIPEWALL_EXTRA_CONF"] = ",".join(conf)
        cell: dict = {"mode": mode, "flags": flags}
        for variant in ("composed", "staged"):
            rec = _run_variant(dict(env, PIPEWALL_VARIANT=variant), timeout)
            cell["max_heap_gb"] = rec.pop("max_heap_gb", cell.get("max_heap_gb"))
            cell[variant] = rec
            status = "ok" if "error" not in rec else "FAILED"
            print(f"[pipewall] {key}/{variant}: {status}", file=sys.stderr)
        results[key] = cell

    # verdict: three-part contract. (1) every cell that COMPLETED must
    # hash-match the unconstrained composed reference — a wrong result is
    # red no matter the ceiling; (2) at least one RELIABLE-mode
    # constrained cell must be fully green in both variants — the
    # spill-not-OOM deployment answer exists; (3) cells that FAILED under
    # constraint stay in the artifact as the measured memory wall
    # (localCheckpoint block loss, checkpoint-recipe NPE, per-task OOM) —
    # the same controlled-negative evidence class as CLUSTER.json D/F.
    heaps = [
        (rec.get("max_heap_gb") or 0, key) for key, rec in results.items()
        if rec.get("mode", "local") == "local"
    ]
    ref_key = max(heaps)[1] if heaps else None
    ref = results.get(ref_key, {}).get("composed", {}).get("hash")
    green = ref is not None
    negatives = []
    reliable_green = []
    for key, rec in results.items():
        cell_ok = True
        for variant in ("composed", "staged"):
            cell_hash = rec.get(variant, {}).get("hash")
            if cell_hash is None:
                negatives.append(f"{key}/{variant}")
                cell_ok = False
            elif cell_hash != ref:
                green = False  # completed but WRONG — always red
        if cell_ok and rec.get("mode") == "reliable":
            reliable_green.append(key)
    if not reliable_green:
        green = False
    verdict = {
        "mult": int(mult),
        "docs_rows": n_docs,
        "reference_cell": ref_key,
        "ceilings": results,
        "reliable_green_cells": sorted(reliable_green),
        "negatives_under_constraint": sorted(negatives),
        "hashes_green": green,
    }
    with open(OUT, "w") as f:
        json.dump(verdict, f, indent=1)
    print("PIPEWALL_JSON:" + json.dumps(
        {
            "hashes_green": green,
            "reliable_green_cells": sorted(reliable_green),
            "negatives_under_constraint": sorted(negatives),
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
