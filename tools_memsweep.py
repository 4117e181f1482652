"""Memory-pressure sweep (VERDICT r13 item 4): run the shuffle-heavy dedup
stack at sf1.0 under CONSTRAINED JVM heaps and show it degrades to spill,
not OOM — the local 128 GiB box never spills at the default 24g ceiling,
so the 100 TB memory story needs this measurement.

Parent process: one subprocess per ceiling (spark.driver.memory is a
JVM-launch conf — it cannot change inside a session). Each child runs the
query list, records wall time, result hash (sorted-rows md5), peak JVM
heap (sampled via py4j), and the stage-level spill counters from the
app-status store. The parent asserts every ceiling's hash matches the
unconstrained run ("hashes green") and prints the SCALE.md table rows.

Usage:
  python tools_memsweep.py            # ceilings 24g,6g,3g at /tmp/nexgap_sf1.0
  MEMSWEEP_CEILINGS=24g,4g MEMSWEEP_QUERIES=q43_dup_groups python tools_memsweep.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r'''
import hashlib, json, os, sys, threading, time

from nexgap_spark.session import get_spark
from nexgap_spark.plans import QUERIES

sf_dir = os.environ["MEMSWEEP_SF_DIR"]
names = os.environ["MEMSWEEP_QUERIES"].split(",")
# extra confs for a ceiling (e.g. the 2g row disables auto-broadcast per
# Spark's own low-memory guidance, or shrinks spark.memory.fraction to
# force spill). Applied on the BUILDER — the child session is fresh, and
# static core confs (memory.fraction) reject runtime conf.set.
extra_conf = {}
for kv in os.environ.get("MEMSWEEP_CONF", "").split(","):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra_conf[k.strip()] = v.strip()
spark = get_spark(
    "memsweep",
    cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    extra_conf=extra_conf or None,
)

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

t = threading.Thread(target=sample, daemon=True)
t.start()

def spill_totals():
    # stage-level counters from the app-status store (works with the UI
    # disabled; same data the REST API serves). Spark 4 signature:
    # stageList(statuses, details, withSummaries, quantiles, taskStatus) —
    # scala defaults fetched via their $default$N accessors
    store = spark.sparkContext._jsc.sc().statusStore()
    d2 = getattr(store, "stageList$default$2")()
    d3 = getattr(store, "stageList$default$3")()
    d4 = getattr(store, "stageList$default$4")()
    d5 = getattr(store, "stageList$default$5")()
    seq = store.stageList(jvm.java.util.ArrayList(), d2, d3, d4, d5)
    mem = disk = 0
    for i in range(seq.size()):
        s = seq.apply(i)
        mem += s.memoryBytesSpilled()
        disk += s.diskBytesSpilled()
    return mem, disk

out = {"max_heap_gb": round(rt.maxMemory() / 1e9, 2), "queries": {}}
if extra_conf:
    out["extra_conf"] = extra_conf
# cheap warm-up (JVM + python worker pool) that does NOT pre-run a listed
# query: several (dup_groups) are EAGER at plan-construction time
spark.range(32 * 1024).repartition(32).mapInPandas(lambda it: it, "id long").count()
for name in names:
    # per-query fault isolation: one failing query records ITS error and
    # the sweep keeps going (the failure mode at a ceiling is data too)
    m0, d0 = spill_totals()
    t0 = time.perf_counter()
    try:
        rows = QUERIES[name](spark, sf_dir).collect()
    except Exception as e:
        out["queries"][name] = {"error": f"{type(e).__name__}: {e}"[:400]}
        continue
    dt = time.perf_counter() - t0
    m1, d1 = spill_totals()
    h = hashlib.md5()
    for r in sorted(str(tuple(r)) for r in rows):
        h.update(r.encode())
    out["queries"][name] = {
        "sec": round(dt, 2),
        "rows": len(rows),
        "hash": h.hexdigest(),
        "mem_spill_mb": round((m1 - m0) / 1e6, 1),
        "disk_spill_mb": round((d1 - d0) / 1e6, 1),
    }
stop.set(); t.join(timeout=2)
out["peak_heap_gb"] = round(peak["used"] / 1e9, 2)
print("MEMSWEEP_JSON:" + json.dumps(out), flush=True)
'''


def main() -> int:
    ceilings = os.environ.get("MEMSWEEP_CEILINGS", "24g,6g,3g").split(",")
    queries = os.environ.get(
        "MEMSWEEP_QUERIES",
        "q43_dup_groups,q44_dedup_corpus,q31_minhash_lsh_pairs,"
        "q27_exact_dedup_stats,q09_cumulative_revenue",
    )
    sf_dir = os.environ.get("MEMSWEEP_SF_DIR", "/tmp/nexgap_sf1.0")
    results: dict[str, dict] = {}
    for ceil in ceilings:
        env = dict(
            os.environ,
            PYTHONPATH="/root/repo",
            SPARK_GRAFT_DRIVER_MEM=ceil,
            MEMSWEEP_SF_DIR=sf_dir,
            MEMSWEEP_QUERIES=queries,
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD],
                env=env,
                capture_output=True,
                text=True,
                timeout=float(os.environ.get("MEMSWEEP_TIMEOUT", "3600")),
            )
        except subprocess.TimeoutExpired:
            # one wedged ceiling (GC thrash) must cost ITS row, not the
            # whole sweep's verdict (r14 review)
            results[ceil] = {"error": "timeout"}
            print(f"[memsweep] {ceil}: TIMEOUT", file=sys.stderr)
            continue
        line = next(
            (ln for ln in r.stdout.splitlines() if ln.startswith("MEMSWEEP_JSON:")),
            None,
        )
        if r.returncode != 0 or line is None:
            results[ceil] = {
                "error": (r.stderr[-1500:] or r.stdout[-1500:]) or "no output"
            }
            print(f"[memsweep] {ceil}: FAILED", file=sys.stderr)
            continue
        results[ceil] = json.loads(line[len("MEMSWEEP_JSON:"):])
        print(f"[memsweep] {ceil}: ok", file=sys.stderr)

    # hash equality vs the largest (unconstrained) ceiling
    ref = results.get(ceilings[0], {})
    verdict = {"sf_dir": sf_dir, "ceilings": results, "hashes_green": None}
    bearing = [c for c in ceilings if "queries" in results.get(c, {})]
    if "queries" in ref and len(bearing) >= 2:
        green = True
        for ceil in ceilings[1:]:
            cur = results.get(ceil, {})
            if "queries" not in cur:
                green = False
                continue
            for q, info in ref["queries"].items():
                # a query that errored in EITHER run has no "hash" key
                # (per-query fault isolation) — that's not-green, never a
                # KeyError after an hour of sweeping (r14 review)
                want = info.get("hash")
                if want is None or cur["queries"].get(q, {}).get("hash") != want:
                    green = False
        verdict["hashes_green"] = green
    elif len(ceilings) >= 2 and "queries" not in ref:
        # ADVICE r14: multiple ceilings ran but the unconstrained REFERENCE
        # produced nothing to compare against — that's a failed sweep, not
        # an exploratory single-ceiling run, and must not exit 0.
        verdict["reference_failed"] = True
        print(
            f"[memsweep] reference ceiling {ceilings[0]} produced no queries; "
            "no cross-ceiling comparison possible",
            file=sys.stderr,
        )
    print(json.dumps(verdict, indent=1))
    # null + reference_failed unset = single-ceiling exploratory run: not a
    # failure; an actual mismatch OR a dead reference fails the sweep
    if verdict["hashes_green"] is False:
        return 1
    if verdict.get("reference_failed"):
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
