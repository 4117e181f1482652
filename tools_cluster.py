#!/usr/bin/env python
"""Standalone-cluster harness: real wire shuffle + executor-loss recovery.

local[32] is ONE JVM: every shuffle read is process-local, an executor
cannot die independently of the driver, and lost-block recovery never
runs. This harness launches a real Spark standalone cluster on this box —
one master + N worker JVMs, each hosting one executor JVM — so the heavy
query set runs against genuine wire shuffle fetch between processes, and
an executor can be kill -9'ed mid-computation:

  Phase A  reference hashes: the heavy dedup/converter set on local[8]
           (fresh subprocess, same code path as CORRECTNESS_LOCAL)
  Phase B  same queries on the cluster → value-hash equality vs phase A
           (wire shuffle produces byte-identical results)
  Phase C  connected components (q43) on the cluster with a RELIABLE
           checkpoint dir (session.materialize switches automatically);
           one executor JVM is kill -9'ed mid-query. Asserts: the job
           completes, the hash equals phase A, and the master replaced
           the executor.
  Phase D  (negative control) same kill WITHOUT a checkpoint dir:
           localCheckpoint truncates lineage, so the lost blocks are
           unrecoverable and the job is expected to fail — demonstrating
           why materialize() upgrades to reliable checkpoints on real
           clusters. Outcome is recorded either way (an early/lucky kill
           can miss every checkpoint block).

Usage:   python tools_cluster.py            # full harness, prints one
                                            # CLUSTER_JSON: {...} line and
                                            # writes CLUSTER.json
Env:     CLUSTER_SF_DIR   (default /root/testdata/sf0.1)
         CLUSTER_WORKERS  (default 2)   worker JVMs = executors
         CLUSTER_CORES    (default 8)   cores per worker
         CLUSTER_MEM      (default 6g)  memory per worker/executor
         CLUSTER_QUERIES  (default heavy set q43,q44,q31,q37,q100)

The same file doubles as the in-cluster runner (`--runner`), so the
driver-side query code is identical across phases.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
HEAVY = [
    "q43_dup_groups",
    "q44_dedup_corpus",
    "q31_minhash_lsh_pairs",
    "q37_convert_pipeline",
    "q100_incremental_minhash",
]
MASTER_PORT = 17077


# --------------------------------------------------------------------------
# runner (child process): executes queries, prints hashes, nothing else
# --------------------------------------------------------------------------

def _result_digest(cols, rows) -> str:
    from tests.oracle_utils import rows_to_multiset

    ms = rows_to_multiset(cols, rows)
    return hashlib.md5(repr(sorted(ms.items())).encode()).hexdigest()


def _ckpt_demo(spark, mode: str, ckpt_dir: str | None) -> dict:
    """Controlled checkpoint-loss experiment. Materialize a 32-partition
    frame via the requested checkpoint flavor, signal the parent (which
    kill -9's one executor), wait for the kill, then CONSUME the
    checkpointed frame. localCheckpoint blocks live only on the executors
    that computed them and lineage is truncated, so the consume must fail;
    reliable checkpoint blocks live in the checkpoint dir, so the consume
    must succeed with the exact value. The reference value is recomputed
    from scratch afterwards (fresh lineage, no checkpoint dependency)."""
    from pyspark.sql import functions as F

    if mode == "reliable":
        assert ckpt_dir, "reliable demo needs --checkpoint-dir"
        spark.sparkContext.setCheckpointDir(ckpt_dir)
    base = (
        spark.range(0, 2_000_000, 1, 32)
        .withColumn("v", F.md5(F.col("id").cast("string")))
        .repartition(32, "v")  # shuffle spreads blocks over both executors
    )
    df = base.checkpoint(eager=True) if mode == "reliable" else base.localCheckpoint()
    print("CKPT_DONE", flush=True)
    time.sleep(6)  # parent kills an executor inside this window
    rec: dict = {"mode": mode}
    box: dict = {}

    def _consume() -> None:
        try:
            box["value"] = df.agg(
                F.sum(F.crc32(F.col("v"))).alias("s")
            ).first()["s"]
        except Exception as e:  # noqa: BLE001
            box["err"] = f"{type(e).__name__}: {e}"[:400]

    th = threading.Thread(target=_consume, daemon=True)
    th.start()
    th.join(timeout=240)
    if th.is_alive():
        # lost localCheckpoint blocks can put the scheduler into a long
        # fetch-retry loop; cancel and record the hang as the failure
        spark.sparkContext.cancelAllJobs()
        th.join(timeout=30)
        box.setdefault(
            "err", "TimeoutError: consume hung >240s retrying lost blocks"
        )
    rec.update(box)
    # ground truth from fresh lineage (replacement executor is up by now)
    rec["expected"] = (
        spark.range(0, 2_000_000, 1, 32)
        .withColumn("v", F.md5(F.col("id").cast("string")))
        .agg(F.sum(F.crc32(F.col("v"))).alias("s"))
        .first()["s"]
    )
    return rec


def runner(args) -> int:
    from nexgap_spark.session import get_spark

    extra = {}
    if args.master:
        os.environ["SPARK_MASTER"] = args.master
        extra = {
            "spark.master": args.master,
            "spark.executor.cores": str(args.cores),
            "spark.executor.memory": args.mem,
            "spark.cores.max": str(args.cores * args.workers),
            # the package must be importable by executor-side python workers
            "spark.executorEnv.PYTHONPATH": REPO,
        }
    spark = get_spark("nexgap_cluster", cpus=args.cores, extra_conf=extra)
    if args.ckpt_demo:
        rec = _ckpt_demo(spark, args.ckpt_demo, args.checkpoint_dir)
        print("RUNNER_JSON:" + json.dumps({"demo": rec}), flush=True)
        return 0
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)
    from nexgap_spark.plans import QUERIES

    out: dict = {"mode": "cluster" if args.master else "local", "queries": {}}
    rc = 0
    for name in args.queries.split(","):
        name = name.strip()
        print(f"QSTART {name} {time.time():.3f}", flush=True)
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, args.sf_dir)
            cols = list(df.columns)
            rows = [tuple(r) for r in df.collect()]
            rec = {
                "sec": round(time.perf_counter() - t0, 2),
                "rows": len(rows),
                "hash": _result_digest(cols, rows),
                "end": round(time.time(), 3),
            }
        except Exception as e:  # noqa: BLE001 — the parent adjudicates
            rec = {
                "err": f"{type(e).__name__}: {e}"[:400],
                "end": round(time.time(), 3),
            }
            rc = 1
        out["queries"][name] = rec
        print(f"QEND {name}", flush=True)
    print("RUNNER_JSON:" + json.dumps(out), flush=True)
    return rc


# --------------------------------------------------------------------------
# cluster lifecycle
# --------------------------------------------------------------------------

def _spark_class() -> tuple[str, dict]:
    from pyspark.find_spark_home import _find_spark_home

    home = _find_spark_home()
    env = dict(os.environ)
    env.setdefault("SPARK_HOME", home)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # keep daemon JVMs lean; they only route RPCs and fork executors
    env.setdefault("SPARK_DAEMON_MEMORY", "1g")
    return os.path.join(home, "bin", "spark-class"), env


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


class Cluster:
    def __init__(self, workers: int, cores: int, mem: str, logdir: str):
        self.procs: list[subprocess.Popen] = []
        self.url = f"spark://127.0.0.1:{MASTER_PORT}"
        spark_class, env = _spark_class()
        mlog = open(os.path.join(logdir, "master.log"), "w")
        self.procs.append(
            subprocess.Popen(
                [
                    spark_class,
                    "org.apache.spark.deploy.master.Master",
                    "--host", "127.0.0.1",
                    "--port", str(MASTER_PORT),
                    "--webui-port", str(MASTER_PORT + 1),
                ],
                stdout=mlog, stderr=subprocess.STDOUT, env=env,
            )
        )
        _wait_port(MASTER_PORT)
        for i in range(workers):
            wlog = open(os.path.join(logdir, f"worker{i}.log"), "w")
            self.procs.append(
                subprocess.Popen(
                    [
                        spark_class,
                        "org.apache.spark.deploy.worker.Worker",
                        self.url,
                        "--cores", str(cores),
                        "--memory", mem,
                        "--webui-port", str(MASTER_PORT + 2 + i),
                    ],
                    stdout=wlog, stderr=subprocess.STDOUT, env=env,
                )
            )
        # workers register asynchronously; the app will wait for resources,
        # but give registration a head start so executor launch is prompt
        time.sleep(3)

    def shutdown(self) -> None:
        for p in reversed(self.procs):
            if p.poll() is None:
                p.terminate()
        deadline = time.time() + 10
        for p in self.procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                p.kill()
        # any orphaned executor JVMs die with their worker, but be certain
        subprocess.run(
            ["pkill", "-9", "-f", "CoarseGrainedExecutorBackend"],
            check=False, capture_output=True,
        )


def _executor_pids() -> list[int]:
    r = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True, check=False,
    )
    return [int(x) for x in r.stdout.split()]


# --------------------------------------------------------------------------
# parent-side runner invocation with optional mid-query executor kill
# --------------------------------------------------------------------------

def _run_child(
    queries: str,
    sf_dir: str,
    cores: int,
    workers: int,
    mem: str,
    master: str | None = None,
    checkpoint_dir: str | None = None,
    kill_query: str | None = None,
    kill_delay: float = 3.0,
    kill_marker: str | None = None,
    ckpt_demo: str | None = None,
    timeout: float = 1800.0,
) -> dict:
    """Run the runner subprocess; optionally kill -9 one executor JVM
    ``kill_delay`` seconds after ``kill_query`` starts. Returns the parsed
    RUNNER_JSON plus kill bookkeeping."""
    cmd = [
        sys.executable, os.path.abspath(__file__), "--runner",
        "--queries", queries, "--sf-dir", sf_dir,
        "--cores", str(cores), "--workers", str(workers), "--mem", mem,
    ]
    if master:
        cmd += ["--master", master]
    if checkpoint_dir:
        cmd += ["--checkpoint-dir", checkpoint_dir]
    if ckpt_demo:
        cmd += ["--ckpt-demo", ckpt_demo]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_DRIVER_MEM"] = env.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    env.pop("SPARK_MASTER", None)  # the runner sets it itself when needed
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd=REPO,
    )
    kill_info: dict = {}
    lines: list[str] = []
    err_tail: list[str] = []

    def _drain_stderr() -> None:
        # MUST drain continuously: a kill -9'ed executor makes the Spark
        # driver spew multi-KB retry stack traces to stderr; an undrained
        # 64 KB pipe blocks the JVM's console appender and deadlocks the
        # whole runner (observed in the first phase-F run)
        for line in proc.stderr:  # type: ignore[union-attr]
            err_tail.append(line.rstrip("\n"))
            if len(err_tail) > 200:
                del err_tail[:100]

    marker = kill_marker or (f"QSTART {kill_query} " if kill_query else None)

    def _watch() -> None:
        for line in proc.stdout:  # type: ignore[union-attr]
            lines.append(line.rstrip("\n"))
            if marker and line.startswith(marker):
                threading.Thread(target=_kill_one, daemon=True).start()

    def _kill_one() -> None:
        time.sleep(kill_delay)
        pids = _executor_pids()
        if not pids:
            kill_info["error"] = "no executor JVM found to kill"
            return
        victim = pids[0]
        os.kill(victim, signal.SIGKILL)
        kill_info["victim_pid"] = victim
        kill_info["killed_at"] = round(time.time(), 3)
        kill_info["executors_before"] = len(pids)
        # did the master replace the executor?
        for _ in range(40):
            time.sleep(0.5)
            alive = [p for p in _executor_pids() if p != victim]
            if len(alive) >= len(pids):
                kill_info["replaced"] = True
                kill_info["executors_after"] = len(alive)
                break
        else:
            kill_info["replaced"] = False
            kill_info["executors_after"] = len(
                [p for p in _executor_pids() if p != victim]
            )

    t = threading.Thread(target=_watch, daemon=True)
    t.start()
    te = threading.Thread(target=_drain_stderr, daemon=True)
    te.start()
    try:
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        return {"error": "runner timeout", "tail": lines[-20:]}
    t.join(timeout=10)
    payload = next(
        (ln for ln in lines if ln.startswith("RUNNER_JSON:")), None
    )
    te.join(timeout=10)
    if payload is None:
        return {
            "error": f"runner rc={proc.returncode}, no RUNNER_JSON",
            "tail": lines[-20:] + err_tail[-20:],
        }
    out = json.loads(payload[len("RUNNER_JSON:"):])
    if kill_marker:
        out["kill"] = kill_info
    elif kill_query:
        out["kill"] = kill_info
        # was the kill actually mid-query? compare against the query's end
        qrec = out["queries"].get(kill_query, {})
        if "killed_at" in kill_info and "end" in qrec:
            out["kill"]["landed_mid_query"] = kill_info["killed_at"] < qrec["end"]
    return out


# --------------------------------------------------------------------------
# main
# --------------------------------------------------------------------------

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runner", action="store_true")
    ap.add_argument("--queries", default=",".join(HEAVY))
    ap.add_argument("--sf-dir", default=os.environ.get(
        "CLUSTER_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--master", default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--ckpt-demo", default=None, choices=["local", "reliable"])
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("CLUSTER_CORES", "8")))
    ap.add_argument("--workers", type=int,
                    default=int(os.environ.get("CLUSTER_WORKERS", "2")))
    ap.add_argument("--mem", default=os.environ.get("CLUSTER_MEM", "6g"))
    args = ap.parse_args()
    if args.runner:
        return runner(args)

    queries = os.environ.get("CLUSTER_QUERIES", ",".join(HEAVY))
    work = tempfile.mkdtemp(prefix="nexgap_cluster_")
    report: dict = {
        "sf_dir": args.sf_dir,
        "workers": args.workers,
        "cores_per_worker": args.cores,
        "mem_per_worker": args.mem,
    }
    try:
        print("[cluster] phase A: local reference hashes", file=sys.stderr)
        report["local"] = _run_child(
            queries, args.sf_dir, args.cores, args.workers, args.mem
        )

        print("[cluster] launching standalone master + workers", file=sys.stderr)
        cluster = Cluster(args.workers, args.cores, args.mem, work)
        try:
            print("[cluster] phase B: cluster run (wire shuffle)", file=sys.stderr)
            report["cluster"] = _run_child(
                queries, args.sf_dir, args.cores, args.workers, args.mem,
                master=cluster.url,
            )
            mism = []
            for q in queries.split(","):
                lh = report["local"].get("queries", {}).get(q, {}).get("hash")
                ch = report["cluster"].get("queries", {}).get(q, {}).get("hash")
                if lh is None or ch is None or lh != ch:
                    mism.append(q)
            report["wire_shuffle_hashes_equal"] = not mism
            report["wire_shuffle_mismatches"] = mism

            # pick the kill delay off phase B's measured CC time so the
            # SIGKILL lands mid-loop, after checkpoint blocks exist
            cc_sec = (
                report["cluster"].get("queries", {})
                .get("q43_dup_groups", {}).get("sec", 10.0)
            )
            delay = max(1.5, 0.65 * cc_sec)

            print("[cluster] phase C: kill -9 executor, reliable ckpt",
                  file=sys.stderr)
            ckpt = os.path.join(work, "reliable_ckpt")
            report["exec_kill_reliable"] = _run_child(
                "q43_dup_groups", args.sf_dir, args.cores, args.workers,
                args.mem, master=cluster.url, checkpoint_dir=ckpt,
                kill_query="q43_dup_groups", kill_delay=delay,
            )
            if not report["exec_kill_reliable"].get("kill", {}).get(
                    "landed_mid_query"):
                # warm caches can finish the query before the SIGKILL —
                # one earlier-kill retry keeps the measurement honest
                print("[cluster] phase C kill landed late; retry at 0.3x",
                      file=sys.stderr)
                report["exec_kill_reliable"] = _run_child(
                    "q43_dup_groups", args.sf_dir, args.cores, args.workers,
                    args.mem, master=cluster.url, checkpoint_dir=ckpt,
                    kill_query="q43_dup_groups",
                    kill_delay=max(1.0, 0.3 * cc_sec),
                )
            rq = report["exec_kill_reliable"].get("queries", {}).get(
                "q43_dup_groups", {})
            report["exec_kill_reliable_ok"] = (
                rq.get("hash") ==
                report["local"]["queries"]["q43_dup_groups"].get("hash")
            )

            print("[cluster] phase D: kill -9 executor, localCheckpoint only",
                  file=sys.stderr)
            report["exec_kill_local_ckpt"] = _run_child(
                "q43_dup_groups", args.sf_dir, args.cores, args.workers,
                args.mem, master=cluster.url,
                kill_query="q43_dup_groups", kill_delay=delay,
            )
            dq = report["exec_kill_local_ckpt"].get("queries", {}).get(
                "q43_dup_groups", {})
            # expected: unrecoverable (err mentioning lost checkpoint/rdd
            # blocks); a lucky early kill can still succeed — recorded, not
            # asserted
            report["local_ckpt_failed_as_expected"] = "err" in dq

            # controlled checkpoint-loss experiment: kill lands BETWEEN
            # materialization and consumption, so the local/reliable
            # contrast is deterministic, not a race with the query's
            # pipeline phases (the q43 kills above land wherever 0.65x of
            # wall-clock falls - usually the LSH stages, whose lineage is
            # intact and recomputable either way)
            print("[cluster] phase E: ckpt demo, reliable dir", file=sys.stderr)
            report["ckpt_demo_reliable"] = _run_child(
                "unused", args.sf_dir, args.cores, args.workers, args.mem,
                master=cluster.url,
                checkpoint_dir=os.path.join(work, "demo_ckpt"),
                ckpt_demo="reliable", kill_marker="CKPT_DONE", kill_delay=1.0,
            )
            dr = report["ckpt_demo_reliable"].get("demo", {})
            report["ckpt_demo_reliable_ok"] = (
                "err" not in dr and dr.get("value") == dr.get("expected")
            )
            print("[cluster] phase F: ckpt demo, localCheckpoint", file=sys.stderr)
            report["ckpt_demo_local"] = _run_child(
                "unused", args.sf_dir, args.cores, args.workers, args.mem,
                master=cluster.url,
                ckpt_demo="local", kill_marker="CKPT_DONE", kill_delay=1.0,
            )
            dl = report["ckpt_demo_local"].get("demo", {})
            report["ckpt_demo_local_failed_as_expected"] = "err" in dl
        finally:
            cluster.shutdown()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    ok = (
        report.get("wire_shuffle_hashes_equal") is True
        and report.get("exec_kill_reliable_ok") is True
        and report.get("exec_kill_reliable", {}).get("kill", {}).get(
            "landed_mid_query") is True
        and report.get("ckpt_demo_reliable_ok") is True
        and report.get("ckpt_demo_local_failed_as_expected") is True
    )
    report["ok"] = ok
    with open(os.path.join(REPO, "CLUSTER.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("CLUSTER_JSON:" + json.dumps({
        "ok": ok,
        "wire_shuffle_hashes_equal": report.get("wire_shuffle_hashes_equal"),
        "exec_kill_reliable_ok": report.get("exec_kill_reliable_ok"),
        "kill_landed_mid_query": report.get("exec_kill_reliable", {})
        .get("kill", {}).get("landed_mid_query"),
        "executor_replaced": report.get("exec_kill_reliable", {})
        .get("kill", {}).get("replaced"),
        "local_ckpt_failed_as_expected": report.get(
            "local_ckpt_failed_as_expected"),
        "ckpt_demo_reliable_ok": report.get("ckpt_demo_reliable_ok"),
        "ckpt_demo_local_failed_as_expected": report.get(
            "ckpt_demo_local_failed_as_expected"),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
