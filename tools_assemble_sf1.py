"""Assemble BENCH_SF1.json from the two full-catalog bench details
(/tmp/bench_sf01_all.json + /tmp/bench_sf1_all.json). Mirrors the
committed artifact's shape; flags every query whose sf1.0/sf0.1 time
ratio exceeds 10x (linear on 10x data) for explanation."""

import json
import os

s01 = json.load(open(os.environ.get("SF01_DETAIL", "/tmp/bench_sf01_all.json")))
s1 = json.load(open(os.environ.get("SF1_DETAIL", "/tmp/bench_sf1_all.json")))

q01, q1 = s01["queries"], s1["queries"]
d01, d1 = s01.get("duckdb", {}), s1.get("duckdb", {})
# bench.py (r14+) already splits the baseline_ namespace into its own
# sections; older artifacts carry them inline — split here either way so
# the headline tables and flagged_superlinear never include a baseline.
# When a baseline WAS inline, the artifact's totals included it too, so
# the popped time must also come OFF every headline total below (r14
# review: popping only the per-query row left the quadratic seconds
# inside the scale-claimed sums).
b01, b1 = dict(s01.get("baselines", {})), dict(s1.get("baselines", {}))
bd01, bd1 = dict(s01.get("baselines_duckdb", {})), dict(s1.get("baselines_duckdb", {}))
inline = {"q01": 0.0, "q1": 0.0, "d01": 0.0, "d1": 0.0,
          "sc01": 0.0, "sc1": 0.0}
for key, src, dst, dsrc in (
    ("q01", q01, b01, d01),
    ("q1", q1, b1, d1),
):
    for name in [n for n in src if n.startswith("baseline_")]:
        dst[name] = src.pop(name)
        inline[key] += dst[name]
        if name in dsrc:
            # spark_comparable sums only oracle-matched queries
            inline["sc" + key[1:]] += dst[name]
for key, src, dst, bsp in (("d01", d01, bd01, b01), ("d1", d1, bd1, b1)):
    for name in [n for n in src if n.startswith("baseline_")]:
        dst[name] = src.pop(name)
        # only subtract from duckdb_total when the spark side ALSO ran the
        # baseline (bench.py sums duckdb_total over the spark-AND-duck
        # common set, so a spark-DNF baseline's duck time was never in the
        # total — r14 review pass 2)
        if name in bsp:
            inline[key] += dst[name]


def _adj(total, delta):
    return round(total - delta, 3) if isinstance(total, (int, float)) else total

# Explanations for queries whose sf1.0/sf0.1 ratio can exceed 10x (linear).
# Two legitimate classes: declared quadratic baselines (now segregated in
# the baselines section below), and sub-second sf0.1 cells where the ratio
# divides by fixed session overhead rather than work (isolated best-of-3
# cross-checks in SCALE.md round-13 cont.).
BASELINE_EXPLANATIONS = {
    "baseline_q36_embedding_near_dup": (
        "declared quadratic-in-block all-pairs BASELINE (plans/similarity.py "
        "boundary note): blocks are 10x larger so same-block pairs grow "
        "~100x; the r13 Arrow Gram kernel cut the constant 20x. Scale "
        "paths: q45 (sign-LSH) / q102 (SemDeDup) — the headline rows."
    ),
    "baseline_q29_ngram_jaccard_topk": (
        "declared all-pairs Jaccard BASELINE (plans/textops.py boundary "
        "note); the LSH twin q31 is the scale path and headline row."
    ),
}
EXPLANATIONS = {
    "q69_pii_scan": (
        "linear in TOTAL CHARACTERS: sf1.0 carries 13.7x the characters of "
        "sf0.1; growth tracks the byte ratio, pure projection."
    ),
    "q04_priority_semi_join": (
        "linear in fact rows against a fixed-overhead-dominated sf0.1 base "
        "(~0.5s): the sf1.0 cost is the unavoidable key-sized lineitem "
        "pre-agg shuffle + 1.5M-key broadcast build; isolated best-of-3 "
        "4.6-5.4s vs 5.5s before the r13 rewrite."
    ),
    "q16_sessionize_events": (
        "sweep-position inflation over a sub-0.3s sf0.1 base: isolated "
        "best-of-3 at sf1.0 is 2.48s (9.5x, linear range) vs the sweep "
        "cell's contended 5.1s; one shuffle + per-user sort, hot-key "
        "boundary quantified in SCALE.md round-15 skew table."
    ),
}
_SUBSECOND = (
    "ratio divides a sub-second, fixed-overhead-dominated sf0.1 cell; "
    "isolated best-of-3 at sf1.0 matches or beats the prior artifact "
    "(SCALE.md round-13 cont. cross-check table) — growth is linear."
)

queries = {}
flagged = []
for name in sorted(q1):
    e = {
        "spark_sf1": round(q1[name], 3),
        # None (JSON null), never NaN — a query missing at one SF (errored
        # or newly added between sweeps) must not corrupt the artifact for
        # strict JSON parsers (r13 review)
        "spark_sf01": round(q01[name], 3) if name in q01 else None,
    }
    if name in d1:
        e["duckdb_sf1"] = round(d1[name], 3)
    if name in d01:
        e["duckdb_sf01"] = round(d01[name], 3)
    if q01.get(name):
        e["sf1_over_sf01"] = round(q1[name] / q01[name], 1)
        if e["sf1_over_sf01"] > 10:
            expl = EXPLANATIONS.get(
                name, _SUBSECOND if q01[name] < 1.0 else "UNEXPLAINED"
            )
            flagged.append(
                {
                    "query": name,
                    "sf1_over_sf01": e["sf1_over_sf01"],
                    "sf01_sec": e["spark_sf01"],
                    "sf1_sec": e["spark_sf1"],
                    "explanation": expl,
                }
            )
    queries[name] = e


def _isolated_recheck(flagged: list[dict], sf1_dir: str | None) -> None:
    """Auto-rerun every flagged_superlinear query ISOLATED best-of-3 at
    sf1.0 and record isolated_sec / isolated_ratio inside the flag entry —
    the cross-check that classified q16's 19x as sweep-position contention
    needed manual prose in r13 AND r15 (VERDICT r15 item 6); now the
    artifact carries it. A fresh session per assembler run (one session for
    all flagged queries — isolation is from the SWEEP's cache/GC pressure,
    not from sibling flagged queries, which run serially anyway)."""
    if not flagged:
        return
    if not sf1_dir or not os.path.isdir(sf1_dir):
        for f in flagged:
            f["isolated_sec"] = None
            f["isolated_note"] = (
                f"sf1 dir unavailable ({sf1_dir!r}) — rerun the sweep with "
                "the scaled dir present, or set SF1_DIR"
            )
        return
    import time

    from nexgap_spark.plans import QUERIES  # populates the registry
    from nexgap_spark.session import get_spark

    spark = get_spark()
    # same warmup bench.py uses: session/codegen spin-up must not land in
    # the first flagged query's first trial
    QUERIES["q06_revenue_filter"](spark, sf1_dir).collect()
    for f in flagged:
        name = f["query"]
        if name not in QUERIES:
            f["isolated_sec"] = None
            f["isolated_note"] = "query no longer in the catalog"
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            QUERIES[name](spark, sf1_dir).collect()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        f["isolated_sec"] = round(best, 3)
        if f.get("sf01_sec"):
            f["isolated_ratio"] = round(best / f["sf01_sec"], 1)
            if f["isolated_ratio"] <= 10 and f["explanation"] == "UNEXPLAINED":
                f["explanation"] = (
                    "sweep-position inflation: isolated best-of-3 is in the "
                    "linear range (see isolated_ratio)"
                )


_isolated_recheck(
    flagged, os.environ.get("SF1_DIR", s1.get("sf_dir"))
)

# baseline_ namespace: own table, own (unflagged) growth ratios — these are
# DECLARED quadratic oracle baselines whose scale twins carry the headline
# rows; their times never enter the headline totals above
baselines = {}
for name in sorted(b1):
    e = {
        "spark_sf1": round(b1[name], 3),
        "spark_sf01": round(b01[name], 3) if name in b01 else None,
        "explanation": BASELINE_EXPLANATIONS.get(name, "declared baseline"),
    }
    if name in bd1:
        e["duckdb_sf1"] = round(bd1[name], 3)
    if name in bd01:
        e["duckdb_sf01"] = round(bd01[name], 3)
    if b01.get(name):
        e["sf1_over_sf01"] = round(b1[name] / b01[name], 1)
    baselines[name] = e

out = {
    "generated": os.environ.get(
        "SF1_GENERATED_NOTE",
        "UNKNOWN tree — set SF1_GENERATED_NOTE when assembling so the "
        "artifact records which tree produced the sweep details "
        "(VERDICT r16 item 2: a stale note misdated the r15 sweep)",
    ),
    "sf1_totals": {
        "spark": _adj(s1["value"], inline["q1"]),
        # comparable = same-query-set sums; ratio is ALWAYS computed from
        # these two, and both are reported so the displayed division
        # matches the recorded ratio even when some query lacks an oracle
        "spark_comparable": _adj(s1.get("spark_comparable"), inline["sc1"]),
        "duckdb_comparable": _adj(s1.get("duckdb_total"), inline["d1"]),
        # guard BOTH operands (r14 review), POST-adjustment: a sweep
        # artifact with a missing/None operand — or one zeroed by the
        # baseline subtraction — must emit null, not raise
        "ratio": round(
            _adj(s1["spark_comparable"], inline["sc1"])
            / _adj(s1["duckdb_total"], inline["d1"]),
            3,
        )
        if s1.get("duckdb_total")
        and s1.get("spark_comparable")
        and _adj(s1["duckdb_total"], inline["d1"])
        and _adj(s1["spark_comparable"], inline["sc1"])
        else None,
    },
    "sf01_totals": {
        "spark": _adj(s01["value"], inline["q01"]),
        "spark_comparable": _adj(s01.get("spark_comparable"), inline["sc01"]),
        "duckdb_comparable": _adj(s01.get("duckdb_total"), inline["d01"]),
    },
    "spark_errors": {**s01.get("errors", {}), **s1.get("errors", {})},
    "n_queries": len(q1),
    "n_oracles": len(d1),
    "flagged_superlinear": flagged,
    "queries": queries,
    "baselines": baselines,
}
json.dump(out, open(os.environ.get("SF1_OUT", "BENCH_SF1.json"), "w"), indent=1)
print("flagged:", [f["query"] for f in flagged])
print(
    "sf1:", out["sf1_totals"], "| sf01:", out["sf01_totals"],
    "| errors:", len(out["spark_errors"]),
)
