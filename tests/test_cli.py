"""CLI surface: python -m nexgap_spark subcommands end to end.

One subprocess per test is expensive (fresh JVM), so a single test drives
convert and reuses its output; the other subcommands share the same code
paths through Engine, which test_engine covers in-process.
"""

from __future__ import annotations

import glob
import json
import subprocess
import sys

from tests.fixtures_spans import build_spans


def test_cli_convert_roundtrip(tmp_path):
    spans = tmp_path / "spans.jsonl"
    with open(spans, "w") as f:
        for row in build_spans():
            f.write(json.dumps(row) + "\n")
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "nexgap_spark",
            "convert",
            str(spans),
            str(out_dir),
            "--agents",
            "planner,researcher,meta",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    records = []
    for p in glob.glob(str(out_dir / "part-*")):
        with open(p) as f:
            records.extend(json.loads(line) for line in f if line.strip())
    assert len(records) == 3
    assert {r["span_id"] for r in records} == {"span_0003", "span_0011", "span_0030"}
    for rec in records:
        assert rec["messages"]
