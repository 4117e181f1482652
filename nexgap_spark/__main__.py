"""CLI: the reference's script surface as subcommands over the Engine.

  python -m nexgap_spark convert  SPANS.jsonl OUT_DIR --agents planner,researcher
  python -m nexgap_spark validate RECORDS.jsonl OUT_DIR [--mode a4a|nexau]
  python -m nexgap_spark emit     RECORDS.jsonl OUT_DIR --target qwen
  python -m nexgap_spark dedup    DOCS.parquet  OUT_DIR [--min-jaccard 0.2]
  python -m nexgap_spark query    QUERY_NAME    SF_DIR

Outputs land as JSONL (convert/validate/emit) or parquet (dedup); `query`
prints the result to stdout. Mirrors: convert_spans_to_chatcompletion.py,
filter_xml_errors.py, convert_trace_to_specific_tool_call_style.py, and the
scale-extension dedup pipeline.
"""

from __future__ import annotations

import argparse
import sys

from nexgap_spark.engine import Engine
from nexgap_spark.sources.jsonl import write_jsonl


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nexgap_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("convert")
    p.add_argument("spans"), p.add_argument("out")
    p.add_argument("--agents", default="", help="comma-separated config agent names")

    p = sub.add_parser("validate")
    p.add_argument("records"), p.add_argument("out")
    p.add_argument("--mode", default="a4a", choices=["a4a", "nexau"])

    p = sub.add_parser("emit")
    p.add_argument("records"), p.add_argument("out")
    p.add_argument(
        "--target",
        required=True,
        choices=["qwen", "minimax", "glm", "openrouter", "deepseek"],
    )

    p = sub.add_parser("dedup")
    p.add_argument("docs"), p.add_argument("out")
    p.add_argument("--min-jaccard", type=float, default=0.2)

    p = sub.add_parser("query")
    p.add_argument("name"), p.add_argument("sf_dir")

    args = ap.parse_args(argv)
    eng = Engine()

    if args.cmd == "convert":
        agents = [a for a in args.agents.split(",") if a]
        out = eng.convert(eng.read_spans(args.spans), config_agents=agents)
        write_jsonl(out, args.out, mode="overwrite")
    elif args.cmd == "validate":
        records = eng.spark.read.json(args.records)
        valid, errors = eng.filter_valid(records, mode=args.mode)
        write_jsonl(valid, args.out, mode="overwrite")
        n_bad = errors.count()
        print(f"valid written to {args.out}; {n_bad} invalid", file=sys.stderr)
    elif args.cmd == "emit":
        records = eng.spark.read.json(args.records)
        write_jsonl(eng.emit(records, args.target), args.out, mode="overwrite")
    elif args.cmd == "dedup":
        docs = eng.spark.read.parquet(args.docs)
        eng.dedup_corpus(docs, min_jaccard=args.min_jaccard).write.mode(
            "overwrite"
        ).parquet(args.out)
    elif args.cmd == "query":
        for row in eng.run_query(args.name, args.sf_dir).collect():
            print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
