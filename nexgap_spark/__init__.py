"""nexgap_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nex-agi/NexGAP.

Layers (SURVEY.md §7):
  1. relational core  — ``operators/``: span-tree joins/windows, sampling,
     stats, sessionization — composable DataFrame transformations.
  2. document ops     — ``functions/``: XML tool-call extraction, validators,
     format emitters — pure Python cores wrapped as Arrow-batched pandas UDFs.
  3. external calls   — ``external/``: pluggable batched LLM/HTTP stages
     (deterministic mock by default).
Plus scale extensions for LLM-data pipelines (dedup, similarity search,
text analysis, multimodal plumbing) and a Structured Streaming module.
"""

__version__ = "0.1.0"

from nexgap_spark.session import (  # noqa: F401
    get_spark,
    invalidate_scan_cache,
    load_table,
    load_tables,
)


def __getattr__(name):
    # lazy: Engine pulls in the operator catalog; keep bare imports cheap
    if name == "Engine":
        from nexgap_spark.engine import Engine

        return Engine
    raise AttributeError(name)
