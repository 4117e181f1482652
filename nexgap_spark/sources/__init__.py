"""Sources & sinks: schema-first JSONL/Parquet IO with a corrupt-record side
channel, idempotent-ingest ledgers, and driver-side config scans."""

from nexgap_spark.sources.jsonl import (  # noqa: F401
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from nexgap_spark.sources.ledger import anti_join_processed, mark_processed  # noqa: F401
