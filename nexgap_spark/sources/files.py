"""File-oriented sinks + URL handling (SURVEY S8/S9/S11/F22).

S8  JSON-array sink  — the reference collects every result and writes ONE
    JSON array (Gyrfalcon/llm_interface/query_generator.py:1011-1060).
S9  statistics sink  — one aggregate-stats object to a .json file
    (Gyrfalcon/core/pipeline.py:549-552).
S11 file-download    — HTTPS GET / data:-URL decode into local files with a
    scheme whitelist and per-item status records
    (Gyrfalcon/llm_interface/agents/file_system_agent.py:175-232).
F22 URL parsing      — scheme extraction + filename inference
    (file_system_agent.py:235-251).

Design: the download runs as an Arrow-batched ``mapInPandas`` stage so each
partition fetches its own URLs in parallel on the executors (the reference
loops on the driver thread), returning the same status records the
reference builds. The HTTP fetch itself is pluggable — tests inject a fake;
the default raises, because this container has no network and an engine
should not silently no-op a side effect.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# -- F22: URL parsing ------------------------------------------------------

# media-type → extension, file_system_agent.py:240-246
_DATA_EXT = {
    "text/plain": ".txt",
    "text/csv": ".csv",
    "text/tab-separated-values": ".tsv",
    "application/json": ".json",
}


def url_scheme(col: Column | str) -> Column:
    """Lowercased scheme ('' when absent) — `urlparse(url).scheme` analog."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.coalesce(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1), F.lit("")))


def url_filename(col: Column | str) -> Column:
    """Filename inference (file_system_agent.py:235-251): basename of the
    URL path; data: URLs map media type → extension; empty basenames get a
    deterministic content-derived name (the reference stamps wall-clock ms,
    which is not reproducible in a distributed retry — md5(url) carries the
    same uniqueness intent)."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = url_scheme(c)
    media = F.regexp_extract(c, r"^data:([^;,]*)", 1)
    data_ext = F.coalesce(
        *[F.when(media == k, F.lit(v)) for k, v in _DATA_EXT.items()],
        F.lit(".txt"),
    )
    data_name = F.concat(F.lit("data_"), F.md5(c), data_ext)
    # try_parse_url, not parse_url: the strict variant THROWS on malformed
    # input (one bad row kills the stage); NULL falls through to the
    # deterministic fallback name instead
    path = F.try_parse_url(c, F.lit("PATH"))
    base = F.element_at(F.split(F.coalesce(path, F.lit("")), "/"), -1)
    fallback = F.concat(F.lit("file_"), F.md5(c))
    return F.when(scheme == "data", data_name).otherwise(
        F.when(F.length(base) > 0, base).otherwise(fallback)
    )


def url_allowed(col: Column | str) -> Column:
    """Scheme whitelist: https and data only (file_system_agent.py:214-217)."""
    return url_scheme(col).isin("https", "data")


# -- S11: download sink ----------------------------------------------------

DOWNLOAD_STATUS_SCHEMA = (
    "url string, local_path string, status string, error string"
)


def _decode_data_url(url: str) -> bytes:
    import base64
    from urllib.parse import unquote_to_bytes

    header, _, payload = url.partition(",")
    if header.endswith(";base64"):
        return base64.b64decode(payload)
    return unquote_to_bytes(payload)


def download_files(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    fetcher: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """S11: fetch each row's URL into ``out_dir`` and return the reference's
    per-item status records (url, local_path, status∈{downloaded,failed},
    error). data: URLs decode locally; https goes through ``fetcher``
    (inject one; the default raises — matching the reference's hard error
    when `requests` is unavailable). Unsupported schemes fail the row, not
    the job. ``out_dir`` must be visible to the executors (local mode: any
    local path; cluster: a shared/NFS/object-store mount)."""
    import pandas as pd
    from pyspark.sql import Window

    sel = df.select(
        F.col(url_col).alias("url"), url_filename(url_col).alias("_fname")
    )
    # distinct URLs can share a basename (a.example/report.csv vs
    # b.example/report.csv); last-writer-wins would silently lose a payload
    # while both rows claim 'downloaded'. Disambiguate ONLY colliding names
    # with a content-derived prefix so the common case keeps the reference's
    # plain basenames.
    w = Window.partitionBy("_fname")
    sel = sel.withColumn(
        "_fname",
        F.when(
            F.count(F.lit(1)).over(w) > 1,
            F.concat(F.substring(F.md5("url"), 1, 8), F.lit("_"), F.col("_fname")),
        ).otherwise(F.col("_fname")),
    )

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for url, fname in zip(pdf["url"], pdf["_fname"]):
                target = os.path.join(out_dir, str(fname))
                rec: dict[str, Any] = {
                    "url": url, "local_path": target, "status": "failed", "error": None,
                }
                try:
                    scheme = url.split(":", 1)[0].lower() if ":" in url else ""
                    if scheme == "data":
                        payload = _decode_data_url(url)
                    elif scheme == "https":
                        if fetcher is None:
                            raise RuntimeError("no https fetcher configured")
                        payload = fetcher(url)
                    else:
                        raise ValueError(f"unsupported URL scheme: {scheme or 'unknown'}")
                    with open(target, "wb") as f:
                        f.write(payload)
                    rec["status"] = "downloaded"
                except Exception as exc:  # noqa: BLE001 — per-item status, like the reference
                    rec["error"] = str(exc)
                rows.append(rec)
            yield pd.DataFrame(rows, columns=["url", "local_path", "status", "error"])

    return sel.mapInPandas(fetch_partition, schema=DOWNLOAD_STATUS_SCHEMA)


# -- S8/S9: JSON sinks -----------------------------------------------------


def write_json_array(df: DataFrame, path: str, *, max_rows: int = 100_000) -> int:
    """S8: ONE file containing a JSON array of all rows (the reference's
    single json.dump of collected results). Driver-side by contract — the
    output is a single file, so a driver collect is the honest plan; the
    explicit ``max_rows`` cap turns an accidental 100 TB collect into an
    error instead of an OOM. Returns the row count written."""
    rows = df.limit(max_rows + 1).toJSON().collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_json_array: result exceeds max_rows={max_rows}; "
            "use write_jsonl (distributed) for large outputs"
        )
    with open(path, "w") as f:
        f.write("[" + ",\n".join(rows) + "]")
    return len(rows)


def write_stats_json(df: DataFrame, path: str) -> dict[str, Any]:
    """S9: write a single aggregate-stats object (pipeline.py:549-552).
    Expects a 1-row DataFrame (the output of an `.agg(...)`); errors on
    anything else rather than silently dropping rows."""
    rows = df.limit(2).collect()
    if len(rows) != 1:
        raise ValueError(f"write_stats_json expects exactly 1 row, got {len(rows)}")
    stats = rows[0].asDict(recursive=True)
    with open(path, "w") as f:
        json.dump(stats, f, indent=2, default=str)
    return stats


# -- S17: per-task log sink ------------------------------------------------


def write_task_logs(
    df: DataFrame,
    log_dir: str,
    *,
    index_col: str = "task_index",
    framework_col: str = "framework",
    query_col: str = "query",
    success_col: str = "success",
    detail_col: str = "detail",
    timestamp: str | None = None,
    max_tasks: int = 10_000,
) -> list[str]:
    """S17 (reference run_end_to_end.py:736-799): one log file per task with
    the reference's header/footer framing — ``query_{i:03d}_{framework}_
    {timestamp}.log`` containing an ``='*80`` banner, "Log Started", the
    framework, the query truncated at 200 chars, the task detail body, and
    a Status footer. Driver-side by contract (many small local files, like
    S8's single-array sink); the formatting itself is JVM-side — the full
    log content is built as ONE string column before the capped collect, so
    the driver only writes bytes. ``timestamp`` is injectable for
    deterministic tests (defaults to the current UTC time). Returns the
    written paths."""
    import re
    from datetime import datetime, timezone
    from pathlib import Path

    if timestamp is None:
        timestamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    bar = "=" * 80
    # The '/total' suffix in the banner is formatted driver-side from the
    # ONE collected row set (sentinel substitution below): a separate
    # df.count() would re-execute the upstream plan, and on a
    # non-deterministic source the banner total could disagree with the
    # number of files actually written.
    _total_sentinel = "\x00TOTAL\x00"
    q = F.coalesce(F.col(query_col).cast("string"), F.lit(""))
    q_short = F.when(
        F.length(q) > 200, F.concat(F.substring(q, 1, 200), F.lit("..."))
    ).otherwise(q)
    content = F.concat(
        F.lit(bar + "\n"),
        F.format_string(
            f"Query %s/{_total_sentinel} - Log Started\n", F.col(index_col)
        ),  # sentinel → real total driver-side; header is always the
        # content's first line so replace(count=1) can't touch user text
        F.lit(f"Timestamp: {timestamp}\n"),
        F.format_string("Framework: %s\n", F.coalesce(F.col(framework_col), F.lit(""))),
        F.format_string("Query: %s\n", q_short),
        F.lit(bar + "\n\n"),
        F.coalesce(F.col(detail_col).cast("string"), F.lit("")),
        F.lit("\n" + bar + "\n"),
        F.format_string("Query %s - Log Ended\n", F.col(index_col)),
        F.concat(
            F.lit("Status: "),
            F.when(F.col(success_col), F.lit("Success")).otherwise(F.lit("Failed")),
            F.lit("\n"),
        ),
        F.lit(bar + "\n"),
    )
    rows = (
        df.select(
            F.col(index_col).cast("long").alias("_i"),
            F.coalesce(F.col(framework_col), F.lit("unknown")).alias("_fw"),
            content.alias("_content"),
        )
        .limit(max_tasks + 1)
        .collect()
    )
    total = len(rows)
    if total > max_tasks:
        raise ValueError(
            f"write_task_logs: over {max_tasks} tasks (max_tasks); "
            "per-task driver-side files don't scale past that — use a "
            "partitioned text sink for bulk logs"
        )
    out_dir = Path(log_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written: list[str] = []
    seen: dict[str, int] = {}
    for r in rows:
        fw = re.sub(r"[^A-Za-z0-9_-]", "_", str(r["_fw"]))
        stem = f"query_{int(r['_i']):03d}_{fw}_{timestamp}"
        # no silent overwrite (download_files' contract): colliding
        # (index, sanitized framework) pairs get a disambiguating suffix
        n = seen.get(stem, 0)
        seen[stem] = n + 1
        p = out_dir / (f"{stem}.log" if n == 0 else f"{stem}_{n}.log")
        p.write_text(
            r["_content"].replace(_total_sentinel, str(total), 1),
            encoding="utf-8",
        )
        written.append(str(p))
    return written
