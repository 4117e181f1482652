"""Span-tree relational core (SURVEY §2.2-§2.4: P1-P3/P10, J1-J3, A1, A2, O1).

The reference walks parent-pointer dicts one span at a time
(convert_spans_to_chatcompletion.py:454-526, 1637-1687). Spark-first:
the span index becomes the build side of a broadcast hash join, the
"last generation per group" dedup becomes one window, and multi-hop agent
resolution is an iterative self-join to a bounded fixpoint (tree depth ≤ ~5).

Scale: spans-per-trace is small but trace count is huge; every operator here
shuffles at most once on trace-local keys, and the parent join broadcasts the
projected (span_id, span_name, parent) columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

GENERATION_MARKERS = ("OpenAI-generation", "anthropic.chat")
EPOCH_FLOOR = "1970-01-01T00:00:00"
SUBAGENT_PREFIX = "Sub-agent: "


def filter_generation_spans(
    spans: DataFrame, marker: str | tuple[str, ...] = GENERATION_MARKERS
) -> DataFrame:
    """P2 (reference convert_spans_to_chatcompletion.py:1517-1521):
    span_type == GENERATION and span_name contains the generation marker.
    Accepts one marker or a tuple (a trace mixing `OpenAI-generation` and
    `anthropic.chat` span markers needs both in one pass)."""
    markers = (marker,) if isinstance(marker, str) else tuple(marker)
    cond = F.col("span_name").contains(markers[0])
    for m in markers[1:]:
        cond = cond | F.col("span_name").contains(m)
    return spans.filter((F.col("span_type") == "GENERATION") & cond)


def filter_nonempty_input(spans: DataFrame) -> DataFrame:
    """P10 (reference :1534-1535): drop spans with empty/missing input."""
    return spans.filter(F.size(F.coalesce(F.col("input"), F.array())) > 0)


def exclude_meta(df: DataFrame, col: str = "agent_name") -> DataFrame:
    """P3 (reference :1801): drop rows resolved to the 'meta' agent."""
    return df.filter((F.col(col).isNull()) | (F.col(col) != "meta"))


def enrich(df: DataFrame, *, query: str, framework: str, langfuse_trace_id: str) -> DataFrame:
    """P1 (reference run_end_to_end.py:366-379): literal enrichment columns."""
    return (
        df.withColumn("query", F.lit(query))
        .withColumn("framework", F.lit(framework))
        .withColumn("langfuse_trace_id", F.lit(langfuse_trace_id))
        .withColumn("stop", F.lit(""))
    )


def last_generation_per_group(spans: DataFrame, *, tiebreak: str = "span_id") -> DataFrame:
    """A1 (reference :1637-1687): group generation spans by
    coalesce(parentObservationId, span_id); keep the chronologically last by
    startTime, nulls treated as the epoch floor. One window, one shuffle.

    The reference relies on input order for ties; we pin ``tiebreak`` so the
    result is deterministic under any partitioning.
    """
    group_key = F.coalesce(F.col("parentObservationId"), F.col("span_id"))
    ts = F.coalesce(
        F.to_timestamp("startTime"), F.lit(EPOCH_FLOOR).cast("timestamp")
    )
    w = W.partitionBy(group_key).orderBy(ts.desc(), F.col(tiebreak).desc())
    return (
        spans.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


PARENT_BROADCAST_CAP = 5_000_000  # rows; ≈ dedup's membership-join cap


def _parent_side(
    parents: DataFrame,
    broadcast_parents: bool | None,
    max_rows: int = PARENT_BROADCAST_CAP,
) -> DataFrame:
    """Single definition of the parent-join build-side policy.

    ``True``/``False`` force broadcast / shuffle; ``None`` (the default
    everywhere) routes through dedup.capped_broadcast — broadcast only
    under its explicit row cap, AQE-planned shuffle join above it. Same
    policy, same cap, as the dedup membership join, so a span table whose
    projected parent side outgrows executor memory degrades to a shuffle
    instead of OOMing the cluster. The count the cap costs also
    materializes the projection once (localCheckpoint), which the
    iterative resolvers re-read every hop anyway."""
    if broadcast_parents is None:
        from nexgap_spark.operators.dedup import capped_broadcast

        return capped_broadcast(parents, max_rows=max_rows)
    return F.broadcast(parents) if broadcast_parents else parents


def join_parent(
    spans: DataFrame,
    *,
    broadcast_parents: bool | None = None,
    max_broadcast_parent_rows: int = PARENT_BROADCAST_CAP,
) -> DataFrame:
    """J1+J2 (reference :454-458, :511-526): attach the parent span's name as
    ``parent_span_name`` via a broadcast hash join — the Spark equivalent of
    the reference's whole-file span_id→span dict. Build-side policy:
    :func:`_parent_side` (cap-checked broadcast by default)."""
    parents = _parent_side(
        spans.select(
            F.col("span_id").alias("_p_id"),
            F.col("span_name").alias("parent_span_name"),
        ),
        broadcast_parents,
        max_broadcast_parent_rows,
    )
    return spans.join(
        parents, spans["parentObservationId"] == parents["_p_id"], "left"
    ).drop("_p_id")


def _strip_subagent(col: F.Column) -> F.Column:
    return F.regexp_replace(col, f"^{SUBAGENT_PREFIX}", "")


def resolve_agent_name(
    spans: DataFrame,
    config_agents: list[str],
    *,
    max_hops: int = 6,
    parent_source: DataFrame | None = None,
    broadcast_parents: bool | None = None,
    max_broadcast_parent_rows: int = PARENT_BROADCAST_CAP,
) -> DataFrame:
    """J3 (reference :460-509): walk each span's parent chain; the agent name
    is the first ancestor whose span_name (case-insensitively, after
    stripping the 'Sub-agent: ' prefix) matches a configured agent; falls
    back to the immediate parent's stripped name (J2 behavior) when no
    ancestor matches.

    Build-side policy: :func:`_parent_side` — the default (``None``)
    broadcasts the 3-column parent projection only under the capped-
    broadcast row cap and falls back to AQE shuffle joins above it;
    ``True``/``False`` force either branch.

    Iterative broadcast self-join to a bounded fixpoint — tree depth is ≤ ~5
    in the reference data, so ``max_hops`` caps the loop; each hop joins only
    the still-unresolved rows against the projected parent table.

    ``parent_source``: the UNFILTERED span table to resolve parents against
    (the reference indexes the whole file, :454-458); defaults to ``spans``
    itself, which is only correct when nothing has been filtered out yet.
    """
    agents_lc = [a.lower() for a in config_agents]
    parents = _parent_side(
        (parent_source if parent_source is not None else spans).select(
            F.col("span_id").alias("_p_id"),
            F.col("span_name").alias("_p_name"),
            F.col("parentObservationId").alias("_p_parent"),
        ),
        broadcast_parents,
        max_broadcast_parent_rows,
    )

    out = spans.withColumn("_cursor", F.col("parentObservationId")).withColumn(
        "agent_name", F.lit(None).cast("string")
    ).withColumn("_fallback", F.lit(None).cast("string"))

    for hop in range(max_hops):
        out = out.join(parents, out["_cursor"] == parents["_p_id"], "left")
        stripped = _strip_subagent(F.col("_p_name"))
        matched = F.lower(stripped).isin(agents_lc)
        fallback = stripped if hop == 0 else F.col("_fallback")
        out = (
            out.withColumn(
                "agent_name",
                F.when(F.col("agent_name").isNotNull(), F.col("agent_name")).when(
                    F.col("_p_name").isNotNull() & matched, stripped
                ),
            )
            .withColumn("_fallback", fallback)
            .withColumn(
                "_cursor",
                F.when(F.col("agent_name").isNotNull(), F.lit(None)).otherwise(
                    F.col("_p_parent")
                ),
            )
            .drop("_p_id", "_p_name", "_p_parent")
        )
    return out.withColumn(
        "agent_name", F.coalesce(F.col("agent_name"), F.col("_fallback"))
    ).drop("_cursor", "_fallback")


def resolve_root(
    spans: DataFrame,
    *,
    id_col: str = "span_id",
    parent_col: str = "parentObservationId",
    max_hops: int = 6,
    out_col: str = "root_id",
    broadcast_parents: bool | None = None,
    max_broadcast_parent_rows: int = PARENT_BROADCAST_CAP,
) -> DataFrame:
    """J3 companion: resolve each span's root ancestor by iterative broadcast
    self-join (bounded depth). Rows whose parent is null are their own root.
    Build-side policy: :func:`_parent_side` (cap-checked broadcast by
    default; ``False`` forces shuffle joins for span tables whose 2-column
    projection outgrows executor memory)."""
    parents = _parent_side(
        spans.select(
            F.col(id_col).alias("_p_id"), F.col(parent_col).alias("_p_parent")
        ),
        broadcast_parents,
        max_broadcast_parent_rows,
    )
    out = spans.withColumn(out_col, F.col(id_col)).withColumn(
        "_cursor", F.col(parent_col)
    )
    for _ in range(max_hops):
        out = (
            out.join(parents, out["_cursor"] == parents["_p_id"], "left")
            .withColumn(
                out_col, F.coalesce(F.col("_p_id"), F.col(out_col))
            )
            .withColumn("_cursor", F.col("_p_parent"))
            .drop("_p_id", "_p_parent")
        )
    return out.drop("_cursor")


def agent_distribution(spans: DataFrame) -> DataFrame:
    """A2 (reference :1857-1877): agent_name → count."""
    return spans.groupBy("agent_name").agg(F.count("*").alias("n"))


def sort_chronologically(spans: DataFrame) -> DataFrame:
    """O1 (reference langfuse_utils.py:102): global order by startTime.
    Total order via range partitioning — only use on bounded outputs."""
    return spans.orderBy(F.to_timestamp("startTime"), F.col("span_id"))


def number_rows(df: DataFrame, *, order_col: str, out_col: str = "seq") -> DataFrame:
    """W2/W3 (reference get_trace.py:44-56, pipeline.py:796-804): sequential
    numbering. Single-partition window — apply only to small/pre-aggregated
    frames (the reference numbers per-trace files, which are tiny).
    For large frames use :func:`number_rows_scalable`."""
    return df.withColumn(
        out_col, F.row_number().over(W.orderBy(F.col(order_col)))
    )


def number_rows_scalable(
    df: DataFrame, *, order_col: str, out_col: str = "seq"
) -> DataFrame:
    """Global sequential numbering WITHOUT the single-partition window.

    Three steps, all distributed: (1) `repartitionByRange(order_col)` gives a
    total order across partitions (partition i's values all precede partition
    i+1's); (2) `row_number()` per partition is local — no data movement;
    (3) per-partition row counts (one row per partition) turn into cumulative
    offsets on the driver-sized side and broadcast back. Equivalent to
    `number_rows` whenever ``order_col`` is unique (ties across a partition
    boundary are otherwise ordered arbitrarily, as with any non-total order).
    """
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = W.partitionBy("_pid").orderBy(F.col(order_col))
    local = ranged.withColumn("_local", F.row_number().over(w_local))
    # one row per partition: the window below is over #partitions rows
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        # long, not int: this function exists FOR frames too big to window —
        # an int cast would silently wrap past 2^31-1 rows
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_local", "_off")
    )
