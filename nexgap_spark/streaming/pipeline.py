"""Streaming pipeline building blocks.

Reference mapping (SURVEY §2.11):
  T1 fixed late-data sleep (run_end_to_end.py:883-886)  → withWatermark
  T2 time-windowed ingestion (get_traces.py:93-133)     → event-time windows
  T3 per-record append sink (pipeline.py:1058-1060)     → append mode / foreachBatch
  T4 periodic state flush (tree_manager.py:390-392)     → checkpoint interval
  T5 flock-merged shared state (file_lock.py)           → stateful agg (no locks)
  T6 no-resume caveat (docs/workflow.md:274-276)        → checkpointing/WAL for free

Batch parquet directories drive the same code in tests via the memory sink +
processAllAvailable (single-JVM deterministic completion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexgap_spark.session import materialize
from pyspark.sql import types as T

# Historical note: the driver's events parquet has shipped as TIMESTAMP(NANOS)
# (read as nanosecond longs under nanosAsLong) and as plain timestamp[us]
# (read as TIMESTAMP_NTZ). The stream reader sniffs the REAL footer schema
# with a batch read — a wrong static schema silently coerces (a timestamp[us]
# column declared LongType reads raw µs, and the nanos→µs div then shrinks
# every timestamp 1000×) — and normalizes ts per-dtype, mirroring
# session.load_table.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based event stream (the production analog is Kafka; the source
    swap is one line, the transformations below are identical).

    ``path`` may be a directory or a single parquet file — the streaming
    file source requires a directory, so a file path becomes
    (parent, pathGlobFilter=name).

    When ``schema`` is None the footer schema of the existing files is used
    (one driver-side batch metadata read at query build — cheap and safe;
    an explicit schema is still accepted for empty-at-start directories)."""
    import os

    glob_filter = None
    if os.path.isfile(path):
        glob_filter = os.path.basename(path)
        path = os.path.dirname(path)
    # same guard as session.load_table (shared helper): nanosAsLong must be
    # set for the sniff to read TIMESTAMP(NANOS) files on a caller-supplied
    # session, and the NTZ cast below is value-identical only under UTC
    from nexgap_spark.operators.timeutil import normalize_ts_encoding, pin_utc_session

    pin_utc_session(spark)
    if schema is None:
        # public base class: covers classic AND connect subtypes (the
        # captured.* spelling misses Spark Connect's sibling subclass)
        from pyspark.errors import AnalysisException

        try:
            sniff = spark.read
            if glob_filter:
                sniff = sniff.option("pathGlobFilter", glob_filter)
            schema = sniff.parquet(path).schema
        except AnalysisException as e:
            # ONLY the empty-at-start stream directory (files arrive later)
            # falls back to the canonical events schema; any other read
            # failure (permissions, corrupt footer, encoding conf missing)
            # must surface at the sniff, not 10 minutes later mid-stream
            if "UNABLE_TO_INFER_SCHEMA" not in str(e):
                raise
            schema = EVENTS_STREAM_SCHEMA
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    return normalize_ts_encoding(reader.parquet(path))


def windowed_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "15 minutes",
    slide: str | None = None,
    watermark: str = "10 seconds",
) -> DataFrame:
    """T1+T2: watermarked tumbling/sliding window aggregation per event type.
    The 10-second default watermark is the reference's trace-recording wait
    (run_end_to_end.py:1089-1094) expressed as allowed lateness."""
    w = F.window(F.col(ts_col), window, slide)  # slide=None ≡ tumbling
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming twin of operators.sessionize: native session_window with the
    same 30-minute gap."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(user_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def append_jsonl_sink(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    trigger_seconds: int | None = None,
):
    """T3: incremental append sink via foreachBatch. AT-LEAST-ONCE: a crash
    between the batch write and the checkpoint commit replays the epoch and
    appends its rows again (foreachBatch's documented contract for
    non-idempotent writes). Use :func:`idempotent_jsonl_sink` when replays
    must not duplicate — its per-epoch overwrite + commit marker is the
    exactly-once variant. (The reference appends per record with no resume
    at all, so even this sink is strictly safer.)"""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("append").json(out_dir)

    writer = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def epoch_write_json(batch: DataFrame, epoch_id: int, out_dir: str) -> bool:
    """Idempotent per-epoch JSON write: each micro-batch lands in its own
    ``epoch=<id>/`` directory, overwrite mode, with a commit marker written
    last. A re-delivered epoch (task retry, post-crash replay from the
    checkpoint) is either skipped (marker present) or safely overwritten
    (partial dir without marker) — the exactly-once append the reference's
    per-record file appends can't give. Returns False when skipped.

    The marker goes through the Hadoop FileSystem of ``out_dir`` (same FS
    as the data write), so hdfs://, s3a://, and plain local paths all work —
    a driver-local ``open()`` would crash on the first epoch of any
    non-local sink."""
    spark = batch.sparkSession
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    target = f"{out_dir.rstrip('/')}/epoch={epoch_id}"
    marker_path = jvm.org.apache.hadoop.fs.Path(f"{target}/_COMMITTED")
    fs = marker_path.getFileSystem(conf)
    if fs.exists(marker_path):
        return False
    batch.write.mode("overwrite").json(target)
    fs.create(marker_path, True).close()
    return True


def idempotent_jsonl_sink(
    df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """T3+T6 with exactly-once output: foreachBatch + per-epoch idempotent
    writes. The checkpoint replays the failed epoch after a restart and
    `epoch_write_json` makes the replay a no-op."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        epoch_write_json(batch, epoch_id, out_dir)

    return (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """T5: the flock-guarded shared counter re-expressed as streaming state —
    update-mode running totals per user; the shuffle is the merge.

    No watermark: the grouping key carries no event-time column, so Spark
    would build no watermark predicate anyway — late rows are never dropped
    and state is NOT evicted; it grows with the number of distinct users
    (which is the operator's contract: totals live forever, like the
    reference's on-disk counter). A bounded-state variant is
    ``windowed_counts`` (window the groupBy) — use it when the key space
    is unbounded."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("total_value")
    )


def dedup_events(
    events: DataFrame,
    *,
    id_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming exact dedup (at-least-once delivery → effectively-once):
    drop re-deliveries of the same event id. dropDuplicatesWithinWatermark
    holds state only for the watermark horizon, so state is bounded by
    (arrival rate × lateness) instead of growing with the stream — the
    batch twin is q27's exact dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
SESSION_STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, total double"


def stateful_sessions(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` — the
    operator shape for session semantics the built-in ``session_window``
    can't express (per-session running aggregates carried in state, emission
    exactly when a session closes).

    State per user: (session_start_us, last_event_us, n_events, total_value).
    A session CLOSES either (a) in-data, when the next event arrives more
    than ``gap_minutes`` after the last one, or (b) at the event-time
    timeout, when the watermark passes last_event + gap with no new data.
    Only closed sessions are emitted (append mode), so results are stable
    under replay.

    Scale: state is O(active users) and keyed by the shuffle hash of
    ``user_col`` — the same partitioning contract as the batch twin
    (operators.sessionize); skew mitigation and state-store sizing follow
    the watermark, which bounds how long an idle session can hold state.

    Ordering contract: events for a key are processed in (batch, ts) order —
    correct when upstream delivery is time-ordered across micro-batches
    (tested: state carries across 4 time-ordered batches). For sources with
    cross-batch disorder, the buffered variant is the upgrade path: hold
    events in state until the watermark passes them, then sessionize only
    watermark-final prefixes (close when watermark > last + gap).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60_000_000)

    def _emit(user_id: int, sessions: list[tuple[int, int, int, float]]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.to_datetime(s[0], unit="us") for s in sessions],
                "session_end": [pd.to_datetime(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
                "total_value": [s[3] for s in sessions],
            }
        )

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield _emit(user_id, [(start_us, last_us, n, total)])
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values([ts_col, "event_id"] if "event_id" in rows else [ts_col])
        ts_us = rows[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        vals = rows["value"].fillna(0.0).to_numpy()

        start_us = last_us = None
        n, total = 0, 0.0
        if state.exists:
            start_us, last_us, n, total = state.get
        closed: list[tuple[int, int, int, float]] = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start_us is None:
                start_us, last_us, n, total = t, t, 1, float(v)
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n, total))
                start_us, last_us, n, total = t, t, 1, float(v)
            else:
                last_us, n, total = t, n + 1, total + float(v)
        state.update((int(start_us), int(last_us), int(n), float(total)))
        # close the open session once the watermark passes last + gap; clamp
        # above the current watermark — a key whose events lag the global
        # watermark (other keys advanced it past last+gap) would otherwise make
        # setTimeoutTimestamp throw and kill the streaming query
        timeout_ms = (int(last_us) + gap_us) // 1000
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))
        if closed:
            yield _emit(user_id, closed)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# v2 (round 15): the four comp_* fields are the compacted open-session
# prefix. A stream checkpointed on the v1 2-field schema cannot restart
# IN PLACE on this code (Spark's state-schema check rejects the layout
# change) — the TESTED upgrade path is migrate_buffered_sessions_checkpoint
# below (VERDICT r15 item 4): read the old state, replay it as the first
# input of a fresh-checkpoint v2 query.
BUFFERED_STATE_SCHEMA = (
    "comp_start bigint, comp_last bigint, comp_n bigint, comp_sum double, "
    "pending_ts array<bigint>, pending_val array<double>"
)
_V1_BUFFERED_STATE_FIELDS = ["pending_ts", "pending_val"]


def migrate_buffered_sessions_checkpoint(
    spark,
    checkpoint: str,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Upgrade path for v1 (2-field, pre-compaction) buffered-sessionizer
    checkpoints onto the v2 (compacted) state schema.

    Reads the STOPPED v1 query's keyed state through Spark's State Data
    Source (``spark.read.format("statestore")``) and returns the buffered
    raw events as a batch DataFrame ``(user_col, ts_col, value)``. v1 state
    is EXACTLY the not-yet-finalized raw events — no derived aggregates —
    so replaying these rows as the first input of a fresh-checkpoint v2
    query rebuilds the equivalent state (which v2 then compacts on first
    touch) with no emission loss and no duplication: sessions the v1 query
    already finalized were emitted before the stop and are absent from its
    state, and the replayed events re-sessionize identically because the
    new query's watermark restarts below every replayed timestamp.

    Workflow:
      1. stop the v1 query;
      2. ``seed = migrate_buffered_sessions_checkpoint(spark, old_ckpt)``;
      3. place ``seed`` at the FRONT of the new query's source (file
         source: write it as the oldest file of a fresh staging dir; Kafka:
         produce to a seed topic unioned ahead of the live topic);
      4. start ``stateful_sessions_buffered`` with a FRESH
         checkpointLocation, resuming the live feed from the old query's
         committed source offset (file source: only files the old commit
         log hadn't processed; Kafka: startingOffsets from the old
         checkpoint's commit log).

    Raises ValueError for a checkpoint whose state schema is not v1 — a v2
    checkpoint restarts in place and needs no migration."""
    st = spark.read.format("statestore").load(checkpoint)
    group_state = st.schema["value"].dataType["groupState"].dataType
    fields = [f.name for f in group_state.fields]
    if fields != _V1_BUFFERED_STATE_FIELDS:
        raise ValueError(
            f"checkpoint state schema {fields} is not the v1 buffered-"
            "sessionizer layout ['pending_ts', 'pending_val'] — a v2 "
            "checkpoint restarts in place; other operators' checkpoints "
            "have no migration here"
        )
    return (
        st.select(
            F.col(f"key.{user_col}").alias(user_col),
            F.col("value.groupState.pending_ts").alias("_ts"),
            F.col("value.groupState.pending_val").alias("_val"),
        )
        .select(user_col, F.explode(F.arrays_zip("_ts", "_val")).alias("_e"))
        .select(
            user_col,
            F.timestamp_micros(F.col("_e._ts")).alias(ts_col),
            F.col("_e._val").alias("value"),
        )
    )


def stateful_sessions_buffered(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
    watermark: str = "40 minutes",
) -> DataFrame:
    """Out-of-order-safe sessionization: the buffered upgrade of
    ``stateful_sessions``.

    Events are HELD in keyed state (ts, value arrays) and sessionized only
    once the watermark finalizes them: a session [first..last] is emitted
    exactly when ``watermark > last + gap`` — at that point no admissible
    future event can extend or split it, regardless of the order earlier
    events arrived in. Cross-batch disorder up to the watermark delay is
    therefore handled correctly; pick ``watermark`` ≥ gap + expected
    disorder so open sessions are never emitted prematurely.

    State per user is bounded by the watermark horizon — including for a
    session that NEVER closes. The round-15 soak measured the naive buffer
    growing without bound on exactly that workload (every user active more
    often than the gap: state memory +330 MB/min at a flat 5000 logical
    rows, batch latency 3 s → 14.5 s over 10 minutes, identical on RocksDB
    and the in-memory provider). The fix is prefix COMPACTION: buffered
    events older than the watermark are immutable — late rows below the
    watermark are filtered before reaching this function, and any future
    admissible event sorts after them — so the open session's sub-watermark
    prefix collapses into four scalars (start, last, n, Σvalue) with
    float-identical emission (the running sum accumulates in the same
    left-to-right order the naive buffer summed at emission time). Raw
    events are retained only while ts ≥ watermark; the compacted prefix
    never crosses a session boundary (a fully-compactable session with
    end < wm - gap would already have been emitted, and a session ending
    in (wm-gap, wm) forces the NEXT session to start above wm).
    The event-time timeout re-runs the flush when no new data arrives.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60_000_000)

    def _flush(user_id, agg, ts_arr, val_arr, wm_us):
        """Split the compacted-prefix aggregate + sorted pending events into
        gap-sessions; emit the finalized prefix; re-compact the retained
        open session's sub-watermark events. ``agg`` is (start, last, n,
        sum) or None. Returns (rows, new_agg, remaining_ts, remaining_val,
        next_flush_us) — next_flush_us drives the timeout timestamp."""
        order = sorted(range(len(ts_arr)), key=lambda i: ts_arr[i])
        # element = (start_us, end_us, n_events, value_sum); the aggregate
        # (if any) is by construction older than every raw event
        elems: list[tuple[int, int, int, float]] = [agg] if agg else []
        elems.extend(
            (int(ts_arr[i]), int(ts_arr[i]), 1, float(val_arr[i])) for i in order
        )
        sessions = []  # (start_idx, end_idx) inclusive, over elems
        start = 0
        for i in range(1, len(elems)):
            if elems[i][0] - elems[i - 1][1] > gap_us:
                sessions.append((start, i - 1))
                start = i
        if elems:
            sessions.append((start, len(elems) - 1))
        rows, keep_from, next_flush_us = [], len(elems), None
        for s, e in sessions:
            if wm_us > elems[e][1] + gap_us:
                total = 0.0
                n_ev = 0
                for el in elems[s : e + 1]:  # left-to-right, float-stable
                    n_ev += el[2]
                    total += el[3]
                rows.append(
                    {
                        "user_id": user_id,
                        "session_start": pd.to_datetime(elems[s][0], unit="us"),
                        "session_end": pd.to_datetime(elems[e][1], unit="us"),
                        "n_events": n_ev,
                        "total_value": total,
                    }
                )
            else:
                keep_from = s
                # earliest future instant the first open session can close
                next_flush_us = elems[e][1] + gap_us
                break
        # compact the maximal end<wm prefix of the retained elements (it
        # cannot cross a session boundary - see the docstring proof)
        new_agg = None
        rem_ts: list[int] = []
        rem_val: list[float] = []
        for el in elems[keep_from:]:
            if el[1] < wm_us and not rem_ts:
                new_agg = (
                    el
                    if new_agg is None
                    else (new_agg[0], el[1], new_agg[2] + el[2], new_agg[3] + el[3])
                )
            else:
                rem_ts.append(el[0])
                rem_val.append(el[3])
        return rows, new_agg, rem_ts, rem_val, next_flush_us

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        agg = None
        ts_arr: list[int] = []
        val_arr: list[float] = []
        if state.exists:
            c_start, c_last, c_n, c_sum, old_ts, old_val = state.get
            if c_n:
                agg = (int(c_start), int(c_last), int(c_n), float(c_sum))
            ts_arr, val_arr = list(old_ts), list(old_val)
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                ts_arr.extend(
                    int(t)
                    for t in pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
                )
                val_arr.extend(float(v) for v in pdf["value"].fillna(0.0))
        rows, new_agg, rem_ts, rem_val, next_flush_us = _flush(
            user_id, agg, ts_arr, val_arr, wm_us
        )
        if rem_ts or new_agg:
            a = new_agg or (0, 0, 0, 0.0)
            state.update((a[0], a[1], a[2], a[3], rem_ts, rem_val))
            # re-flush when the watermark passes the first open session's
            # last event + gap (guaranteed > current watermark, else the
            # session would have closed above)
            state.setTimeoutTimestamp(next_flush_us // 1000 + 1)
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "session_start", "session_end", "n_events", "total_value"
            ])

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_SCHEMA,
            BUFFERED_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    window_s: float = 3600.0,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Watermarked stream-stream inner join: purchases matched to a click by
    the same user within the preceding ``window_s``. The streaming twin of
    the batch funnel (plans/temporal.q64 via range_join).

    State stays bounded because BOTH sides carry watermarks AND the join
    condition time-bounds each side against the other: a buffered click can
    be dropped once the purchase-side watermark passes click_ts + window
    (no future purchase can match it), and vice versa. Without the range
    predicate the state would grow with stream length — the predicate is
    load-bearing, not an optimization.

    Emits one row per (purchase, matching click); dedup to distinct
    purchases downstream (same contract as the batch range_join)."""
    # microsecond interval: int(window_s) SECONDS would truncate fractional
    # windows (0.5 s → unsatisfiable zero-width range, 1800.5 → silently
    # 1800) and diverge from the batch range_join's µs arithmetic
    win_us = int(window_s * 1_000_000)
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    cond = F.expr(
        f"c_user = p_user AND click_ts >= purchase_ts - interval {win_us} microsecond"
        " AND click_ts < purchase_ts"
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", F.col("p_user").alias("user_id"), "purchase_ts", "click_ts"
    )


def enrich_stream_with_static(
    stream: DataFrame,
    dim: DataFrame,
    *,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich a stream against a batch dimension table.

    Stateless on the stream side — no watermark needed, every micro-batch
    hash-joins against the (broadcast) dimension snapshot. The dimension is
    re-resolvable per batch, so updating the underlying table between
    batches is visible without restarting the query. Keep the dim
    broadcast-small; a 100 TB dimension belongs on the stream-stream path
    with watermarks instead."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def run_batch_to_memory(stream_df: DataFrame, name: str, *, output_mode: str = "append"):
    """Test harness: drive the streaming query over all currently-available
    input and stop (deterministic single-JVM completion)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def read_committed_epochs(spark, out_dir: str, schema: str):
    """Union of all COMMITTED epoch dirs under ``out_dir`` (uncommitted
    partials from a mid-write crash are excluded — their epoch will be
    replayed and overwritten). Empty frame when the sink has no epochs yet."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = root.getFileSystem(conf)
    if not fs.exists(root):
        return spark.createDataFrame([], schema)
    dirs = [
        str(st.getPath())
        for st in fs.listStatus(root)
        if st.isDirectory()
        and st.getPath().getName().startswith("epoch=")
        and fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_COMMITTED"))
    ]
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(dirs)


def incremental_dedup_sink(
    docs: DataFrame,
    out_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pre_batch=None,
    post_batch=None,
):
    """Streaming twin of dedup.incremental_exact (T3+T6 + content dedup):
    each micro-batch is collapsed within itself and anti-joined against the
    cross-run digest ledger; fresh docs land in epoch-idempotent JSON dirs
    and the batch's new digests append to the ledger the same way.

    Exactly-once story: both writes go through epoch_write_json, so a
    replayed epoch is skipped (committed) or recomputed against the
    ledger-without-this-epoch — deterministic either way. Unlike
    dedup_events (id-based, watermark-bounded state), the digest ledger IS
    the state, persisted outside the stream: it survives restarts, spans
    runs, and its size is the count of distinct documents ever seen —
    exactly the batch pipeline's ledger, shared. At scale, swap the JSON
    epoch dirs for a table format; the contract (committed-epoch union,
    digest column) is unchanged.

    ``pre_batch(epoch_id)`` / ``post_batch(epoch_id)`` are optional
    driver-side hooks fired before the epoch's work and after BOTH epoch
    writes but BEFORE the stream commit — the window the fault harnesses
    (tools_cluster_stream.py) target with executor/driver kills."""
    from nexgap_spark.operators.dedup import incremental_exact, normalize_text

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        if pre_batch is not None:
            pre_batch(epoch_id)
        spark = batch.sparkSession
        seen = read_committed_epochs(spark, ledger_dir, "digest string")
        fresh, _ = incremental_exact(
            batch, seen, text_col=text_col, id_col=id_col
        )
        # ONE localCheckpoint materializes the dedup (and its ledger scan)
        # exactly once per epoch; the digest write is then a projection over
        # the checkpointed rows — each fresh row is exactly one content key,
        # so re-hashing its text reproduces incremental_exact's digest set
        # without re-executing the upstream plan (checkpointing both returned
        # DataFrames would run the whole dedup twice: eager per-DataFrame).
        fresh = materialize(fresh)
        new_digests = fresh.select(
            F.md5(normalize_text(text_col)).alias("digest")
        ).filter(F.col("digest").isNotNull())
        epoch_write_json(fresh, epoch_id, out_dir)
        epoch_write_json(new_digests, epoch_id, ledger_dir)
        if post_batch is not None:
            post_batch(epoch_id)

    return (
        docs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )


def use_rocksdb_state(
    spark: SparkSession,
    *,
    changelog_checkpointing: bool = True,
    bounded_memory_mb: int | None = None,
) -> None:
    """Flip streaming state storage to RocksDB with the measured
    best-practice knobs (SCALE.md round-11). The default HDFS-backed
    provider bounds state by executor heap; RocksDB moves it to local
    disk with identical semantics. Session-level SQL confs, read at query
    START — set before ``.start()``, no pipeline change needed.

    ``changelog_checkpointing``: on by default — per-batch full-SST
    uploads become an append-only changelog with async snapshots; the one
    knob that measurably moved the write-amp (−22 % on the stream-stream
    join at events ×100).

    Provider-selection rule (measured): operators whose state WRITES are
    proportional to the semantic horizon (windowed/session aggs, dedup,
    custom stateful) run within ~15 % of the memory provider — flip this
    on whenever state may outgrow heap. Stream-stream joins write every
    input row into state and pay ~3.5× even tuned; keep the default
    provider there while the join buffer fits heap."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # set EVERY knob explicitly both ways — conditional sets would make a
    # prior call's values sticky (a later use_rocksdb_state() with defaults
    # would silently inherit an earlier bounded_memory_mb cap)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if changelog_checkpointing else "false",
    )
    if bounded_memory_mb is not None:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true"
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
            str(bounded_memory_mb),
        )
    else:
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "false"
        )


def use_default_state(spark: SparkSession) -> None:
    """Back to the HDFS-backed in-memory provider (the twin of
    use_rocksdb_state, for tests and for the stream-stream-join rule).
    Clears the rocksdb.* knobs too so a later use_rocksdb_state starts
    from its own arguments, not leftovers."""
    for key in (
        "spark.sql.streaming.stateStore.providerClass",
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
    ):
        spark.conf.unset(key)
