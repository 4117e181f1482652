"""Structured Streaming module: drive parquet batches through the streaming
queries via the memory sink and cross-check against batch results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexgap_spark.operators.sessionize import sessionize
from nexgap_spark.session import load_table
from nexgap_spark.streaming import pipeline as SP
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_stream(spark):
    return SP.read_event_stream(spark, f"{SF_SMOKE}/events.parquet")



def _write_stream_chunk(d, i, frame, base=1_700_000_000):
    """Write one pandas chunk as the i-th file of a stream directory: pin
    the ts encoding to datetime64[us] (every file in the directory must
    share one parquet encoding — pandas Timedelta arithmetic upcasts to
    ns) and set ascending mtimes so the file source feeds oldest-first.
    (Own the frame first: some chunks are iloc slices, and mutating a
    slice view raises SettingWithCopyWarning.)"""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(d / f"{i}.parquet")
    frame = frame.copy()
    frame["ts"] = frame["ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(frame, preserve_index=False), p, version="2.6")
    os.utime(p, (base + 100 * i, base + 100 * i))


def _watermark_sentinel(pdf):
    """One far-future event (user_id -1, excluded from asserts) that drags
    the watermark past every real session + gap so ALL real sessions
    finalize."""
    import pandas as pd

    s = pdf.iloc[[0]].copy()
    s["user_id"] = -1
    s["event_id"] = 10**9
    s["ts"] = pdf["ts"].max() + pd.Timedelta(days=10)
    return s


def test_windowed_counts_matches_batch(spark, event_stream):
    # complete mode: append would (correctly) hold back the final open
    # window past the watermark, so totals could never equal the batch run
    q = SP.run_batch_to_memory(
        SP.windowed_counts(event_stream), "win_counts", output_mode="complete"
    )
    try:
        got = spark.sql(
            "SELECT event_type, CAST(SUM(n) AS BIGINT) AS n FROM win_counts GROUP BY event_type"
        ).collect()
        batch = (
            load_table(spark, SF_SMOKE, "events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert {(r.event_type, r.n) for r in got} == {(r.event_type, r.n) for r in batch}
    finally:
        q.stop()


def test_session_windows_match_batch_sessionize(spark, event_stream):
    q = SP.run_batch_to_memory(
        SP.session_windows(event_stream), "sess_win", output_mode="complete"
    )
    try:
        streaming_counts = spark.sql(
            "SELECT user_id, COUNT(*) AS n_sessions FROM sess_win GROUP BY user_id"
        ).collect()
        batch = (
            sessionize(
                load_table(spark, SF_SMOKE, "events"),
                gap_minutes=30,
                order_tiebreak="event_id",
            )
            .groupBy("user_id")
            .agg(F.countDistinct("session_id").alias("n_sessions"))
            .collect()
        )
        assert {(r.user_id, r.n_sessions) for r in streaming_counts} == {
            (r.user_id, r.n_sessions) for r in batch
        }
    finally:
        q.stop()


def test_running_totals_update_mode(spark, event_stream):
    q = SP.run_batch_to_memory(
        SP.running_user_totals(event_stream), "user_totals", output_mode="update"
    )
    try:
        got = spark.sql(
            "SELECT COUNT(DISTINCT user_id) AS u, CAST(SUM(n_events) AS BIGINT) AS n FROM user_totals"
        ).first()
        ev = load_table(spark, SF_SMOKE, "events")
        assert got.u == ev.select("user_id").distinct().count()
        assert got.n == ev.count()
    finally:
        q.stop()


def test_stateful_sessions_match_batch_closed_sessions(spark, event_stream):
    # Huge watermark delay => the watermark never advances past any session's
    # last event + gap, so no event-time timeout can fire and the emitted set
    # is EXACTLY the sessions closed in-data (a new event > gap later).
    # That equals the batch sessionization minus each user's final session
    # (still open in state) — a fully deterministic comparison.
    q = SP.run_batch_to_memory(
        SP.stateful_sessions(event_stream, watermark="3650 days"),
        "stateful_sess",
        output_mode="append",
    )
    try:
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
            for r in spark.sql("SELECT * FROM stateful_sess").collect()
        }
        sess = sessionize(
            load_table(spark, SF_SMOKE, "events"),
            gap_minutes=30,
            order_tiebreak="event_id",
        )
        per_session = sess.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("session_id").alias("sid"),
        )
        last_sid = sess.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
        closed = per_session.join(last_sid, "user_id").filter(
            F.col("sid") != F.col("last_sid")
        )
        want = {
            (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
            for r in closed.collect()
        }
        assert got == want
        assert len(got) > 0
    finally:
        q.stop()


def test_append_jsonl_sink(spark, event_stream, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg = SP.windowed_counts(event_stream)
    q = SP.append_jsonl_sink(agg, out, ckpt)
    q.processAllAvailable()
    q.stop()
    written = spark.read.json(out)
    assert written.count() > 0
    assert "event_type" in written.columns


def test_stream_dedup_events(spark, tmp_path):
    # duplicate every event, stream the result, dedup by event_id
    ev = load_table(spark, SF_SMOKE, "events")
    dup_path = str(tmp_path / "dup_events")
    ev.unionByName(ev).write.parquet(dup_path)
    # this parquet was written with ts already a µs timestamp, not the raw
    # nanos-long layout the default stream schema models
    stream = SP.read_event_stream(spark, dup_path, schema=ev.schema)
    q = SP.run_batch_to_memory(SP.dedup_events(stream), "dedup_ev")
    try:
        got = spark.sql("SELECT COUNT(*) AS n FROM dedup_ev").first().n
        assert got == ev.count()
    finally:
        q.stop()


def test_idempotent_sink_skips_committed_epoch(spark, event_stream, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = SP.idempotent_jsonl_sink(SP.windowed_counts(event_stream), out, ckpt)
    q.processAllAvailable()
    q.stop()
    written = spark.read.json(out)
    n = written.count()
    assert n > 0
    # replaying a committed epoch is a no-op; an uncommitted partial epoch
    # is overwritten, not appended
    batch = written.limit(5)
    assert SP.epoch_write_json(batch, 0, out) is False
    assert spark.read.json(out).count() == n


def test_stateful_sessions_state_carries_across_batches(spark, tmp_path):
    # Split events into 4 time-ordered files with ascending mtimes: the file
    # source (oldest-first) feeds them as 4 micro-batches, so most users'
    # sessions span batch boundaries and MUST be carried in state. Same
    # huge-watermark trick as the single-batch test => closed set is exactly
    # the in-data-closed sessions.
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/events.parquet")
    tbl = tbl.sort_by("ts")
    d = tmp_path / "chunks"
    d.mkdir()
    n = tbl.num_rows
    base = 1_700_000_000
    for i in range(4):
        chunk = tbl.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
        p = str(d / f"{i}.parquet")
        pq.write_table(chunk, p, version="2.6")
        os.utime(p, (base + 100 * i, base + 100 * i))

    stream = SP.read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = SP.run_batch_to_memory(
        SP.stateful_sessions(stream, watermark="3650 days"), "mb_sess"
    )
    try:
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        assert n_batches >= 4
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM mb_sess").collect()
        }
        sess = sessionize(
            load_table(spark, SF_SMOKE, "events"),
            gap_minutes=30,
            order_tiebreak="event_id",
        )
        per_session = sess.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        last = sess.groupBy("user_id").agg(F.max("session_id").alias("last_sid"))
        want = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in per_session.join(last, "user_id").filter(
                F.col("session_id") != F.col("last_sid")
            ).collect()
        }
        assert got == want
        assert len(got) > 0
    finally:
        q.stop()


def test_buffered_sessions_handle_cross_batch_disorder(spark, tmp_path):
    # Four time-chunked files, but each chunk's tail rows are SHIFTED into
    # the next file (bounded cross-batch disorder < the 40-minute
    # watermark delay). A 5th file holds one far-future sentinel event that
    # drags the watermark past every real session + gap, so ALL real
    # sessions finalize. The buffered operator must reconstruct batch
    # sessionization exactly despite the disorder.
    import time as _time

    import pandas as pd
    import pyarrow.parquet as pq

    pdf = pq.read_table(f"{SF_SMOKE}/events.parquet").sort_by("ts").to_pandas()
    n = len(pdf)
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    chunks = [pdf.iloc[bounds[i] : bounds[i + 1]].copy() for i in range(4)]
    shifted, carry = [], None
    for i, c in enumerate(chunks):
        if carry is not None:
            c = pd.concat([carry, c])
        if i < 3:
            carry = c.iloc[-50:]
            c = c.iloc[:-50]
        shifted.append(c)
    d = tmp_path / "ooo"
    d.mkdir()
    for i, c in enumerate(shifted + [_watermark_sentinel(pdf)]):
        _write_stream_chunk(d, i, c)

    stream = SP.read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = SP.run_batch_to_memory(
        SP.stateful_sessions_buffered(stream, watermark="40 minutes"), "buf_sess"
    )
    try:
        sess = sessionize(
            load_table(spark, SF_SMOKE, "events"),
            gap_minutes=30,
            order_tiebreak="event_id",
        )
        want_rows = (
            sess.groupBy("user_id", "session_id")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count("*").alias("n_events"),
            )
            .collect()
        )
        want = {
            (r.user_id, r.session_start, r.session_end, r.n_events) for r in want_rows
        }
        # final flushes ride the post-sentinel no-data microbatch — poll
        for _ in range(60):
            if spark.sql("SELECT COUNT(*) n FROM buf_sess").first().n >= len(want):
                break
            _time.sleep(0.5)
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM buf_sess WHERE user_id >= 0").collect()
        }
        assert got == want
    finally:
        q.stop()


def test_hopping_windowed_counts_match_batch(spark, event_stream):
    # sliding windows in the streaming path must equal the batch
    # hopping_window_agg on the same file: every event in exactly
    # window/slide = 3 windows, identical (window_start, n) sets
    from nexgap_spark.operators import timeseries

    q = SP.run_batch_to_memory(
        SP.windowed_counts(event_stream, window="15 minutes", slide="5 minutes"),
        "hop_counts",
        output_mode="complete",
    )
    try:
        got = {
            (r.ws, r.n)
            for r in spark.sql(
                "SELECT CAST(unix_timestamp(window_start) AS BIGINT) AS ws,"
                " CAST(SUM(n) AS BIGINT) AS n FROM hop_counts GROUP BY 1"
            ).collect()
        }
        batch = {
            (r.window_start, r.n)
            for r in timeseries.hopping_window_agg(
                load_table(spark, SF_SMOKE, "events"),
                window="15 minutes",
                slide="5 minutes",
                aggs=[F.count("*").alias("n")],
            ).collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_stream_stream_conversions_match_batch_funnel(spark, event_stream):
    # stream-stream range join must find exactly the purchases the batch
    # range_join converts (same file, same window)
    from nexgap_spark.operators.temporal_join import range_join

    clicks = event_stream.filter(F.col("event_type") == "click")
    purchases = event_stream.filter(F.col("event_type") == "purchase")
    q = SP.run_batch_to_memory(
        SP.stream_stream_conversions(clicks, purchases), "conv_pairs"
    )
    try:
        got = {
            r.purchase_id
            for r in spark.sql("SELECT DISTINCT purchase_id FROM conv_pairs").collect()
        }
        ev = load_table(spark, SF_SMOKE, "events")
        batch = {
            r.event_id
            for r in range_join(
                ev.filter(F.col("event_type") == "purchase").select(
                    "event_id", "user_id", "ts"
                ),
                ev.filter(F.col("event_type") == "click").select("user_id", "ts"),
                on="user_id",
                window_s=3600.0,
                suffix="_c",
            ).select("event_id").distinct().collect()
        }
        assert got == batch and len(batch) > 0
    finally:
        q.stop()


def test_stream_static_enrichment_matches_batch(spark, event_stream):
    # stream-static join: per-batch hash join against a broadcast dim;
    # result totals equal the batch join on the same file
    ev = load_table(spark, SF_SMOKE, "events")
    dim = ev.select("user_id").distinct().withColumn(
        "segment", (F.col("user_id") % 3).cast("int")
    )
    q = SP.run_batch_to_memory(
        SP.enrich_stream_with_static(event_stream, dim, on="user_id"), "enriched"
    )
    try:
        got = {
            (r.segment, r.n)
            for r in spark.sql(
                "SELECT segment, CAST(COUNT(*) AS BIGINT) AS n FROM enriched GROUP BY 1"
            ).collect()
        }
        batch = {
            (r.segment, r.n)
            for r in ev.join(dim, "user_id")
            .groupBy("segment")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == batch and len(batch) == 3
    finally:
        q.stop()


def test_read_event_stream_empty_dir_falls_back(spark, tmp_path):
    # an empty-at-start stream dir must build (files arrive later), using
    # the canonical events schema when there is nothing to sniff
    d = tmp_path / "empty_stream"
    d.mkdir()
    stream = SP.read_event_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    q = SP.run_batch_to_memory(
        SP.windowed_counts(stream), "empty_stream_counts"
    )
    try:
        assert spark.sql("SELECT COUNT(*) n FROM empty_stream_counts").first().n == 0
    finally:
        q.stop()


def test_stream_stream_fractional_window(spark, event_stream):
    # window_s below one second must stay a real (microsecond) interval —
    # int-second truncation made it a zero-width unsatisfiable range.
    # A sub-second window over minute-spaced synthetic events matches
    # nothing, but the query must be buildable and the batch twin must
    # agree on a fractional window that DOES select (1800.5 s).
    from nexgap_spark.operators.temporal_join import range_join

    clicks = event_stream.filter(F.col("event_type") == "click")
    purchases = event_stream.filter(F.col("event_type") == "purchase")
    q = SP.run_batch_to_memory(
        SP.stream_stream_conversions(clicks, purchases, window_s=1800.5),
        "conv_frac",
    )
    try:
        got = {
            r.purchase_id
            for r in spark.sql("SELECT DISTINCT purchase_id FROM conv_frac").collect()
        }
        ev = load_table(spark, SF_SMOKE, "events")
        batch = {
            r.event_id
            for r in range_join(
                ev.filter(F.col("event_type") == "purchase").select(
                    "event_id", "user_id", "ts"
                ),
                ev.filter(F.col("event_type") == "click").select("user_id", "ts"),
                on="user_id",
                window_s=1800.5,
                suffix="_c",
            ).select("event_id").distinct().collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_incremental_dedup_sink_across_runs(spark, tmp_path):
    # streaming twin of dedup.incremental_exact: content dedup against a
    # persistent digest ledger, across a stream RESTART (T6)
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    ledger, ckpt = str(tmp_path / "ledger"), str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, None)], schema
    )
    b1.write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = SP.incremental_dedup_sink(stream, out, ledger, ckpt)
    q.processAllAvailable()
    q.stop()
    assert {r.doc_id for r in spark.read.schema(schema).json(out + "/epoch=*").collect()} == {1, 2, 3}

    # run 2 after restart: content dups of run 1 (different ids) must be
    # dropped by the persisted ledger; genuinely new content passes
    b2 = spark.createDataFrame(
        [(10, "alpha  BETA"), (11, "delta"), (12, None)], schema
    )
    b2.write.mode("append").parquet(in_dir)
    stream2 = spark.readStream.schema(schema).parquet(in_dir)
    q2 = SP.incremental_dedup_sink(stream2, out, ledger, ckpt)
    q2.processAllAvailable()
    q2.stop()
    kept = {r.doc_id for r in spark.read.schema(schema).json(out + "/epoch=*").collect()}
    # 10 is a normalized dup of 1; 11 new; 12 NULL text passes through
    assert kept == {1, 2, 3, 11, 12}
    digests = SP.read_committed_epochs(spark, ledger, "digest string")
    assert digests.count() == 3  # alpha-beta, gamma, delta — NULLs never ledger


def test_rocksdb_state_provider_helper(spark, event_stream, tmp_path):
    """use_rocksdb_state flips the provider + changelog knobs session-wide
    (read at query start), and a stateful query produces the SAME result
    under RocksDB as under the default provider."""
    # default-provider baseline
    base = SP.run_batch_to_memory(SP.windowed_counts(event_stream), "rk_base")
    base.processAllAvailable(); base.stop()
    want = sorted(tuple(r) for r in spark.sql("select * from rk_base").collect())

    SP.use_rocksdb_state(spark, changelog_checkpointing=True, bounded_memory_mb=512)
    try:
        assert "RocksDBStateStoreProvider" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ) == "true"
        q = SP.run_batch_to_memory(SP.windowed_counts(event_stream), "rk_rocks")
        q.processAllAvailable(); q.stop()
        got = sorted(tuple(r) for r in spark.sql("select * from rk_rocks").collect())
        assert got == want and len(got) > 0
    finally:
        SP.use_default_state(spark)


def test_buffered_sessions_survive_checkpoint_restart(spark, tmp_path):
    """T6 for the stateful operator itself (r14): stop the buffered
    sessionization query MID-STREAM (open sessions held only in the state
    store), restart from the same checkpoint over the remaining files, and
    require the union of emitted sessions to equal uninterrupted batch
    sessionization — state recovery, no duplicate and no lost sessions."""
    import time as _time

    import pyarrow.parquet as pq

    pdf = pq.read_table(f"{SF_SMOKE}/events.parquet").sort_by("ts").to_pandas()
    n = len(pdf)
    chunks = [pdf.iloc[: n // 2].copy(), pdf.iloc[n // 2 :].copy()]
    d = tmp_path / "in"
    d.mkdir()

    def write_chunk(i, c):
        _write_stream_chunk(d, i, c)

    out, ckpt = str(tmp_path / "sess_out"), str(tmp_path / "ckpt")
    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )

    def start():
        stream = SP.read_event_stream(spark, str(d), max_files_per_trigger=1)
        sess = SP.stateful_sessions_buffered(stream, watermark="40 minutes")
        return (
            sess.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda b, eid: SP.epoch_write_json(b, eid, out))
            .start()
        )

    # run 1: first half only — most sessions remain OPEN in the state store
    write_chunk(0, chunks[0])
    q = start()
    q.processAllAvailable()
    q.stop()

    # run 2 from the same checkpoint: second half + the watermark sentinel
    write_chunk(1, chunks[1])
    write_chunk(2, _watermark_sentinel(pdf))
    q2 = start()
    q2.processAllAvailable()
    # final flushes ride post-sentinel no-data microbatches — poll
    want_df = (
        sessionize(
            load_table(spark, SF_SMOKE, "events"),
            gap_minutes=30,
            order_tiebreak="event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    def _ms(dt):
        # the JSON epoch sink serializes timestamps at millisecond
        # precision; truncate the batch reference to compare like-for-like
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)

    want = {
        (r.user_id, _ms(r.session_start), _ms(r.session_end), r.n_events)
        for r in want_df.collect()
    }
    got_rows: list = []
    for _ in range(60):
        got_rows = (
            SP.read_committed_epochs(spark, out, schema)
            .filter("user_id >= 0")
            .collect()
        )
        if len(got_rows) >= len(want):
            break
        _time.sleep(0.5)
    q2.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in got_rows
    }
    assert got == want  # no lost sessions, exact boundaries
    # the duplicate check must count ROWS (a set would collapse a session
    # re-emitted after restart — the canonical state-not-cleared failure)
    assert len(got_rows) == len(want)


def test_buffered_sessions_compact_never_closing_session(spark, tmp_path):
    """Round-15 soak finding: a session that NEVER closes (every event
    within the gap of the previous) used to keep ALL its raw events in
    state — unbounded growth at flat logical rows. The compaction fix
    collapses the sub-watermark prefix into (start, last, n, sum) scalars.
    This drives one user through MANY micro-batches of a single unbroken
    session (so the state round-trips through the compacted tuple across
    flush cycles), then closes it: the emitted session must match the
    batch sessionizer exactly — boundaries, count, and float-identical
    total_value."""
    import pandas as pd

    from nexgap_spark.operators.sessionize import sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    # one event per minute for 300 minutes: gap 5 min never fires inside
    rows = pd.DataFrame(
        {
            "event_id": range(300),
            "user_id": [7] * 300,
            "event_type": ["e"] * 300,
            "ts": [base + pd.Timedelta(minutes=i) for i in range(300)],
            "value": [float((i * 13) % 97) / 7.0 for i in range(300)],
        }
    )
    d = tmp_path / "in"
    d.mkdir()
    # 10 chunks of 30 events -> >= 10 micro-batches (maxFilesPerTrigger=1)
    for i in range(10):
        _write_stream_chunk(d, i, rows.iloc[i * 30 : (i + 1) * 30])
    _write_stream_chunk(d, 10, _watermark_sentinel(rows))

    out = str(tmp_path / "out")
    stream = SP.read_event_stream(spark, str(d), max_files_per_trigger=1)
    sess = SP.stateful_sessions_buffered(
        stream, gap_minutes=5, watermark="10 minutes"
    )
    q = (
        sess.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda b, eid: SP.epoch_write_json(b, eid, out))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    got = [
        r
        for r in spark.read.schema(schema).json(out + "/epoch=*").collect()
        if r.user_id == 7
    ]
    assert len(got) == 1, got
    batch = spark.createDataFrame(rows)
    want = (
        sessionize(batch, gap_minutes=5, order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    assert len(want) == 1
    g, w = got[0], want[0]
    assert g.n_events == w.n_events == 300
    assert g.session_start == w.session_start
    assert g.session_end == w.session_end
    # compaction accumulates the running sum in the same left-to-right
    # event-time order the naive buffer summed at emission: identical float
    assert g.total_value == sum(
        float((i * 13) % 97) / 7.0 for i in range(300)
    )


def test_soak_artifact_fixed_is_flat():
    """The committed post-compaction soak (SOAK_r15_fixed.json) must show
    the fix holding: flat batch latency and flat state rows at the full
    configured rate, under RocksDB."""
    import json as _json
    import os as _os

    import pytest as _pytest

    path = "/root/repo/SOAK_r15_fixed.json"
    if not _os.path.exists(path):
        _pytest.skip("SOAK_r15_fixed.json not yet committed")
    with open(path) as f:
        s = _json.load(f)["soak_sessions"]
    assert s["rocksdb_used"] is True
    assert s["state_rows_flat"] is True
    assert s["batch_ms_flat"] is True
    # throughput held the configured rate in every steady minute
    for row in s["curve"][1:]:
        assert row["rows_per_sec"] >= 0.9 * s["configured_rate"], row


def test_v1_checkpoint_migrates_to_compacted_sessionizer(spark, tmp_path):
    """VERDICT r15 item 4: the r15 prefix-compaction changed
    BUFFERED_STATE_SCHEMA to v2, which a v1 checkpoint cannot restart on
    in place. migrate_buffered_sessions_checkpoint is the tested upgrade:
    build a GENUINE v1 checkpoint (the pre-fix buffer-everything state
    layout, reimplemented below), stop mid-stream with open sessions in
    state, read the state back through the State Data Source, and replay
    it as the first input of a fresh-checkpoint v2 query. Invariant
    (robust to timeout-batch timing): v1 emissions ∪ v2 emissions ==
    the batch sessionizer over ALL events — every session exactly once,
    exact boundaries/counts/totals (values are exact binary fractions, so
    any summation order gives identical floats)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from nexgap_spark.operators.sessionize import sessionize

    base = pd.Timestamp("2024-01-01 00:00:00")
    mk = lambda lo, hi: pd.DataFrame(
        {
            "user_id": [7] * (hi - lo),
            "ts": [base + pd.Timedelta(minutes=m) for m in range(lo, hi)],
            "value": [float(m) * 0.25 for m in range(lo, hi)],
        }
    )
    # three gap-5min sessions: A=min 0-9, B=min 60-69, C=min 120-129
    sess_a, sess_b = mk(0, 10), mk(60, 70)
    sess_c_head, sess_c_tail = mk(120, 121), mk(121, 130)
    all_events = pd.concat(
        [sess_a, sess_b, sess_c_head, sess_c_tail], ignore_index=True
    )

    # --- phase 1: the PRE-FIX v1 sessionizer (2-field raw-buffer state) ---
    gap_us = 5 * 60 * 1_000_000

    def fn_v1(key, pdf_iter, state):
        (uid,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        ts, val = [], []
        if state.exists:
            t0, v0 = state.get
            ts, val = list(t0), list(v0)
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                ts.extend(
                    int(t)
                    for t in pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                )
                val.extend(float(v) for v in pdf["value"].fillna(0.0))
        order = sorted(range(len(ts)), key=lambda i: ts[i])
        ts, val = [ts[i] for i in order], [val[i] for i in order]
        bounds, start = [], 0
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > gap_us:
                bounds.append((start, i - 1))
                start = i
        if ts:
            bounds.append((start, len(ts) - 1))
        rows, keep_from = [], len(ts)
        for s, e in bounds:
            if wm_us > ts[e] + gap_us:
                rows.append(
                    {
                        "user_id": uid,
                        "session_start": pd.to_datetime(ts[s], unit="us"),
                        "session_end": pd.to_datetime(ts[e], unit="us"),
                        "n_events": e - s + 1,
                        "total_value": float(sum(val[s : e + 1])),
                    }
                )
            else:
                keep_from = s
                break
        rem_ts, rem_val = ts[keep_from:], val[keep_from:]
        if rem_ts:
            state.update((rem_ts, rem_val))
            state.setTimeoutTimestamp((rem_ts[-1] + gap_us) // 1000 + 1)
        else:
            state.remove()
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value",
                ],
            )

    d1 = tmp_path / "in_v1"
    d1.mkdir()
    _write_stream_chunk(d1, 0, sess_a)
    _write_stream_chunk(d1, 1, sess_b)
    _write_stream_chunk(d1, 2, sess_c_head)
    out1 = str(tmp_path / "out_v1")
    ck1 = str(tmp_path / "ckpt_v1")
    q1 = (
        SP.read_event_stream(spark, str(d1), max_files_per_trigger=1)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn_v1,
            SP.SESSION_OUTPUT_SCHEMA,
            "pending_ts array<bigint>, pending_val array<double>",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck1)
        .foreachBatch(lambda b, eid: SP.epoch_write_json(b, eid, out1))
        .start()
    )
    q1.processAllAvailable()
    q1.stop()

    # --- migrate: v1 state -> replayable raw events ---
    seed = SP.migrate_buffered_sessions_checkpoint(spark, ck1)
    seed_pd = seed.toPandas()
    assert len(seed_pd) > 0, "v1 checkpoint should hold open-session events"

    # --- phase 2: fresh-checkpoint v2 query, seed FIRST then the rest ---
    d2 = tmp_path / "in_v2"
    d2.mkdir()
    _write_stream_chunk(d2, 0, seed_pd)
    _write_stream_chunk(d2, 1, sess_c_tail)
    _write_stream_chunk(d2, 2, _watermark_sentinel(all_events.assign(event_id=0)))
    out2 = str(tmp_path / "out_v2")
    q2 = (
        SP.stateful_sessions_buffered(
            SP.read_event_stream(spark, str(d2), max_files_per_trigger=1),
            gap_minutes=5,
            watermark="10 minutes",
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_v2"))
        .foreachBatch(lambda b, eid: SP.epoch_write_json(b, eid, out2))
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    got = []
    for out in (out1, out2):
        got.extend(
            (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
            for r in spark.read.schema(schema).json(out + "/epoch=*").collect()
            if r.user_id == 7
        )
    assert len(got) > len(
        [r for r in spark.read.schema(schema).json(out1 + "/epoch=*").collect()
         if r.user_id == 7]
    ), "the migrated v2 query must emit the sessions the v1 state held"
    want = (
        sessionize(
            spark.createDataFrame(all_events.assign(event_id=range(len(all_events)))),
            gap_minutes=5,
            order_tiebreak="event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    )
    want_set = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in want
    }
    assert len(want) == 3
    assert sorted(got) == sorted(want_set), (got, want_set)

    # a v2 checkpoint must be REFUSED (it restarts in place)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not the v1"):
        SP.migrate_buffered_sessions_checkpoint(spark, str(tmp_path / "ckpt_v2"))
