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
from pyspark.sql import types as T

# The driver's events parquet stores TIMESTAMP(NANOS), which Spark reads as
# nanosecond longs (see session.py nanosAsLong); the stream reader converts
# to a µs timestamp after the scan, mirroring session.load_table.
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
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
    schema: T.StructType = EVENTS_STREAM_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based event stream (the production analog is Kafka; the source
    swap is one line, the transformations below are identical).

    ``path`` may be a directory or a single parquet file — the streaming
    file source requires a directory, so a file path becomes
    (parent, pathGlobFilter=name)."""
    import os

    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


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
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
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
    """T3+T6: incremental append sink with exactly-once bookkeeping via
    foreachBatch (the reference appends per record with no resume; the
    checkpoint gives restart-safety for free)."""

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


def running_user_totals(events: DataFrame, *, watermark: str = "10 seconds") -> DataFrame:
    """T5: the flock-guarded shared counter re-expressed as streaming state —
    update-mode running totals per user; the shuffle is the merge."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )


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
