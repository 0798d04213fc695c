"""Event-time windowed aggregation with watermarked late-data handling —
the Structured-Streaming windowing path of the engine (tumbling windows
over the events stream: per-window, per-type counts + value sums).

Semantics and scale design:

* **Event time, not arrival time**: windows key on the ``ts`` column, so
  replays and out-of-order ingest land in the right window.
* **Watermark bounds state**: ``withWatermark(ts, delay)`` lets Spark
  evict window state once the watermark (max observed event time − delay)
  passes a window's end — without it, a continuously-ingesting pipeline
  accumulates every window ever seen.  Rows later than the watermark are
  dropped (the documented trade: bounded state for bounded lateness).
* **Append output mode**: a window row is emitted exactly once, when it
  can no longer change.  The parquet file sink's transaction log
  (``_spark_metadata``) makes that exactly-once end-to-end — a replayed
  micro-batch's files are ignored by readers, so no manual batch_id
  idempotence dance is needed (contrast ``validate_stream``'s
  foreachBatch sinks, which need it).
* The same ``windowed_counts`` transform runs unchanged on a batch
  DataFrame (watermark is a no-op there) — batch/stream parity is the
  test contract, mirroring the batch-vs-stream parity the validation
  stream asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling event-time windows: (window_start, window_end, event_type,
    n_events, sum_value).  On a stream the watermark drops rows more than
    ``watermark_delay`` late and evicts completed windows' state; on a
    batch frame the same expression is a plain groupBy."""
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows (``F.session_window``): sessions close
    after ``gap`` of per-user silence.  Output: (user, session_start,
    session_end, n_events, sum_value) with ``session_end`` = LAST event's
    timestamp (session_window's native end is ``max(ts) + gap``; we
    subtract the gap back so batch gaps-and-islands sessionization
    — operators/sessionize.py — and this streaming path emit identical
    rows; test_streaming asserts that equality on the events table).

    On a stream, state for a user's open session is evicted once the
    watermark passes ``session_end + gap``; append mode emits each
    session exactly once when it can no longer extend."""
    w = F.session_window(F.col(ts_col), gap).alias("w")
    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(w, F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap}")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_session_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    source_schema=None,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """Start the session-window stream (availableNow drain; parquet sink's
    transaction log gives exactly-once, same contract as
    stream_windowed_counts)."""
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = session_counts(stream, gap, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/sessions")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    source_schema=None,
    window_duration: str = "10 minutes",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """Start the windowed-aggregation stream; returns the StreamingQuery.

    ``availableNow`` drains the current files and stops — rerunning after
    new files land resumes from the checkpoint with the watermark
    restored, so lateness decisions are stable across restarts (the
    testable mode, and the incremental-backfill mode).
    ``max_files_per_trigger=1`` keeps micro-batches file-sized so the
    watermark advances between files instead of jumping once per drain."""
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = windowed_counts(stream, window_duration, watermark_delay)
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/windows")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
