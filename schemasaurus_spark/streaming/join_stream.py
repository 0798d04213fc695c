"""Watermarked stream-stream interval join — the last Structured
Streaming join shape the engine lacked (the others covered: stream x
static broadcast in incremental_stream, stateful dedup, windowed/session
aggregation, per-batch monitors).  No reference counterpart — §2E streaming family
(the reference is a single-process schema walker with no event time).

Use case here: ATTRIBUTION between two live event flows — each 'view'
joined to the same user's 'purchase' arriving within ``max_delay``
afterwards (equally: an ingest-announcement stream correlated with the
validation-verdict stream of the same pipeline, matched per doc batch
within its processing SLA).

Why this needs the dedicated machinery: joining two UNBOUNDED inputs
requires buffering both sides; unbounded buffering is a leak.  The
watermarks plus the time-RANGE join condition are exactly what Spark
uses to derive a state-eviction bound (a buffered view can be dropped
once the purchase-side watermark passes ``view_ts + max_delay``; a
buffered purchase once the view-side watermark passes its ts) — so state
is bounded by delay x rate, not by stream length.  Rows later than their
side's watermark are dropped (the same bounded-state trade the windowed
aggregation documents).

Batch parity: ``attribution_join`` on batch frames is the identical join
expression (watermarks are no-ops), and the test contract asserts
stream == batch over on-time rows — the family's standard discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["attribution_join", "stream_attribution_join"]


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Inner interval join: every (view, purchase) pair of the same user
    with ``view.ts < purchase.ts <= view.ts + max_delay``.  Output:
    (user_id, view_ts, purchase_ts, latency_seconds).  ALL pairs in the
    interval match (attribution fan-out is the declared semantics; a
    first-touch reduction is a downstream groupBy)."""
    v = views.withWatermark(ts_col, watermark_delay).select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("view_ts")
    )
    p = purchases.withWatermark(ts_col, watermark_delay).select(
        F.col(user_col).alias("p_user"), F.col(ts_col).alias("purchase_ts")
    )
    return v.join(
        p,
        F.expr(
            "user_id = p_user AND purchase_ts > view_ts "
            f"AND purchase_ts <= view_ts + INTERVAL {max_delay}"
        ),
        "inner",
    ).select(
        "user_id",
        "view_ts",
        "purchase_ts",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).alias("latency_seconds"),
    )


def stream_attribution_join(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    source_schema=None,
    max_delay: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """Start the attribution-join stream over the events directory
    (views and purchases are two filtered readers of the same source);
    returns the StreamingQuery.  ``availableNow`` + checkpoint = the
    restart-stable incremental mode the streaming family standardizes
    on; the parquet sink's transaction log gives exactly-once."""
    if source_schema is None:
        source_schema = spark.read.parquet(input_dir).schema

    def _reader():
        return (
            spark.readStream.schema(source_schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
        )

    joined = attribution_join(
        _reader().where(F.col("event_type") == "view"),
        _reader().where(F.col("event_type") == "purchase"),
        max_delay,
        watermark_delay,
    )
    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/attributions")
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
