"""Stream-stream interval join (streaming/join_stream.py): stream ==
batch over on-time rows, interval bounds respected, fan-out semantics,
and late rows dropped after the watermark passes (bounded-state trade)."""

from pyspark.sql import functions as F

from schemasaurus_spark.streaming.join_stream import (
    attribution_join,
    stream_attribution_join,
)


def _events(spark, rows):
    """rows: (user_id, ts_str, event_type)"""
    return (
        spark.createDataFrame(rows, ["user_id", "ts_s", "event_type"])
        .select(
            "user_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
            F.lit(1.0).alias("value"),
        )
        .coalesce(1)
    )


ON_TIME = [
    (1, "2024-01-01 00:01:00", "view"),
    (1, "2024-01-01 00:05:00", "purchase"),  # joins: 4 min after the view
    (1, "2024-01-01 00:50:00", "purchase"),  # outside 30-min interval
    (2, "2024-01-01 00:02:00", "view"),      # no purchase at all
    (3, "2024-01-01 00:03:00", "purchase"),  # no prior view
    (4, "2024-01-01 00:10:00", "purchase"),
    (4, "2024-01-01 00:11:00", "view"),      # purchase BEFORE view: no join
    (5, "2024-01-01 00:04:00", "view"),
    (5, "2024-01-01 00:06:00", "purchase"),  # joins
    (5, "2024-01-01 00:08:00", "purchase"),  # ALSO joins (fan-out semantics)
]


def _batch_pairs(spark, rows):
    ev = _events(spark, rows)
    out = attribution_join(
        ev.where("event_type = 'view'"), ev.where("event_type = 'purchase'")
    ).collect()
    return {
        (r.user_id, str(r.view_ts), str(r.purchase_ts), r.latency_seconds)
        for r in out
    }


EXPECTED = {
    (1, "2024-01-01 00:01:00", "2024-01-01 00:05:00", 240),
    (5, "2024-01-01 00:04:00", "2024-01-01 00:06:00", 120),
    (5, "2024-01-01 00:04:00", "2024-01-01 00:08:00", 240),
}


def test_batch_join_interval_and_fanout(spark):
    assert _batch_pairs(spark, ON_TIME) == EXPECTED


def test_stream_matches_batch_and_drops_late(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    _events(spark, ON_TIME).write.mode("append").parquet(in_dir)
    # watermark advancer on BOTH sides (a view and a purchase at 02:00):
    # watermark -> 01:30, far past every on-time row + interval
    _events(
        spark,
        [(9, "2024-01-01 02:00:00", "view"), (9, "2024-01-01 02:00:01", "purchase")],
    ).write.mode("append").parquet(in_dir)

    q = stream_attribution_join(spark, in_dir, out_dir)
    q.awaitTermination(180)
    got = {
        (r.user_id, str(r.view_ts), str(r.purchase_ts), r.latency_seconds)
        for r in spark.read.parquet(f"{out_dir}/attributions").collect()
    }
    assert got == EXPECTED | {(9, "2024-01-01 02:00:00", "2024-01-01 02:00:01", 1)}

    # a complete (view, purchase) pair 90+ minutes behind the watermark:
    # both rows are late -> dropped, nothing new emitted
    _events(
        spark,
        [(7, "2024-01-01 00:01:00", "view"), (7, "2024-01-01 00:02:00", "purchase")],
    ).write.mode("append").parquet(in_dir)
    q2 = stream_attribution_join(spark, in_dir, out_dir)
    q2.awaitTermination(180)
    again = spark.read.parquet(f"{out_dir}/attributions").count()
    assert again == len(EXPECTED) + 1

    # batch parity over the full directory: the late pair IS counted there
    # (watermarks are no-ops in batch)
    full = _batch_pairs(
        spark,
        ON_TIME
        + [
            (9, "2024-01-01 02:00:00", "view"),
            (9, "2024-01-01 02:00:01", "purchase"),
            (7, "2024-01-01 00:01:00", "view"),
            (7, "2024-01-01 00:02:00", "purchase"),
        ],
    )
    assert (7, "2024-01-01 00:01:00", "2024-01-01 00:02:00", 60) in full
