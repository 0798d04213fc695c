"""Streaming volume monitor: quiet batch unflagged, burst batch and
in-batch outage bucket both fire against the persisted baseline, and a
replayed batch_id rewrites its partition."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from schemasaurus_spark.streaming.volume_stream import (
    make_volume_sink,
    monitor_volume_stream,
    volume_baseline,
    volume_log,
)

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = "ts timestamp"


def _hours(spark, spec):
    """spec: {hour_offset: n_rows} -> one-column ts frame."""
    rows = [
        (T0 + dt.timedelta(hours=h, seconds=i),)
        for h, n in spec.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_volume_stream_flags_burst_and_outage(spark, tmp_path):
    # baseline corpus: 6 hours at 10 +/- 2 rows -> mean 10, stddev ~1.29
    base_corpus = _hours(spark, {0: 10, 1: 12, 2: 8, 3: 10, 4: 11, 5: 9})
    base_path = str(tmp_path / "baseline")
    volume_baseline(base_corpus, "ts").write.parquet(base_path)

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    # batch 0: quiet (counts inside the band)
    _hours(spark, {6: 10, 7: 11}).coalesce(1).write.mode("append").parquet(in_dir)
    q = monitor_volume_stream(
        spark, in_dir, base_path, "ts", out_dir, SCHEMA, z=3.0
    )
    q.awaitTermination(120)
    # batch 1: a 5x burst hour and an outage hour BETWEEN two active ones
    _hours(spark, {8: 50, 10: 10}).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = monitor_volume_stream(
        spark, in_dir, base_path, "ts", out_dir, SCHEMA, z=3.0
    )
    q2.awaitTermination(120)

    log = volume_log(spark, out_dir).collect()
    by_batch = {}
    for r in log:
        by_batch.setdefault(r["batch_id"], {})[r["bucket_ts"]] = r
    quiet_id, loud_id = sorted(by_batch)
    quiet, loud = by_batch[quiet_id], by_batch[loud_id]
    assert len(quiet) == 2 and not any(r["anomalous"] for r in quiet.values())
    assert loud[T0 + dt.timedelta(hours=8)]["anomalous"], "burst must flag"
    gap = loud[T0 + dt.timedelta(hours=9)]
    assert gap["cnt"] == 0 and gap["anomalous"], "zero-filled outage must flag"
    assert not loud[T0 + dt.timedelta(hours=10)]["anomalous"]

    # replay idempotence: rerun the sink for the loud batch_id
    base_row = spark.read.parquet(base_path).collect()[0].asDict()
    n_before = len(log)
    make_volume_sink(base_row, "hour", 3.0, out_dir, "ts")(
        _hours(spark, {8: 50, 10: 10}), loud_id
    )
    assert volume_log(spark, out_dir).count() == n_before


def test_zero_stddev_baseline_never_flags(spark, tmp_path):
    base = _hours(spark, {0: 5, 1: 5, 2: 5})
    base_path = str(tmp_path / "b")
    volume_baseline(base, "ts").write.parquet(base_path)
    base_row = spark.read.parquet(base_path).collect()[0].asDict()
    assert base_row["stddev"] == 0.0
    out_dir = str(tmp_path / "o")
    make_volume_sink(base_row, "hour", 3.0, out_dir, "ts")(
        _hours(spark, {3: 500}), 0
    )
    rows = volume_log(spark, out_dir).collect()
    assert rows and all(r["zscore"] is None and not r["anomalous"] for r in rows)
