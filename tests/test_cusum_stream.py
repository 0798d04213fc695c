"""Streaming CUSUM: bit-equality with the batch operator across
micro-batch slicings, state survival over restart, alarm consistency."""

import datetime as dt

from schemasaurus_spark.operators.cusum import cusum_changepoints
from schemasaurus_spark.streaming.cusum_stream import cusum_monitor_stream

SCHEMA = "event_id long, ts timestamp, event_type string, value double"
KW = dict(target=10.0, threshold=12.0, slack=0.5)


def _rows(values, entity, start_id, start_s=0):
    return [
        (
            start_id + i,
            dt.datetime(2024, 1, 1) + dt.timedelta(seconds=start_s + i),
            entity,
            v,
        )
        for i, v in enumerate(values)
    ]


def _batch_reference(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        (
            r.event_type,
            r.event_id,
            r.ts_us,
            r.cusum_up_q,
            r.cusum_down_q,
            r.alarm_up,
            r.alarm_down,
        )
        for r in cusum_changepoints(df, **KW).collect()
    )


def test_stream_equals_batch_across_slicings_and_restart(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # slice one logical stream into two time-ordered micro-batches
    part1 = _rows([9.0, 14.0, 15.0, 2.0], "a", 0) + _rows(
        [20.0, 20.0], "b", 100
    )
    part2 = _rows([16.0, 1.0, 1.0], "a", 10, start_s=10) + _rows(
        [0.5], "b", 200, start_s=10
    )

    spark.createDataFrame(part1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = cusum_monitor_stream(spark, in_dir, out_dir, **KW)
    q.awaitTermination(120)

    # restart with batch 2 appended: state must resume, not restart at 0
    spark.createDataFrame(part2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = cusum_monitor_stream(spark, in_dir, out_dir, **KW)
    q2.awaitTermination(120)

    got = sorted(
        (
            r.entity,
            r.event_id,
            r.ts_us,
            r.cusum_up_q,
            r.cusum_down_q,
            r.alarm_up,
            r.alarm_down,
        )
        for r in spark.read.parquet(f"{out_dir}/cusum").collect()
    )
    assert got == _batch_reference(spark, part1 + part2)
    # at least one alarm fired (values drift above target)
    assert any(t[5] for t in got)


def test_null_values_dropped_and_replay_idempotent(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    rows = _rows([5.0, None, 30.0], "a", 0)
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q = cusum_monitor_stream(spark, in_dir, out_dir, **KW)
    q.awaitTermination(120)
    out = spark.read.parquet(f"{out_dir}/cusum")
    assert out.count() == 2  # NULL row carries no evidence
    # re-running with no new input must not duplicate output
    q2 = cusum_monitor_stream(spark, in_dir, out_dir, **KW)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out_dir}/cusum").count() == 2
