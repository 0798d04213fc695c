"""Streaming validation: drain a documents directory with availableNow,
assert violations + verdict log match the batch pass, then append a second
file and prove incremental processing (only the new batch validated)."""

from pyspark.sql import functions as F

from schemasaurus_spark.plans.validation_job import ValidationJob
from schemasaurus_spark.sources.generator import generate_documents
from schemasaurus_spark.streaming.validate_stream import make_sink, validate_stream


def test_streaming_matches_batch_and_is_incremental(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    first = generate_documents(spark, 400, seed=41).coalesce(1)
    first.write.mode("append").parquet(in_dir)

    q = validate_stream(spark, in_dir, out_dir)
    q.awaitTermination(120)

    job = ValidationJob()
    docs = spark.read.parquet(in_dir)
    expected_viol = job.violations(job.validated(docs)).count()
    got_viol = spark.read.parquet(f"{out_dir}/violations").count()
    assert got_viol == expected_viol

    log = spark.read.parquet(f"{out_dir}/verdict_log")
    assert log.agg(F.sum("n_docs")).collect()[0][0] == 400

    # incremental: append new docs, re-drain, only the delta is new
    generate_documents(spark, 200, seed=43).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = validate_stream(spark, in_dir, out_dir)
    q2.awaitTermination(120)

    log2 = spark.read.parquet(f"{out_dir}/verdict_log")
    assert log2.agg(F.sum("n_docs")).collect()[0][0] == 600
    assert log2.select("batch_id").distinct().count() >= 2


def test_stateful_first_seen_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState dedup: fingerprints seen in batch 1 must not
    re-emit in batch 2 (state survives via the streaming checkpoint); new
    fingerprints in batch 2 emit exactly once."""
    from schemasaurus_spark.streaming.dedup_stream import dedup_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "Alpha  beta"), (3, "gamma delta")],
        ["doc_id", "text"],
    ).coalesce(1).write.mode("append").parquet(in_dir)

    q = dedup_stream(spark, in_dir, out_dir)
    q.awaitTermination(120)
    first = spark.read.parquet(f"{out_dir}/first_seen")
    got = {r.fingerprint: (r.doc_id, r.n_occurrences) for r in first.collect()}
    assert len(got) == 2  # alpha-beta (normalized dup) + gamma-delta
    assert ("1", 2) in got.values()  # min doc_id, both occurrences counted

    # batch 2: one repeat of an old text + one new text
    spark.createDataFrame(
        [(4, "alpha beta"), (5, "epsilon zeta")], ["doc_id", "text"]
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = dedup_stream(spark, in_dir, out_dir)
    q2.awaitTermination(120)

    first2 = spark.read.parquet(f"{out_dir}/first_seen")
    fps = [r.fingerprint for r in first2.collect()]
    assert len(fps) == len(set(fps)) == 3  # old keys NOT re-emitted
    ids = {r.doc_id for r in first2.collect()}
    assert "5" in ids and "4" not in ids


def test_incremental_dedup_stream_filters_against_corpus_index(spark, tmp_path):
    """Each micro-batch is near-dedup-checked against the static corpus
    index: near-dups of corpus docs are flagged+rejected, fresh docs are
    accepted, across two separate stream runs (resumed checkpoint)."""
    from schemasaurus_spark.operators.dedup import incremental_dedup
    from schemasaurus_spark.streaming.incremental_stream import (
        incremental_dedup_stream,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    other = "completely different historical corpus content " * 8
    corpus_dir = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, base), (2, other)], ["doc_id", "text"]
    ).coalesce(1).write.parquet(corpus_dir)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    b1 = [(100, base.replace("lazy", "sleepy")), (101, "fresh novel text " * 8)]
    spark.createDataFrame(b1, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)

    q, release = incremental_dedup_stream(
        spark, in_dir, corpus_dir, out_dir, threshold=0.5
    )
    q.awaitTermination(120)
    release()
    accepted = {r.doc_id for r in spark.read.parquet(f"{out_dir}/accepted").collect()}
    flagged = {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(f"{out_dir}/flagged").collect()
    }
    assert accepted == {101}
    assert flagged == {(100, 1)}

    # second run drains only the NEW batch (checkpoint remembers batch 1)
    b2 = [(200, other.replace("historical", "archival")), (201, "more new text " * 8)]
    spark.createDataFrame(b2, ["doc_id", "text"]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q2, release2 = incremental_dedup_stream(
        spark, in_dir, corpus_dir, out_dir, threshold=0.5
    )
    q2.awaitTermination(120)
    release2()
    accepted2 = {r.doc_id for r in spark.read.parquet(f"{out_dir}/accepted").collect()}
    assert accepted2 == {101, 201}

    # stream result equals the batch-mode operator on the union of batches
    both = spark.createDataFrame(b1 + b2, ["doc_id", "text"])
    corpus = spark.read.parquet(corpus_dir)
    batch_survivors = {
        r.doc_id for r in incremental_dedup(both, corpus, threshold=0.5).collect()
    }
    assert accepted2 == batch_survivors


def test_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a micro-batch (same
    batch_id) must rewrite its partition, not duplicate rows."""
    out_dir = str(tmp_path / "out")
    docs = generate_documents(spark, 300, seed=41).coalesce(1)
    sink = make_sink(ValidationJob(), out_dir)
    sink(docs, 0)
    viol_once = spark.read.parquet(f"{out_dir}/violations").count()
    log_once = spark.read.parquet(f"{out_dir}/verdict_log").agg(
        F.sum("n_docs")
    ).collect()[0][0]
    sink(docs, 0)  # simulated replay after a crash-before-checkpoint
    assert spark.read.parquet(f"{out_dir}/violations").count() == viol_once
    assert (
        spark.read.parquet(f"{out_dir}/verdict_log").agg(F.sum("n_docs")).collect()[0][0]
        == log_once
    )


def _events(spark, rows):
    """rows: (event_id, ts_str, event_type, value)"""
    return (
        spark.createDataFrame(rows, ["event_id", "ts_s", "event_type", "value"])
        .select(
            "event_id",
            F.col("ts_s").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        .coalesce(1)
    )


def test_windowed_counts_stream_matches_batch_and_drops_late(spark, tmp_path):
    """Watermarked tumbling-window aggregation: emitted windows match the
    batch groupBy over the ON-TIME rows, and a row later than the
    watermark is dropped (the bounded-state trade), while the same row in
    batch mode IS counted (watermark is a no-op there)."""
    from schemasaurus_spark.streaming.window_stream import (
        stream_windowed_counts,
        windowed_counts,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    # file 1: two 10-min windows' worth of on-time events
    _events(
        spark,
        [
            (0, "2024-01-01 00:01:00", "view", 1.0),
            (1, "2024-01-01 00:05:00", "view", 2.0),
            (2, "2024-01-01 00:07:00", "click", 3.0),
            (3, "2024-01-01 00:12:00", "view", 4.0),
        ],
    ).write.mode("append").parquet(in_dir)
    # file 2: advances the watermark far past both windows (01:30 - 30min
    # watermark = 01:00 > 00:10 and 00:20), closing and emitting them
    _events(spark, [(4, "2024-01-01 01:30:00", "view", 5.0)]).write.mode(
        "append"
    ).parquet(in_dir)

    q = stream_windowed_counts(spark, in_dir, out_dir)
    q.awaitTermination(120)
    emitted = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/windows").collect()
    }
    assert emitted[("2024-01-01 00:00:00", "view")] == (2, 3.0)
    assert emitted[("2024-01-01 00:00:00", "click")] == (1, 3.0)
    assert emitted[("2024-01-01 00:10:00", "view")] == (1, 4.0)

    # file 3: one event 90 minutes LATE for the 00:00 window (watermark is
    # already at 01:00) -> dropped on the stream path
    _events(spark, [(5, "2024-01-01 00:02:00", "view", 100.0)]).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = stream_windowed_counts(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    again = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(f"{out_dir}/windows").collect()
    }
    # the already-emitted window is final: the late row neither re-emits
    # nor revises it
    assert again[("2024-01-01 00:00:00", "view")] == (2, 3.0)
    assert len(again) == len(emitted)

    # batch parity: the SAME transform over the full directory counts the
    # late row (watermark is a no-op in batch) — 3 'view' events at 00:00
    batch = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in windowed_counts(spark.read.parquet(in_dir)).collect()
    }
    assert batch[("2024-01-01 00:00:00", "view")] == (3, 103.0)
    assert batch[("2024-01-01 00:00:00", "click")] == (1, 3.0)


def test_drift_monitor_stream_flags_shifted_batch(spark, tmp_path):
    """Streaming drift monitor: baseline snapshot written once; a stream
    of micro-batches gets one report row per tracked column per batch —
    quiet on same-distribution data, firing on a shifted increment — and
    a replayed batch_id overwrites its partition instead of duplicating."""
    from schemasaurus_spark.operators.snapshot import (
        SnapshotSpec,
        read_snapshot,
        write_snapshot,
    )
    from schemasaurus_spark.streaming.drift_stream import (
        drift_log,
        make_drift_sink,
        monitor_drift_stream,
    )

    spec = SnapshotSpec(numeric=("value",), categorical=("event_type",), n_bins=32)

    def gen(lo, hi, shift=0.0):
        return spark.range(lo, hi).select(
            ((F.col("id") * 37 % 500) / 5.0 + shift).alias("value"),
            F.concat(F.lit("t"), (F.col("id") % 4).cast("string")).alias("event_type"),
        )

    snap_path = str(tmp_path / "baseline")
    write_snapshot(gen(0, 3000), spec, snap_path)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    # batch 0: same distribution; drain
    gen(3000, 5000).coalesce(1).write.mode("append").parquet(in_dir)
    q = monitor_drift_stream(
        spark, in_dir, snap_path, spec, out_dir,
        input_schema="value double, event_type string",
    )
    q.awaitTermination(120)
    # batch 1: shifted values + skewed types; drain again
    gen(5000, 7000, shift=60.0).where(F.col("event_type") != "t0").coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    q2 = monitor_drift_stream(
        spark, in_dir, snap_path, spec, out_dir,
        input_schema="value double, event_type string",
    )
    q2.awaitTermination(120)

    log = drift_log(spark, out_dir)
    assert log.count() == 4  # 2 batches x 2 tracked columns
    by_batch = {
        (r.batch_id, r.column): r for r in log.collect()
    }
    batches = sorted({b for b, _ in by_batch})
    quiet, shifted = batches[0], batches[1]
    assert not by_batch[(quiet, "value")].drifted
    assert not by_batch[(quiet, "event_type")].drifted
    assert by_batch[(shifted, "value")].drifted
    assert by_batch[(shifted, "event_type")].drifted
    # PSI rides every report row: near zero on the quiet batch, firing
    # past the 0.25 major-shift rule of thumb on the shifted one
    assert by_batch[(quiet, "value")].psi < 0.1 < by_batch[(shifted, "value")].psi
    assert by_batch[(shifted, "event_type")].psi > by_batch[(quiet, "event_type")].psi

    # replay idempotence: re-invoking the sink with an existing batch_id
    # rewrites that partition, leaving the total row count unchanged
    base = read_snapshot(spark, snap_path)
    make_drift_sink(base, spec, out_dir)(gen(3000, 5000), shifted)
    assert drift_log(spark, out_dir).count() == 4


def test_schema_drift_stream_flags_migrated_batch(spark, tmp_path):
    """Streaming schema-shape monitor: baseline profile written once by a
    batch job; a conforming micro-batch reports only 'common' rows, a
    migrated one (type shift + new key) fires added_type/added_path —
    and a replayed batch_id overwrites its partition."""
    from schemasaurus_spark.schema.profile import json_schema_profile
    from schemasaurus_spark.streaming.schema_drift_stream import (
        make_schema_drift_sink,
        monitor_schema_drift_stream,
        schema_drift_log,
    )

    def gen(lo, hi, migrated=False):
        if migrated:
            j = F.concat(
                F.lit('{"u": "'), F.col("id").cast("string"),
                F.lit('", "nk": true}'),
            )
        else:
            j = F.concat(F.lit('{"u": '), F.col("id").cast("string"), F.lit("}"))
        return spark.range(lo, hi).select(j.alias("j"))

    base_path = str(tmp_path / "baseline_profile")
    json_schema_profile(gen(0, 500), "j").write.parquet(base_path)

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    gen(500, 800).coalesce(1).write.mode("append").parquet(in_dir)
    q = monitor_schema_drift_stream(
        spark, in_dir, base_path, "j", out_dir, input_schema="j string"
    )
    q.awaitTermination(120)
    gen(800, 1100, migrated=True).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = monitor_schema_drift_stream(
        spark, in_dir, base_path, "j", out_dir, input_schema="j string"
    )
    q2.awaitTermination(120)

    log = schema_drift_log(spark, out_dir).collect()
    by_batch = {}
    for r in log:
        by_batch.setdefault(r.batch_id, {})[(r.path, r.jtype)] = r
    quiet_id, migrated_id = sorted(by_batch)
    quiet, mig = by_batch[quiet_id], by_batch[migrated_id]
    assert all(r.status == "common" for r in quiet.values())
    assert mig[("/u", "string")].status == "added_type"
    assert mig[("/u", "integer")].status == "removed_type"
    assert mig[("/nk", "boolean")].status == "added_path"
    # replay idempotence: rerunning the sink for an existing batch_id
    # rewrites its partition, leaving the log row count unchanged
    baseline = spark.read.parquet(base_path)
    n_before = len(log)
    make_schema_drift_sink(baseline, "j", out_dir)(gen(500, 800), migrated_id)
    assert schema_drift_log(spark, out_dir).count() == n_before - len(mig) + len(quiet)
