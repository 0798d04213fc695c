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
