"""Streaming bloom novelty gate: cross-batch exact dedup vs corpus +
earlier accepted batches, in-batch min-id collapse, NULL-text
pass-through, and checkpoint-loss replay idempotence (the batch_id <
current exclusion)."""

import shutil

from schemasaurus_spark.streaming.bloom_stream import bloom_novelty_stream

A = "the corpus already has this exact document body"
C = "a third corpus document nobody copied yet"


def _write_batch(spark, in_dir, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(in_dir)


def _drain(spark, in_dir, corpus_dir, out_dir):
    q, release = bloom_novelty_stream(
        spark, in_dir, corpus_dir, out_dir, n_bits=1 << 16, n_hashes=4
    )
    q.awaitTermination(120)
    release()


def test_bloom_stream_gates_across_batches_and_replays_idempotently(
    spark, tmp_path
):
    corpus_dir = str(tmp_path / "corpus")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, A), (2, "another historical doc"), (3, C)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(corpus_dir)

    # batch 1: corpus dup (whitespace/case variant), a fresh doc, an
    # in-batch dup of the fresh doc, a NULL-text row
    _write_batch(
        spark,
        in_dir,
        [
            (100, "  THE corpus already has this exact  document body "),
            (101, "fresh text one"),
            (102, "fresh  TEXT one"),
            (103, None),
        ],
    )
    _drain(spark, in_dir, corpus_dir, out_dir)
    acc = {
        r.doc_id: r.batch_id
        for r in spark.read.parquet(f"{out_dir}/accepted").collect()
    }
    rej = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{out_dir}/rejected").collect()
    }
    assert set(acc) == {101, 103}
    assert rej == {100: "seen", 102: "in_batch"}

    # batch 2: dup of batch-1 acceptance, a new doc, a corpus dup
    _write_batch(
        spark,
        in_dir,
        [(200, "fresh text ONE"), (201, "fresh text two"), (202, C.upper())],
    )
    _drain(spark, in_dir, corpus_dir, out_dir)
    acc = {
        r.doc_id: r.batch_id
        for r in spark.read.parquet(f"{out_dir}/accepted").collect()
    }
    rej = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{out_dir}/rejected").collect()
    }
    assert set(acc) == {101, 103, 201}
    assert rej[200] == "seen" and rej[202] == "seen" and rej[100] == "seen"

    # checkpoint loss: every input file replays as batch 0 against sinks
    # that already contain batches 0-1 and a bitmap rebuilt from them —
    # the `batch_id < current` exclusion must keep prior SELF-output from
    # flagging the replay, while stale higher partitions get overwritten
    # only where re-emitted (we assert the batch-0 replay result here)
    shutil.rmtree(f"{out_dir}/_checkpoint")
    _drain(spark, in_dir, corpus_dir, out_dir)
    acc0 = {
        r.doc_id
        for r in spark.read.parquet(f"{out_dir}/accepted")
        .where("batch_id = 0")
        .collect()
    }
    # all 7 input rows replay as one batch: same novelty verdicts, with
    # the two fresh fingerprints collapsing to their min ids
    assert acc0 == {101, 103, 201}
    rej0 = {
        r.doc_id: r.reason
        for r in spark.read.parquet(f"{out_dir}/rejected")
        .where("batch_id = 0")
        .collect()
    }
    assert rej0 == {100: "seen", 102: "in_batch", 200: "in_batch", 202: "seen"}
