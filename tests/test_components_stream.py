"""Streaming delta-log component maintenance (streaming/components_stream):
fold-equals-batch-CC, restart resume, replay idempotence, compaction
transparency, and the corpus-shuffle-free read plan."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import connected_components
from schemasaurus_spark.streaming.components_stream import (
    components_sink,
    components_stream,
    read_assignment,
)

PAIRS = "id_a long, id_b long"


def _write(spark, rows, path):
    spark.createDataFrame(rows, PAIRS).coalesce(1).write.mode("append").parquet(path)


def _full(spark, edges):
    return {
        (r.id, r.comp_id)
        for r in connected_components(spark.createDataFrame(edges, PAIRS)).collect()
    }


def _state(spark, out_dir, **kw):
    return {(r.id, r.comp_id) for r in read_assignment(spark, out_dir, **kw).collect()}


B1 = [(1, 2), (10, 11)]
B2 = [(2, 10), (20, 21)]          # merges {1,2}+{10,11}; new cluster {20,21}
B3 = [(0, 21), (30, 31), (1, 2)]  # new min-id 0 takes over {20,21}; repeat pair


def test_stream_equals_batch_cc_across_batches_and_restart(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write(spark, B1, in_dir)
    components_stream(spark, in_dir, out_dir).awaitTermination(180)
    assert _state(spark, out_dir) == _full(spark, B1)

    # restart with two more batches of input (one new query per drop)
    _write(spark, B2, in_dir)
    components_stream(spark, in_dir, out_dir).awaitTermination(180)
    assert _state(spark, out_dir) == _full(spark, B1 + B2)

    _write(spark, B3, in_dir)
    components_stream(spark, in_dir, out_dir).awaitTermination(180)
    assert _state(spark, out_dir) == _full(spark, B1 + B2 + B3)
    # the merged cluster relabeled to the late-arriving global min 0
    got = dict(_state(spark, out_dir))
    assert got[20] == 0 and got[21] == 0 and got[0] == 0


def test_replay_is_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    sink = components_sink(spark, out_dir)
    sink(spark.createDataFrame(B1, PAIRS), 0)
    sink(spark.createDataFrame(B2, PAIRS), 1)
    before = _state(spark, out_dir)
    # at-least-once replay of batch 1: same input state (batches < 1 are
    # immutable), same recomputed delta, partition rewritten not duplicated
    sink(spark.createDataFrame(B2, PAIRS), 1)
    assert _state(spark, out_dir) == before == _full(spark, B1 + B2)


def test_compaction_is_transparent_and_replayable(spark, tmp_path):
    out_a = str(tmp_path / "nocompact")
    out_b = str(tmp_path / "compact")
    batches = [B1, B2, B3, [(40, 41), (41, 10)]]
    sink_a = components_sink(spark, out_a)
    sink_b = components_sink(spark, out_b, compact_every=2)
    for i, b in enumerate(batches):
        sink_a(spark.createDataFrame(b, PAIRS), i)
        sink_b(spark.createDataFrame(b, PAIRS), i)
    want = _full(spark, [p for b in batches for p in b])
    assert _state(spark, out_a) == want
    assert _state(spark, out_b) == want
    # compaction actually happened (bases at upto=1 and upto=3)
    uptos = {
        r[0]
        for r in spark.read.parquet(f"{out_b}/base").select("upto").distinct().collect()
    }
    assert uptos == {1, 3}
    # replay of batch 3 AFTER the upto=3 compaction must rebuild from the
    # pre-3 view (base upto=1 + delta 2), not from its own folded output
    sink_b(spark.createDataFrame(batches[3], PAIRS), 3)
    assert _state(spark, out_b) == want
    # read bounded to the replay horizon sees the old state
    assert _state(spark, out_b, before_batch=3) == _full(
        spark, [p for b in batches[:3] for p in b]
    )


def test_read_plan_streams_base_through_broadcasts(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    sink = components_sink(spark, out_dir, compact_every=1)
    sink(spark.createDataFrame(B1, PAIRS), 0)   # compacts -> base/upto=0
    sink(spark.createDataFrame(B2, PAIRS), 1)   # delta on top
    plan = (
        read_assignment(spark, out_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # folding = broadcast probes over the base scan; no shuffle exchange
    assert plan.count("Exchange") == plan.count("BroadcastExchange")


def test_empty_and_null_pairs_batch(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    sink = components_sink(spark, out_dir)
    sink(spark.createDataFrame(B1, PAIRS), 0)
    sink(
        spark.createDataFrame([(None, 5), (None, None)], PAIRS), 1
    )  # null endpoints carry no edge
    assert _state(spark, out_dir) == _full(spark, B1)


def test_composes_with_incremental_near_dup_stream(spark, tmp_path):
    """The continuous dedup story end-to-end: doc batches -> near-dup pairs
    vs the corpus band index (incremental_stream) -> the flagged-pair
    directory IS a valid components_stream input -> cluster assignment
    equals batch CC over all flagged pairs."""
    from schemasaurus_spark.streaming.incremental_stream import (
        incremental_dedup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays a long and winding tune about distant summer rain"
    )
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark physical plans "
                        "and shuffle exchanges in adaptive execution")],
        "doc_id long, text string",
    ).write.parquet(corpus_path)

    in_dir = str(tmp_path / "in")
    dd_out = str(tmp_path / "dd")
    spark.createDataFrame(
        [(100, base + "!"), (101, "novel content never seen before in any "
                                  "corpus shard of this little test")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)

    q, stop = incremental_dedup_stream(spark, in_dir, corpus_path, dd_out)
    q.awaitTermination(180)
    stop()

    flagged = spark.read.parquet(f"{dd_out}/flagged")
    pairs = {(r.new_id, r.corpus_id) for r in flagged.collect()}
    assert pairs == {(100, 1)}  # the near-dup was flagged, the novel doc not

    cc_out = str(tmp_path / "cc")
    components_stream(
        spark, f"{dd_out}/flagged", cc_out, id_a="new_id", id_b="corpus_id"
    ).awaitTermination(180)
    assert _state(spark, cc_out) == {(1, 1), (100, 1)}
