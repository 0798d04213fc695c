"""Incremental component maintenance (dedup.incremental_components): merging
a batch's pairs into an existing min-id assignment must be bit-identical to
re-clustering the union edge set from scratch, while the corpus-sized
assignment is only streamed (broadcast joins), never shuffled."""

import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import (
    _apply_component_remap,
    connected_components,
    incremental_components,
)

PAIRS = "id_a long, id_b long"


def _pairs(spark, edges):
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges] or [], PAIRS)


def _full(spark, edges):
    return {
        (r.id, r.comp_id) for r in connected_components(_pairs(spark, edges)).collect()
    }


def _incr(spark, old_edges, new_edges, report=None):
    assignment = connected_components(_pairs(spark, old_edges)).localCheckpoint()
    out = incremental_components(assignment, _pairs(spark, new_edges), report_out=report)
    return {(r.id, r.comp_id) for r in out.collect()}


def test_merge_two_old_components(spark):
    old = [(1, 2), (10, 11)]
    new = [(2, 10)]  # bridges {1,2} and {10,11} -> all label 1
    assert _incr(spark, old, new) == _full(spark, old + new)
    assert _incr(spark, old, new) == {(1, 1), (2, 1), (10, 1), (11, 1)}


def test_new_node_with_smaller_id_becomes_the_root(spark):
    old = [(5, 6)]
    new = [(3, 6)]  # new doc 3 < old root 5 -> whole cluster relabels to 3
    assert _incr(spark, old, new) == {(3, 3), (5, 3), (6, 3)}


def test_untouched_components_unchanged_and_batch_only_clusters(spark):
    old = [(1, 2), (20, 21)]
    new = [(30, 31)]  # pure batch-batch cluster; old components untouched
    report = {}
    got = _incr(spark, old, new, report)
    assert got == {(1, 1), (2, 1), (20, 20), (21, 20), (30, 30), (31, 30)}
    assert report["touched_roots"] == 0
    assert report["new_nodes"] == 2


def test_empty_batch_is_identity(spark):
    old = [(1, 2), (2, 3)]
    assert _incr(spark, old, []) == _full(spark, old)


def test_chain_merge_through_multiple_batth_hops(spark):
    # one new path strings four old components together transitively
    old = [(10, 11), (20, 21), (30, 31), (40, 41)]
    new = [(11, 20), (21, 30), (31, 40)]
    got = _incr(spark, old, new)
    assert got == _full(spark, old + new)
    assert all(c == 10 for _, c in got)


def test_random_graphs_equal_full_recompute(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = 60
        old = {(rng.randrange(n), rng.randrange(n)) for _ in range(50)}
        new = {(rng.randrange(2 * n), rng.randrange(2 * n)) for _ in range(30)}
        old = {(a, b) for a, b in old if a != b}
        new = {(a, b) for a, b in new if a != b}
        assert _incr(spark, sorted(old), sorted(new)) == _full(
            spark, sorted(old) + sorted(new)
        ), f"trial {trial}"


def test_remap_application_streams_the_corpus(spark, tmp_path):
    # the corpus-sized relabel pass: ONE scan of the assignment, broadcast
    # join, zero Exchange
    path = str(tmp_path / "assignment")
    spark.createDataFrame([(i, i % 5) for i in range(100)], "id long, comp_id long").write.parquet(path)
    assignment = spark.read.parquet(path)
    remap = spark.createDataFrame([(3, 1)], "old_comp long, new_comp long")
    out = _apply_component_remap(assignment, remap)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    # broadcasting the metadata-sized remap is the point; what must never
    # appear is a SHUFFLE of the corpus-sized assignment
    assert plan.count("Exchange") == plan.count("BroadcastExchange")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    got = {(r.id, r.comp_id) for r in out.collect()}
    assert got == {(i, 1 if i % 5 == 3 else i % 5) for i in range(100)}
