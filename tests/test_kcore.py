"""k-core peeling (operators/kcore.py): closed-form cores, cascade depth,
input-noise immunity, brute-force parity, partition invariance."""

import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.kcore import k_core

EDGES = "src long, dst long"


def _core(spark, edges, k, report=None):
    df = spark.createDataFrame(edges, EDGES)
    return {(r.id, r.degree) for r in k_core(df, k, report_out=report).collect()}


def _brute(edges, k):
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {(n, len(ns)) for n, ns in adj.items() if ns}


def test_triangle_with_tail_peels_to_the_triangle(spark):
    report = {}
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    assert _core(spark, edges, 2, report) == {(1, 2), (2, 2), (3, 2)}
    # the tail cascades: 5 peels, then 4 — depth 2 (+1 confirming round)
    assert report["kcore_rounds"] >= 2


def test_clique_cores(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _core(spark, k4, 3) == {(n, 3) for n in range(4)}
    assert _core(spark, k4, 4) == set()


def test_path_two_core_is_empty_with_deep_cascade(spark):
    report = {}
    path = [(i, i + 1) for i in range(9)]
    assert _core(spark, path, 2, report) == set()
    assert report["kcore_rounds"] >= 4  # peels from both ends, ~len/2 rounds


def test_input_noise_immunity(spark):
    # duplicates, reversed duplicates and self-loops change nothing
    clean = [(1, 2), (2, 3), (3, 1)]
    noisy = clean + [(2, 1), (3, 2), (1, 1), (2, 3), (3, 3)]
    assert _core(spark, noisy, 2) == _core(spark, clean, 2)


def test_one_core_keeps_every_non_isolated_node(spark):
    edges = [(1, 2), (3, 4)]
    assert _core(spark, edges, 1) == {(1, 1), (2, 1), (3, 1), (4, 1)}


def test_validation(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_core(spark.createDataFrame([(1, 2)], EDGES), 0)


def test_random_graph_brute_force_parity(spark):
    rng = random.Random(5)
    for trial, k in [(0, 2), (1, 3)]:
        edges = sorted(
            {
                (rng.randrange(30), rng.randrange(30))
                for _ in range(70 + 20 * trial)
            }
        )
        assert _core(spark, edges, k) == _brute(edges, k), (trial, k)


def test_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(12)] + [(0, 6), (6, 12), (12, 0)]
    df = spark.createDataFrame(edges, EDGES)
    a = {(r.id, r.degree) for r in k_core(df, 2).collect()}
    b = {(r.id, r.degree) for r in k_core(df.repartition(7, "src"), 2).collect()}
    assert a == b
