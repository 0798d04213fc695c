"""Synchronous weighted LPA (rank.label_propagation): two-triangle
closed form, weighted pull, self-vote pair convergence, parallel-row
weight accumulation, n_iter=0 identity, partition invariance."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.rank import label_propagation


def _edges(spark, rows, schema="src string, dst string"):
    return spark.createDataFrame(rows, schema)


TRIANGLES = [
    ("a1", "a2"),
    ("a2", "a3"),
    ("a1", "a3"),
    ("b1", "b2"),
    ("b2", "b3"),
    ("b1", "b3"),
    ("a3", "b1"),  # weak bridge
]


def test_two_triangles_converge_to_min_member(spark):
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, TRIANGLES), n_iter=4).collect()
    }
    assert got == {
        "a1": "a1",
        "a2": "a1",
        "a3": "a1",
        "b1": "b1",
        "b2": "b1",
        "b3": "b1",
    }


def test_weighted_edge_wins_over_tie(spark):
    rows = [("x", "y", 5), ("z", "y", 1)]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            _edges(spark, rows, "src string, dst string, w int"),
            n_iter=1,
            weight="w",
        ).collect()
    }
    # one round isolates the vote math: y pulls x's label (weight 5)
    # over z's (weight 1) and its own (weight-1 self-vote).  (Longer
    # horizons on this graph oscillate x<->y: an edge heavier than the
    # self-vote swings BOTH endpoints each synchronous round — the
    # documented LPA dynamic; the fixed n_iter is what keeps the result
    # a deterministic contract.)
    assert got["y"] == "x"
    assert got["x"] == "y"  # the heavy edge swings x symmetrically


def test_self_vote_converges_isolated_pair(spark):
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, [("q", "p")]), n_iter=3).collect()
    }
    # without the self-vote a 2-cycle oscillates forever; with it both
    # see a 1-1 tie in round 1 and take the smaller label
    assert got == {"p": "p", "q": "p"}


def test_parallel_rows_accumulate_weight(spark):
    rows = [("x", "y"), ("x", "y"), ("z", "y")]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, rows), n_iter=1).collect()
    }
    assert got["y"] == "x"  # x's doubled edge outweighs z's single


def test_zero_iters_is_identity(spark):
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_edges(spark, TRIANGLES), n_iter=0).collect()
    }
    assert got == {n: n for n in ("a1", "a2", "a3", "b1", "b2", "b3")}


def test_partition_invariance(spark):
    df = _edges(spark, TRIANGLES)
    a = sorted(
        label_propagation(df, n_iter=3).collect(), key=lambda r: r["node"]
    )
    b = sorted(
        label_propagation(df.repartition(5, "dst"), n_iter=3).collect(),
        key=lambda r: r["node"],
    )
    assert a == b
