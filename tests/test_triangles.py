"""Triangle counting: closed-form graphs (triangle, K4, star, path),
direction/multiplicity/self-loop immunity, brute-force parity on a
random graph, partition invariance."""

import itertools
import random

from schemasaurus_spark.operators.triangles import triangle_stats

EDGE_SCHEMA = "src string, dst string, n_links long"


def _stats(spark, edges):
    df = spark.createDataFrame([(a, b, 1) for a, b in edges], EDGE_SCHEMA)
    return {r.host: r.asDict() for r in triangle_stats(df).collect()}


def _brute(edges):
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    return {
        n: {
            "degree": len(adj[n]),
            "n_triangles": tri[n],
            "clustering_bp": 0
            if len(adj[n]) < 2
            else tri[n] * 2 * 10000 // (len(adj[n]) * (len(adj[n]) - 1)),
        }
        for n in adj
    }


def test_closed_form_graphs(spark):
    # single triangle
    got = _stats(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for n in "abc":
        assert got[n]["n_triangles"] == 1
        assert got[n]["clustering_bp"] == 10000
    # K4: every node in 3 triangles, clustering 1
    k4 = list(itertools.combinations("wxyz", 2))
    got = _stats(spark, k4)
    for n in "wxyz":
        assert got[n]["n_triangles"] == 3
        assert got[n]["clustering_bp"] == 10000
    # star: no triangles, hub clustering 0
    got = _stats(spark, [("hub", x) for x in ("p", "q", "r", "s")])
    assert got["hub"]["n_triangles"] == 0 and got["hub"]["clustering_bp"] == 0
    assert got["p"]["degree"] == 1 and got["p"]["clustering_bp"] == 0


def test_direction_multiplicity_selfloop_immunity(spark):
    # same triangle expressed with reversed/duplicated edges + self-loop
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"),
        ("c", "a"),
    ]
    got = _stats(spark, edges)
    for n in "abc":
        assert got[n]["degree"] == 2
        assert got[n]["n_triangles"] == 1


def test_brute_force_parity_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"h{i}" for i in range(18)]
    edges = sorted(
        {
            tuple(sorted((rng.choice(nodes), rng.choice(nodes))))
            for _ in range(70)
        }
    )
    got = _stats(spark, edges)
    expect = _brute(edges)
    assert set(got) == set(expect)
    for n, e in expect.items():
        g = got[n]
        assert (g["degree"], g["n_triangles"], g["clustering_bp"]) == (
            e["degree"],
            e["n_triangles"],
            e["clustering_bp"],
        ), n


def test_partition_invariance(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a")]
    df = spark.createDataFrame([(a, b, 1) for a, b in edges], EDGE_SCHEMA)
    base = sorted(map(tuple, triangle_stats(df).collect()))
    re7 = sorted(map(tuple, triangle_stats(df.repartition(5, "src")).collect()))
    assert base == re7
