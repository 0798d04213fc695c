"""Embedding-centroid drift: exact quantized sums (partitioning-invariant
by integer arithmetic), hand-computed per-dim profile, and the ordered
cosine/L2 fold against numpy."""

from __future__ import annotations

import math

import numpy as np

from schemasaurus_spark.operators.drift import (
    embedding_centroid_profile,
    embedding_centroid_summary,
    embedding_centroid_sums,
)


def _emb(spark, vecs, parts=1):
    df = spark.createDataFrame([(v,) for v in vecs], "embedding array<float>")
    return df.repartition(parts) if parts > 1 else df


def test_sums_exact_and_partitioning_invariant(spark):
    vecs = [[0.5, -0.25], [0.5, 1.0], [0.25, 0.125]]
    want = {
        0: sum(math.floor(np.float32(v[0]) * 2**20) for v in vecs),
        1: sum(math.floor(np.float32(v[1]) * 2**20) for v in vecs),
    }
    for parts in (1, 7):
        out = {
            r["pos"]: (int(r["s"]), r["n"])
            for r in embedding_centroid_sums(
                _emb(spark, vecs, parts), "embedding"
            ).collect()
        }
        assert out == {p: (s, 3) for p, s in want.items()}


def test_profile_hand_case(spark):
    base = _emb(spark, [[1.0, 0.0]] * 4)
    cur = _emb(spark, [[1.0, 0.5]] * 2)
    out = {r["pos"]: r for r in
           embedding_centroid_profile(base, cur, "embedding").collect()}
    assert out[0]["centroid_base"] == 1.0 and out[0]["centroid_cur"] == 1.0
    assert out[0]["delta"] == 0.0
    assert out[1]["centroid_base"] == 0.0 and out[1]["centroid_cur"] == 0.5
    assert out[1]["delta"] == 0.5
    assert out[0]["n_base"] == 4 and out[0]["n_cur"] == 2


def test_summary_matches_numpy(spark):
    rng = np.random.default_rng(11)
    b = rng.normal(0, 0.3, size=(40, 8)).astype(np.float32)
    shift = np.array([0.4] + [0.0] * 7)
    c = (rng.normal(0, 0.3, size=(30, 8)) + shift).astype(np.float32)
    prof = embedding_centroid_profile(
        _emb(spark, b.tolist(), 3), _emb(spark, c.tolist(), 3), "embedding"
    )
    row = embedding_centroid_summary(prof).collect()[0]
    cb, cc = b.astype(np.float64).mean(0), c.astype(np.float64).mean(0)
    cos = float(cb @ cc / (np.linalg.norm(cb) * np.linalg.norm(cc)))
    l2 = float(np.linalg.norm(cc - cb))
    assert row["dims"] == 8
    assert abs(row["cosine"] - cos) < 1e-4, (row["cosine"], cos)
    assert abs(row["l2"] - l2) < 1e-4
    assert row["max_delta_pos"] == 0, "the planted +0.4 shift is on dim 0"


def test_retrieval_recall_hand_computed(spark):
    from schemasaurus_spark.operators.similarity import retrieval_recall

    exact = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 9), (1, 8), (2, 5)],
        "probe_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        [(0, 1), (0, 3), (0, 99), (1, 7), (1, 6)],  # probe 2 entirely missed
        "probe_id long, neighbor_id long",
    )
    got = {
        r.probe_id: r.asDict()
        for r in retrieval_recall(exact, approx).collect()
    }
    assert got[0] == {"probe_id": 0, "n_exact": 3, "n_hit": 2,
                      "recall_bp": 2 * 10000 // 3}
    assert got[1]["n_hit"] == 0 and got[1]["recall_bp"] == 0
    # silent misses surface as 0, never as an absent row
    assert got[2] == {"probe_id": 2, "n_exact": 1, "n_hit": 0, "recall_bp": 0}
    # perfect self-recall
    perfect = retrieval_recall(exact, exact).collect()
    assert all(r.recall_bp == 10000 for r in perfect)
