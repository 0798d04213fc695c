"""Product quantization (operators/pq.py): code determinism, exact-on-
codeword reconstruction, cluster-level ADC recall, Lloyd refinement
error monotonicity, and the IVFADC composition's consistency with the
full-scan ADC path."""

import math
import random

from pyspark.sql import functions as F

from schemasaurus_spark.operators.pq import (
    PqCodebook,
    build_pq_codebook,
    encode_pq,
    ivfpq_topk,
    pq_topk,
)
from schemasaurus_spark.operators.similarity import build_ivf_index


def _clustered_rows(n=90, dim=16, spread=0.3, seed=7):
    rng = random.Random(seed)
    centers = [
        [5.0] + [0.0] * (dim - 1),
        [0.0] * (dim // 3) + [5.0] + [0.0] * (dim - dim // 3 - 1),
        [0.0] * (2 * dim // 3) + [5.0] + [0.0] * (dim - 2 * dim // 3 - 1),
    ]
    return [
        (i, [x + rng.uniform(-spread, spread) for x in centers[i % 3]])
        for i in range(n)
    ]


def test_codes_shape_and_partition_invariance(spark):
    rows = _clustered_rows()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    assert cb.m == 4 and cb.ks == 8 and cb.sub == 4
    enc1 = {r.vec_id: list(r.pq_codes) for r in encode_pq(df, cb).collect()}
    enc2 = {
        r.vec_id: list(r.pq_codes)
        for r in encode_pq(df.repartition(7), cb).collect()
    }
    assert enc1 == enc2
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in enc1.values())


def test_identical_vectors_identical_codes(spark):
    rows = _clustered_rows(30)
    dup = [(1000 + i, v) for i, v in rows[:5]]
    df = spark.createDataFrame(
        rows + dup, "vec_id bigint, embedding array<double>"
    )
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    enc = {r.vec_id: list(r.pq_codes) for r in encode_pq(df, cb).collect()}
    for i, _ in rows[:5]:
        assert enc[i] == enc[1000 + i]


def test_adc_exact_on_codebook_vectors(spark):
    """A corpus vector that IS a sampled codebook source reconstructs
    exactly (its codes point at its own slices), so its ADC score equals
    the true dot product."""
    rows = _clustered_rows(40)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    sample_vecs = {tuple(cb.books[0][c] + cb.books[1][c] + cb.books[2][c] + cb.books[3][c]): c for c in range(cb.ks)}
    by_id = dict(rows)
    sampled_ids = [i for i, v in rows if tuple(v) in sample_vecs]
    assert sampled_ids, "md5 sample must hit corpus rows"
    probes = df.where(F.col("vec_id") < 2)
    got = {
        (r.probe_id, r.neighbor_id): r.adc_score
        for r in pq_topk(df, probes, cb, k=len(rows)).collect()
    }
    for pid in (0, 1):
        q = by_id[pid]
        for nid in sampled_ids:
            if nid == pid:
                continue
            exact = sum(a * b for a, b in zip(q, by_id[nid]))
            assert abs(got[(pid, nid)] - round(exact, 6)) < 1e-9, (pid, nid)


def test_adc_cluster_recall(spark):
    """Quantization keeps cluster structure: every ADC top-3 neighbor of
    probe i belongs to probe i's cluster (clusters are 5.0 apart, spread
    0.3, so inter-cluster dot ~0 vs intra ~25)."""
    rows = _clustered_rows()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    probes = df.where(F.col("vec_id") < 3)
    for r in pq_topk(df, probes, cb, k=3).collect():
        assert r.neighbor_id % 3 == r.probe_id % 3, (r.probe_id, r.neighbor_id)


def _recon_err(rows, cb):
    err = 0.0
    for _, v in rows:
        for mi in range(cb.m):
            x = v[mi * cb.sub : (mi + 1) * cb.sub]
            best = min(
                (
                    sum((a - b) * (a - b) for a, b in zip(x, cwv))
                    for cwv in cb.books[mi]
                )
            )
            err += best
    return err


def test_lloyd_refinement_reduces_error(spark):
    rows = _clustered_rows(n=120, spread=0.8, seed=11)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb0 = build_pq_codebook(df, dim=16, m=4, ks=8, kmeans_iters=0)
    cb2 = build_pq_codebook(df, dim=16, m=4, ks=8, kmeans_iters=2)
    e0, e2 = _recon_err(rows, cb0), _recon_err(rows, cb2)
    assert e2 <= e0 + 1e-9, (e0, e2)
    assert e2 < e0 * 0.9, "two Lloyd rounds should visibly tighten the fit"


def test_ivfpq_probe_all_matches_full_adc(spark):
    rows = _clustered_rows()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    index = build_ivf_index(df, dim=16, n_list=6)
    probes = df.where(F.col("vec_id") < 3)
    full = sorted(
        map(tuple, pq_topk(df, probes, cb, k=3).collect())
    )
    comp = sorted(
        map(tuple, ivfpq_topk(df, probes, index, cb, k=3, n_probe=6).collect())
    )
    assert full == comp


def test_pq_topk_precomputed_codes_path(spark):
    rows = _clustered_rows()
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cb = build_pq_codebook(df, dim=16, m=4, ks=8)
    probes = df.where(F.col("vec_id") < 3)
    codes = encode_pq(df, cb).select("vec_id", "pq_codes")
    a = sorted(map(tuple, pq_topk(df, probes, cb, k=3).collect()))
    b = sorted(map(tuple, pq_topk(df, probes, cb, k=3, codes=codes).collect()))
    assert a == b


def test_codebook_validation():
    try:
        PqCodebook([], dim=16)
        assert False
    except ValueError:
        pass
    try:
        PqCodebook([[[0.0] * 5]], dim=16)  # dim not divisible by m=1? 16 % 1 == 0
    except ValueError:
        raise AssertionError("m=1 divides any dim")
    try:
        PqCodebook([[[0.0] * 5], [[0.0] * 5], [[0.0] * 5]], dim=16)  # 16 % 3 != 0
        assert False
    except ValueError:
        pass
