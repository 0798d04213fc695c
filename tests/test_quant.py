"""Int8 quantization (operators/quant.py): exact Python parity of the
quantization formula, bounds, zero-vector edge, scale cancellation, and
ranking recall vs the exact float path on clustered vectors."""

import math
import random

from schemasaurus_spark.operators.quant import int8_topk, quantize_embeddings
from schemasaurus_spark.operators.similarity import brute_force_topk


def _quant_py(v):
    m = max(abs(x) for x in v)
    if m == 0:
        return [0] * len(v)
    return [math.floor(x / m * 127.0 + 0.5) for x in v]


def test_quantization_python_parity_and_bounds(spark):
    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(50)
    ] + [(99, [0.0] * 16), (98, [-1.5] + [0.0] * 15)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {r.vec_id: (list(r.qvec), r.scale) for r in quantize_embeddings(df).collect()}
    for vid, vec in rows:
        # the engine quantizes the FLOAT32 values — mirror that exactly
        import struct

        f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
        assert got[vid][0] == _quant_py(f32), vid
        assert all(-127 <= q <= 127 for q in got[vid][0])
    assert got[99][0] == [0] * 16 and got[99][1] == 0.0
    assert got[98][0][0] == -127


def test_int8_topk_recall_vs_exact(spark):
    # three tight clusters: quantization error is O(1/127), cluster
    # structure dwarfs it, so top-3 neighbor SETS must match exactly
    rng = random.Random(7)
    centers = [[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.3, 0.3) for x in c]))
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    probes = corpus.where("vec_id < 3")
    exact = brute_force_topk(corpus, probes, k=3)
    quant = int8_topk(corpus, probes, k=3)
    by_probe_exact = {}
    for r in exact.collect():
        by_probe_exact.setdefault(r.probe_id, set()).add(r.neighbor_id)
    by_probe_quant = {}
    for r in quant.collect():
        by_probe_quant.setdefault(r.probe_id, set()).add(r.neighbor_id)
    assert by_probe_quant == by_probe_exact
    # similarity error bounded by quantization resolution
    sim_e = {(r.probe_id, r.neighbor_id): r.similarity for r in exact.collect()}
    for r in quant.collect():
        assert abs(r.similarity - sim_e[(r.probe_id, r.neighbor_id)]) < 0.02


def test_scale_cancellation(spark):
    # scaling a vector by any constant leaves its quantized form (and so
    # every quantized cosine) unchanged
    base = [0.3, -1.1, 0.7, 2.0]
    df = spark.createDataFrame(
        [(1, base), (2, [x * 1000 for x in base])],
        "vec_id bigint, embedding array<float>",
    )
    got = {r.vec_id: list(r.qvec) for r in quantize_embeddings(df).collect()}
    assert got[1] == got[2]
