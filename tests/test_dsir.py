"""DSIR hashed-n-gram importance resampling (operators/dsir.py):
pure-Python replay parity, partition invariance, feature shape,
selection determinism, and directional sanity."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.dsir import (
    dsir_fit,
    dsir_resample,
    dsir_scores,
    hashed_features,
)

B = 64  # small bucket count so collisions are exercised


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % B


def _feats(text: str):
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _fp(x: float) -> int:
    return math.floor(x * 1e6 + 0.5)


RAW = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "spam spam click here buy now cheap pills"),
    ("d3", "the theory of distributed computation and consensus"),
    ("d4", "buy cheap pills now click click click"),
    ("d5", "a careful analysis of the consensus protocol"),
    ("d6", "fox news spam buy now"),
    ("d7", "solo"),
]
TARGET_IDS = {"d1", "d3", "d5"}


def _py_model():
    tcnt, rcnt = {}, {}
    for did, text in RAW:
        for f in _feats(text):
            b = _bucket(f)
            rcnt[b] = rcnt.get(b, 0) + 1
            if did in TARGET_IDS:
                tcnt[b] = tcnt.get(b, 0) + 1
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    w = {}
    for b in set(tcnt) | set(rcnt):
        w[b] = _fp(math.log((tcnt.get(b, 0) + 1.0) / (tt + float(B)))) - _fp(
            math.log((rcnt.get(b, 0) + 1.0) / (rt + float(B)))
        )
    return w, tt, rt


def _py_scores():
    w, _, _ = _py_model()
    out = {}
    for did, text in RAW:
        out[did] = sum(w[_bucket(f)] for f in _feats(text))
    return out


def _py_key(did: str, score: int, seed: int) -> int:
    u = (
        int(hashlib.md5(f"{did}:dsir:{seed}".encode()).hexdigest()[:8], 16) + 0.5
    ) / 4294967296.0
    return score + _fp(-math.log(-math.log(u)))


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "doc_id string, text string")


@pytest.fixture(scope="module")
def scored(spark, raw_df):
    target = raw_df.where(F.col("doc_id").isin(*TARGET_IDS))
    model = dsir_fit(raw_df, target, n_buckets=B)
    return dsir_scores(model, raw_df)


def test_scores_match_python_replay(scored):
    got = {r["doc_id"]: r["score_fp"] for r in scored.collect()}
    assert got == _py_scores()


def test_scores_partition_invariant(spark, raw_df):
    target = raw_df.where(F.col("doc_id").isin(*TARGET_IDS)).repartition(5)
    model = dsir_fit(raw_df.repartition(7), target, n_buckets=B)
    got = {r["doc_id"]: r["score_fp"] for r in dsir_scores(model, raw_df.repartition(3)).collect()}
    assert got == _py_scores()


def test_feature_shape(spark):
    df = spark.createDataFrame(
        [("a", "solo"), ("b", "two tokens"), ("c", "   "), ("d", None)],
        "doc_id string, text string",
    )
    rows = hashed_features(df, n_buckets=B).groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in rows}
    # 1 unigram / 2 unigrams + 1 bigram; blank and NULL docs excluded
    assert got == {"a": 1, "b": 3}


def test_resample_matches_python_and_is_deterministic(scored):
    py = _py_scores()
    keys = sorted(
        ((_py_key(d, s, seed=7), d) for d, s in py.items()),
        key=lambda t: (-t[0], t[1]),
    )
    want = [(d, py[d], k) for k, d in keys[:3]]
    for _ in range(2):  # same answer on re-run
        got = [
            (r["doc_id"], r["score_fp"], r["key_fp"])
            for r in dsir_resample(scored, k=3, seed=7).collect()
        ]
        assert sorted(got) == sorted(want)


def test_resample_k_covers_all_and_validates(scored):
    assert dsir_resample(scored, k=1000).count() == len(RAW)
    with pytest.raises(ValueError):
        dsir_resample(scored, k=0)


def test_target_like_doc_outscores_off_target(scored):
    got = {r["doc_id"]: r["score_fp"] for r in scored.collect()}
    # d5 shares the target's vocabulary; d4 is pure off-target spam
    assert got["d5"] > got["d4"]
