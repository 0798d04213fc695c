"""Target-weighted source mixing (operators/mixing.py): rates derived
in-plan from observed counts, deterministic md5-bucket down/upsampling
with epoch-tagged repeats.  Parity-checked against an independent
pure-Python brute force (hashlib md5, float rate arithmetic).
"""

from __future__ import annotations

import hashlib
import math

import pytest

from schemasaurus_spark.operators.mixing import mix_sources, mixture_rates

BUCKETS = 1 << 16


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string")


def _bucket(key: int, seed: int = 0) -> int:
    return int(hashlib.md5(f"{key}:mix:{seed}".encode()).hexdigest()[:4], 16)


def _brute_mix(rows, weights, budget=None, factor=None, seed=0):
    """Independent recompute: same rate formula, same bucket scheme."""
    counts: dict[str, int] = {}
    for _, src in rows:
        counts[src] = counts.get(src, 0) + 1
    total = sum(counts.values())
    b = float(factor) * float(total) if factor is not None else float(budget)
    out = set()
    for doc_id, src in rows:
        rate = b * float(weights.get(src, 0.0)) / float(counts[src])
        full = math.floor(rate)
        thr = math.floor((rate - full) * BUCKETS)
        n = int(full) + (1 if _bucket(doc_id, seed) < thr else 0)
        for epoch in range(n):
            out.add((doc_id, src, epoch))
    return out


def test_integer_rate_repeats_every_doc(spark):
    # 4 docs in one source, weight 1.0, budget 8 -> rate exactly 2.0
    df = _mk(spark, [(i, "a") for i in range(4)])
    got = mix_sources(df, {"a": 1.0}, budget_docs=8).collect()
    assert sorted((r.doc_id, r.epoch) for r in got) == [
        (i, e) for i in range(4) for e in (0, 1)
    ]


def test_zero_weight_source_dropped(spark):
    df = _mk(spark, [(1, "a"), (2, "b")])
    got = mix_sources(df, {"a": 1.0}, budget_docs=1).collect()
    assert {r.source for r in got} <= {"a"}


def test_downsample_epoch_always_zero(spark):
    df = _mk(spark, [(i, "a") for i in range(200)])
    got = mix_sources(df, {"a": 1.0}, budget_docs=100).collect()
    assert got and all(r.epoch == 0 for r in got)
    # md5-bucket keep is Bernoulli per key: 4 sigma = 4*sqrt(200*0.25) = 28
    assert abs(len(got) - 100) <= 28


def test_brute_force_parity_mixed_rates(spark):
    rows = [(i, f"s{i % 3}") for i in range(90)]
    weights = {"s0": 0.5, "s1": 0.3, "s2": 0.1}
    df = _mk(spark, rows)
    got = {
        (r.doc_id, r.source, r.epoch)
        for r in mix_sources(df, weights, budget_factor=1.7, seed=3).collect()
    }
    assert got == _brute_mix(rows, weights, factor=1.7, seed=3)


def test_partitioning_invariant(spark):
    rows = [(i, f"s{i % 4}") for i in range(120)]
    weights = {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}
    df = _mk(spark, rows)
    a = {
        (r.doc_id, r.epoch)
        for r in mix_sources(df, weights, budget_docs=150).collect()
    }
    b = {
        (r.doc_id, r.epoch)
        for r in mix_sources(df.repartition(7), weights, budget_docs=150).collect()
    }
    assert a == b


def test_rates_frame(spark):
    df = _mk(spark, [(i, "a") for i in range(10)] + [(i + 100, "b") for i in range(5)])
    rates = {
        r.source: (r.n_source, r.rate)
        for r in mixture_rates(df, {"a": 0.5, "b": 0.5}, budget_docs=30).collect()
    }
    assert rates == {"a": (10, 1.5), "b": (5, 3.0)}


def test_api_errors(spark):
    df = _mk(spark, [(1, "a")])
    with pytest.raises(ValueError):
        mixture_rates(df, {"a": 1.0})  # neither budget
    with pytest.raises(ValueError):
        mixture_rates(df, {"a": 1.0}, budget_docs=1, budget_factor=1.0)  # both
    with pytest.raises(ValueError):
        mix_sources(df, {"a": -0.5}, budget_docs=1)  # negative weight


def test_temperature_weights_properties():
    from schemasaurus_spark.operators.mixing import temperature_weights

    counts = {"big": 900, "mid": 90, "small": 10}
    natural = temperature_weights(counts, alpha=1.0)
    assert abs(natural["big"] - 0.9) < 1e-12
    flat = temperature_weights(counts, alpha=0.0)
    assert all(abs(w - 1 / 3) < 1e-12 for w in flat.values())
    t = temperature_weights(counts, alpha=0.3)
    assert abs(sum(t.values()) - 1.0) < 1e-12
    # temperature compresses the range: small gains, big loses
    assert t["small"] > natural["small"] and t["big"] < natural["big"]
    assert temperature_weights({}) == {}
    assert "z" not in temperature_weights({"z": 0, "a": 5})
    with pytest.raises(ValueError):
        temperature_weights(counts, alpha=-1)


def test_temperature_weights_feed_mix_sources(spark):
    from schemasaurus_spark.operators.mixing import temperature_weights

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = _mk(spark, rows)
    w = temperature_weights({"big": 90, "small": 10}, alpha=0.5)
    got = mix_sources(df, w, budget_factor=1.0).collect()
    n_small = sum(1 for r in got if r.source == "small")
    n_big = len(got) - n_small
    # alpha=0.5: w_small = sqrt(10)/(sqrt(90)+sqrt(10)) = 0.25 -> ~25 rows
    # from 10 docs (upsampled), ~75 from 90 (downsampled)
    assert 20 <= n_small <= 30 and 65 <= n_big <= 85
