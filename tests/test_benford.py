"""Benford first-digit audit: hand-checkable counts, the exact round-6
arithmetic chain (expected_p rounded FIRST, terms from the rounded p),
zero-count digits present, non-positive/NULL exclusion, and the one-row
verdict gate."""

from __future__ import annotations

import math

from schemasaurus_spark.operators.stats import benford_profile, benford_verdict


def _expected_p(d: int) -> float:
    return round(math.log(1.0 + 1.0 / d) / math.log(10.0), 6)


def _rows(spark, values):
    return spark.createDataFrame([(v,) for v in values], "amount long")


def test_profile_counts_shares_and_chi2_chain(spark):
    vals = [1, 1, 2, 19, 30, 35, 999, 0, -5, None]
    out = {r["digit"]: r for r in benford_profile(_rows(spark, vals), "amount").collect()}
    assert set(out) == set(range(1, 10)), "all nine digits must emit rows"
    n = 7  # positives only
    want_cnt = {1: 3, 2: 1, 3: 2, 9: 1}
    for d in range(1, 10):
        r = out[d]
        cnt = want_cnt.get(d, 0)
        assert r["cnt"] == cnt
        assert r["share"] == round(cnt / n, 6)
        p = _expected_p(d)
        assert r["expected_p"] == p
        assert r["chi2_term"] == round((cnt - n * p) ** 2 / (n * p), 6)


def test_empty_input_yields_null_shares(spark):
    out = benford_profile(_rows(spark, [0, -3, None]), "amount").collect()
    assert len(out) == 9
    assert all(r["cnt"] == 0 and r["share"] is None and r["chi2_term"] is None
               for r in out)
    # expected_p is data-independent and still present
    assert all(r["expected_p"] == _expected_p(r["digit"]) for r in out)


def test_verdict_flags_minted_and_passes_benford_like(spark):
    # minted: every value leads with digit 1 — chi2 blows past 15.507
    minted = benford_verdict(_rows(spark, list(range(10, 110))), "amount").collect()[0]
    assert minted["n"] == 100 and minted["flagged"]
    # grown: counts proportional to Benford probabilities (cnt = round(1000*p))
    grown_vals = []
    for d in range(1, 10):
        grown_vals += [d * 10] * round(1000 * _expected_p(d))
    grown = benford_verdict(_rows(spark, grown_vals), "amount").collect()[0]
    assert not grown["flagged"] and grown["chi2"] < 1.0
