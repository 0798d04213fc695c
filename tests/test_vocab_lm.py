"""Vocabulary stats / top-k (operators/vocab.py) and self-trained
char-n-gram LM quality scoring (operators/lm.py), parity-checked
against independent pure-Python brute forces.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from schemasaurus_spark.operators.lm import char_ngram_counts, lm_quality_score
from schemasaurus_spark.operators.vocab import token_stats, vocab_topk


def _mk(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _brute_token_stats(texts):
    tf: Counter = Counter()
    dfreq: Counter = Counter()
    for t in texts.values():
        if t is None or not t.strip():
            continue
        toks = re.split(r"\s+", t.strip().lower())
        tf.update(toks)
        dfreq.update(set(toks))
    return {w: (tf[w], dfreq[w]) for w in tf}


def test_token_stats_brute_force(spark):
    texts = {
        1: "the cat sat on the mat",
        2: "THE dog  and the cat",
        3: None,
        4: "   ",
        5: "mat",
    }
    got = {r.token: (r.tf, r.df_docs) for r in token_stats(_mk(spark, texts)).collect()}
    assert got == _brute_token_stats(texts)


def test_vocab_topk_order_and_ties(spark):
    texts = {1: "b b a a c", 2: "a b"}
    # tf: a=3, b=3, c=1 -> tie broken by token asc
    got = [(r.rank, r.token, r.tf, r.df_docs) for r in vocab_topk(_mk(spark, texts), 2).collect()]
    assert got == [(1, "a", 3, 2), (2, "b", 3, 2)]


def test_vocab_topk_k_exceeds_vocab(spark):
    got = vocab_topk(_mk(spark, {1: "x y"}), 10).collect()
    assert {r.token for r in got} == {"x", "y"} and len(got) == 2
    with pytest.raises(ValueError):
        vocab_topk(_mk(spark, {1: "x"}), 0)


def _brute_lm(texts, n=3, model_texts=None, laplace=False):
    def grams(t):
        t = t.strip().lower()
        return [t[i : i + n] for i in range(len(t) - n + 1)]

    model: Counter = Counter()
    for t in (model_texts or texts).values():
        if t is not None and len(t.strip().lower()) >= n:
            model.update(grams(t))
    total, v = sum(model.values()), len(model)
    out = {}
    for i, t in texts.items():
        if t is None or len(t.strip().lower()) < n:
            continue
        gs = grams(t)
        if laplace:
            lps = [math.log((model.get(g, 0) + 1) / (total + v)) for g in gs]
        else:
            lps = [math.log(model[g] / total) for g in gs if g in model]
        out[i] = (len(gs), round(sum(lps) / len(lps), 6))
    return out


def test_lm_self_trained_brute_force(spark):
    texts = {1: "abcabcabc", 2: "abcxyz", 3: "zz", 4: None, 5: "   abca  "}
    df = _mk(spark, texts)
    got = {r.doc_id: (r.n_grams, r.avg_logp) for r in lm_quality_score(df).collect()}
    want = _brute_lm(texts)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 2e-6


def test_lm_repetitive_text_scores_higher(spark):
    texts = {1: "aaaaaaaaaaaaaaaaaaaa", 2: "the quick brown fox jumps"}
    got = {r.doc_id: r.avg_logp for r in lm_quality_score(_mk(spark, texts)).collect()}
    # doc 1's grams are all 'aaa' (high corpus probability) -> higher logp
    assert got[1] > got[2]


def test_lm_laplace_external_model_unseen_grams(spark):
    model_df = _mk(spark, {10: "abcabc"})
    score_df = _mk(spark, {1: "abcq"})  # grams abc, bcq(unseen), cq? len 4 -> abc, bcq
    model = char_ngram_counts(model_df)
    got = lm_quality_score(score_df, model=model, laplace=True).collect()
    want = _brute_lm({1: "abcq"}, model_texts={10: "abcabc"}, laplace=True)
    assert len(got) == 1 and got[0].n_grams == want[1][0]
    assert abs(got[0].avg_logp - want[1][1]) < 2e-6


def test_lm_short_docs_omitted(spark):
    got = lm_quality_score(_mk(spark, {1: "ab", 2: "abcd"})).collect()
    assert [r.doc_id for r in got] == [2]


def test_novelty_profile_matches_brute_force(spark):
    """Hapax fraction vs a pure-Python reference; repeated rare tokens
    must not inflate novelty (distinct-token semantics)."""
    from schemasaurus_spark.operators.vocab import novelty_profile

    texts = {
        1: "alpha beta gamma alpha",          # alpha repeats in-doc only
        2: "beta delta epsilon",
        3: "zeta zeta zeta",                  # one unique token, repeated
        4: "beta gamma",                      # nothing unique
        5: None,
    }
    df = _mk(spark, texts)
    docs = {k: set(v.lower().split()) for k, v in texts.items() if v}
    dfreq = Counter(t for s in docs.values() for t in s)
    got = {
        r.doc_id: (r.n_distinct_tokens, r.n_hapax, r.novelty)
        for r in novelty_profile(df).collect()
    }
    assert set(got) == set(docs)
    for k, s in docs.items():
        hap = sum(1 for t in s if dfreq[t] == 1)
        assert got[k] == (len(s), hap, round(hap / len(s), 6))
    assert got[3] == (1, 1, 1.0)   # repetition can't fake breadth
    assert got[4][2] == 0.0        # pure boilerplate scores zero


def test_vocab_coverage_hand_computed(spark):
    from schemasaurus_spark.operators.vocab import vocab_coverage

    docs = spark.createDataFrame(
        [
            ("a", "the cat SAT on the mat"),  # vocab: the, cat, on -> oov: sat, mat
            ("b", "unknown words only"),
            ("c", None),
            ("d", "   "),
            ("e", "the the the"),
        ],
        "doc_id string, text string",
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("on",), ("mat",)], "token string"
    )
    got = {r.doc_id: r.asDict() for r in vocab_coverage(docs, vocab).collect()}
    assert got["a"] == {"doc_id": "a", "n_tokens": 6, "n_oov": 1,
                        "oov_bp": 10000 // 6}
    assert got["b"]["n_oov"] == 3 and got["b"]["oov_bp"] == 10000
    for d in ("c", "d"):
        assert got[d] == {"doc_id": d, "n_tokens": 0, "n_oov": 0, "oov_bp": 0}
    assert got["e"]["n_oov"] == 0 and got["e"]["oov_bp"] == 0
    # partition invariance
    re7 = {
        r.doc_id: r.asDict()
        for r in vocab_coverage(docs.repartition(7, "doc_id"), vocab).collect()
    }
    assert re7 == got


# --------------------------------------------------------- distinctive terms


def test_distinctive_terms_hand_computed(spark):
    import math

    from schemasaurus_spark.operators.vocab import distinctive_terms

    rows = [
        (1, "alpha alpha shared", "s1"),
        (2, "alpha shared", "s1"),
        (3, "beta shared", "s2"),
        (4, "gamma beta shared", "s2"),
        (5, "delta shared", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r.group, r.token): (r.rank, r.tf, r.df_groups, r.score_micro)
        for r in distinctive_terms(df, k=10).collect()
    }
    ln3 = math.floor(math.log(3.0) * 1000000.0 + 0.5)
    # 'alpha' only in s1, tf 3 -> top of s1; 'shared' in all 3 groups -> idf 0
    assert out[("s1", "alpha")] == (1, 3, 1, 3 * ln3)
    assert out[("s1", "shared")][3] == 0
    # s2: beta tf2 unique-to-s2 beats gamma tf1
    assert out[("s2", "beta")][0] == 1 and out[("s2", "gamma")][0] == 2
    assert out[("s3", "delta")][0] == 1


def test_distinctive_terms_k_and_determinism(spark):
    from schemasaurus_spark.operators.vocab import distinctive_terms

    rows = [(i, "aa bb cc dd ee", "s1") for i in range(5)] + [
        (10, "zz", "s2")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = [
        (r.rank, r.token)
        for r in distinctive_terms(df, k=3).where("group = 's1'").collect()
    ]
    # all five s1 tokens tie (same tf, same df) -> token-asc break, k=3 cut
    assert sorted(got) == [(1, "aa"), (2, "bb"), (3, "cc")]
    base = sorted(map(tuple, distinctive_terms(df, k=3).collect()))
    re7 = sorted(
        map(tuple, distinctive_terms(df.repartition(7, "doc_id"), k=3).collect())
    )
    assert base == re7


def test_distinctive_terms_null_handling_and_validation(spark):
    import pytest as _pytest

    from schemasaurus_spark.operators.vocab import distinctive_terms

    rows = [(1, "tok", "s1"), (2, None, "s1"), (3, "   ", "s1"), (4, "tok", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = distinctive_terms(df, k=5).collect()
    assert {r.group for r in out} == {"s1"}  # NULL group carries no terms
    with _pytest.raises(ValueError):
        distinctive_terms(df, k=0)
