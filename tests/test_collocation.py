"""Collocation PMI top-k (operators/collocation.py): closed-form counts
and PMI on a planted corpus, deterministic tie-break, k cutoff, and
contract-vs-oracle parity."""

import math

import pytest

from schemasaurus_spark.operators.collocation import collocation_topk


def _run(spark, texts, k):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = collocation_topk(df, k=k).collect()
    return {
        (r["lft"], r["rgt"]): (r["n_pair"], r["n_left"], r["n_right"], r["pmi"])
        for r in out
    }


def test_closed_form_counts_and_pmi(spark):
    # corpus: 'a b' x3, 'c d' x1 -> tokens: a,b x3 + c,d -> N=8, P=4
    got = _run(spark, ["a b", "a b", "a b", "c d"], k=10)
    n_pair, n_l, n_r, pmi = got[("a", "b")]
    assert (n_pair, n_l, n_r) == (3, 3, 3)
    assert pmi == round(math.log((3 * 8 * 8) / (4 * 3 * 3)), 6)
    assert got[("c", "d")][0] == 1


def test_k_cutoff_and_tiebreak(spark):
    # four pairs each once; k=2 must take the lexicographically first two
    got = _run(spark, ["z y", "b a", "m n", "a c"], k=2)
    assert set(got) == {("a", "c"), ("b", "a")}


def test_cross_doc_pairs_never_form(spark):
    got = _run(spark, ["a", "b"], k=10)  # single-token docs: no pairs
    assert got == {}


def test_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        collocation_topk(df, k=0)


def test_contract_query_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    sdf = entrymod.doc_collocations(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    odf = con.sql(entrymod._COLLOC_ORACLE).df()
    cols = ["lft", "rgt", "n_pair", "n_left", "n_right", "pmi"]
    key = lambda d: sorted(tuple(row) for row in d[cols].values.tolist())
    assert key(sdf) == key(odf)
    assert len(sdf) == 20
