"""BPE tokenizer induction (operators/bpe.py): exact parity with a
pure-Python textbook reference, same-token-run greedy semantics,
deterministic tie-breaks, early stop, apply_bpe round-trip, and
partition-invariance of the integer pair counts."""

import re
from collections import Counter

import pytest

from schemasaurus_spark.operators.bpe import (
    apply_bpe,
    bpe_merge_table,
    word_frequency_table,
)


def _py_bpe(texts, n_merges, max_word_len=24):
    """Textbook BPE (Sennrich et al.) on word frequencies, greedy
    left-to-right merge scan, tie-break (cnt desc, (lft, rgt) asc)."""
    wf = Counter()
    for t in texts:
        if t is None:
            continue
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w and len(w) <= max_word_len:
                wf[w] += 1
    vocab = {w: list(w) + ["_"] for w in wf}
    merges = []
    for step in range(1, n_merges + 1):
        pc = Counter()
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += wf[w]
        if not pc:
            break
        (lft, rgt), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((step, lft, rgt, cnt))
        for w, toks in vocab.items():
            acc = [toks[0]]
            for x in toks[1:]:
                if acc[-1] == lft and x == rgt:
                    acc[-1] = lft + rgt
                else:
                    acc.append(x)
            vocab[w] = acc
    return merges, vocab


def _learn(spark, texts, n_merges, n_part=None):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    if n_part:
        df = df.repartition(n_part)
    rows = bpe_merge_table(df, "text", n_merges=n_merges).collect()
    return [(r["step"], r["lft"], r["rgt"], r["cnt"]) for r in rows]


CORPUS = [
    "the cat sat on the mat",
    "the cats chatter that the mats hold",
    "a tattered hat that the cat had",
    None,
    "   ",
]


def test_matches_python_reference(spark):
    got = sorted(_learn(spark, CORPUS, 6))
    want, _ = _py_bpe(CORPUS, 6)
    assert got == sorted(want)
    assert len(got) == 6


def test_same_token_runs_merge_greedily(spark):
    # 'aaaaa' must tokenize [aa, aa, a, _] after merging (a,a) — the
    # textbook non-overlapping scan, not [aa, aaa]
    texts = ["aaaaa aaaaa baba"]
    got = _learn(spark, texts, 1)
    want, vocab = _py_bpe(texts, 1)
    assert got == want
    assert got[0][1:3] == ("a", "a")
    assert vocab["aaaaa"] == ["aa", "aa", "a", "_"]


def test_tie_break_is_lexicographic(spark):
    # 'xy' and 'ab' pairs both appear twice; (a,b) < (x,y) must win
    got = _learn(spark, ["ab ab", "xy xy"], 1)
    want, _ = _py_bpe(["ab ab", "xy xy"], 1)
    assert got == want
    assert got[0][1:3] == ("a", "b")


def test_early_stop_when_no_repeated_pair(spark):
    # every word unique with disjoint alphabets: all pair counts are 1
    got = _learn(spark, ["abc def", "ghi jkl"], 5)
    assert got == []


def test_apply_bpe_reproduces_learning_state(spark):
    merges = _learn(spark, CORPUS, 5)
    df = spark.createDataFrame([(t,) for t in CORPUS if t], "text string")
    toks = apply_bpe(
        word_frequency_table(df, "text"), [(l, r) for _, l, r, _ in merges]
    )
    got = {r["word"]: r["toks"] for r in toks.collect()}
    _, vocab = _py_bpe(CORPUS, 5)
    assert got == vocab


def test_partition_invariance(spark):
    a = _learn(spark, CORPUS, 4, n_part=1)
    b = _learn(spark, CORPUS, 4, n_part=7)
    assert a == b


def test_rejects_bad_n_merges(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_merge_table(df, "text", n_merges=0)


def test_contract_query_matches_oracle(spark, tmp_path):
    import duckdb

    import __spark_entry__ as entrymod

    docs = spark.createDataFrame(
        [(i, CORPUS[i % 3] + f" extra{i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    sdf = entrymod.doc_bpe_merges(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    odf = con.sql(entrymod._bpe_oracle_sql(8)).df()
    key = lambda d: sorted(map(tuple, d[["step", "lft", "rgt", "cnt"]].values))
    assert key(sdf) == key(odf)
    assert len(sdf) == 8
