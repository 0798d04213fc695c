"""Source-overlap matrix (operators/overlap.py): closed-form counts on a
planted corpus, distinct-window semantics, 3+-source fan-out, short-doc
exclusion, partition-invariance, and contract-vs-oracle parity."""

import pytest

from schemasaurus_spark.operators.overlap import source_overlap_matrix


def _run(spark, rows, window=3, n_part=None):
    df = spark.createDataFrame(rows, "source string, text string")
    if n_part:
        df = df.repartition(n_part)
    out = source_overlap_matrix(df, window=window).collect()
    return {
        (r["source_a"], r["source_b"]): (
            r["shared_windows"],
            r["windows_a"],
            r["windows_b"],
            r["jaccard"],
        )
        for r in out
    }


def test_planted_overlap_closed_form(spark):
    # shared 3-window: 'a b c'; s1 also has 'b c d', s2 also has 'c d e'
    rows = [("s1", "a b c d"), ("s2", "a b c"), ("s2", "c d e")]
    got = _run(spark, rows)
    # s1 windows: {a b c, b c d}; s2 windows: {a b c, c d e}
    assert got == {("s1", "s2"): (1, 2, 2, round(1 / 3, 6))}


def test_duplicate_windows_within_source_count_once(spark):
    rows = [("s1", "a b c"), ("s1", "a b c"), ("s2", "a b c")]
    got = _run(spark, rows)
    assert got == {("s1", "s2"): (1, 1, 1, 1.0)}


def test_three_sources_all_pairs(spark):
    rows = [("s1", "x y z"), ("s2", "x y z"), ("s3", "x y z p")]
    got = _run(spark, rows)
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert got[("s1", "s2")][0] == 1
    assert got[("s1", "s3")] == (1, 1, 2, 0.5)


def test_short_docs_emit_no_windows(spark):
    rows = [("s1", "a b"), ("s2", "a b"), ("s1", "q r s"), ("s2", "q r s")]
    got = _run(spark, rows)
    assert got == {("s1", "s2"): (1, 1, 1, 1.0)}


def test_disjoint_sources_absent(spark):
    got = _run(spark, [("s1", "a b c"), ("s2", "d e f")])
    assert got == {}


def test_partition_invariance(spark):
    rows = [(f"s{i % 3}", f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{i % 7}") for i in range(60)]
    assert _run(spark, rows, n_part=1) == _run(spark, rows, n_part=7)


def test_rejects_bad_window(spark):
    df = spark.createDataFrame([("s", "a b")], "source string, text string")
    with pytest.raises(ValueError):
        source_overlap_matrix(df, window=0)
