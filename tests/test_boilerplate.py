"""Inter-document boilerplate removal (operators/boilerplate.py):
closed-form profile + removal, normalization folding (case/whitespace),
exact integer share threshold at the boundary, min_docs floor,
all-boilerplate and no-line documents, empty-line skipping, and
partition invariance."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _corpus(spark):
    # source A: 4 line-contributing docs.
    #  - footer appears in all 4 (raw variants that normalize equal)
    #  - "subscribe now" appears in exactly 2 of 4 (50% boundary)
    #  - each doc has a unique body line
    # source B: 2 docs sharing one line -> boilerplate only within B.
    return _docs(
        spark,
        [
            (1, "A", "Home | About\nalpha body one\nSubscribe Now"),
            (2, "A", "home | about\nbeta body two\nsubscribe  now"),
            (3, "A", "HOME  |  ABOUT\ngamma body three"),
            (4, "A", " home | about \ndelta body four\n\n  \n"),
            (5, "A", None),  # NULL text: no output row at all
            (6, "B", "b-shared line\nunique six"),
            (7, "B", "B-SHARED  LINE\nunique seven"),
        ],
    )


def test_profile_closed_form(spark):
    got = {
        (r["source"], r["line_norm"]): (r["n_docs"], r["n_source_docs"])
        for r in boilerplate_lines(_corpus(spark)).collect()
    }
    # footer: 4/4 docs of A; subscribe: 2/4 = exactly 50% (boundary kept
    # IN by >=); b-shared: 2/2 of B. Unique bodies never appear.
    assert got == {
        ("A", "home | about"): (4, 4),
        ("A", "subscribe now"): (2, 4),
        ("B", "b-shared line"): (2, 2),
    }


def test_threshold_boundary_and_min_docs(spark):
    df = _corpus(spark)
    # raising min_pct past 50 drops the subscribe line (2*100 < 51*4)
    norms = {
        r["line_norm"] for r in boilerplate_lines(df, min_pct=51).collect()
    }
    assert norms == {"home | about", "b-shared line"}
    # min_docs=3 drops both 2-doc lines regardless of share
    norms = {r["line_norm"] for r in boilerplate_lines(df, min_docs=3).collect()}
    assert norms == {"home | about"}


def test_removal_closed_form(spark):
    got = {
        r["doc_id"]: r for r in remove_boilerplate_lines(_corpus(spark)).collect()
    }
    # doc 5 (NULL text) emits nothing; docs 1-4, 6-7 each get one row
    assert set(got) == {1, 2, 3, 4, 6, 7}
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 1)
    assert got[1]["clean_text"] == "alpha body one"
    # raw (unnormalized) surviving text is preserved
    assert got[2]["clean_text"] == "beta body two"
    assert got[3]["clean_text"] == "gamma body three"
    # empty lines in doc 4 are ignored, not counted, not emitted
    assert (got[4]["n_lines"], got[4]["n_kept"]) == (2, 1)
    assert got[4]["clean_text"] == "delta body four"
    assert got[6]["clean_text"] == "unique six"
    assert got[7]["clean_text"] == "unique seven"


def test_all_boilerplate_and_no_line_docs(spark):
    df = _docs(
        spark,
        [
            (1, "A", "same line"),
            (2, "A", "SAME  LINE"),
            (3, "A", "   \n\n"),  # text present, zero non-empty lines
        ],
    )
    got = {
        r["doc_id"]: r for r in remove_boilerplate_lines(df).collect()
    }
    assert set(got) == {1, 2, 3}
    for d in (1, 2):
        assert (got[d]["n_lines"], got[d]["n_kept"], got[d]["clean_text"]) == (
            1,
            0,
            "",
        )
    assert (got[3]["n_lines"], got[3]["n_kept"], got[3]["clean_text"]) == (0, 0, "")


def test_order_preserved_on_multiline_survivors(spark):
    df = _docs(
        spark,
        [
            (1, "A", "bp\nfirst\nsecond\nthird"),
            (2, "A", "bp\nother"),
        ],
    )
    got = {r["doc_id"]: r for r in remove_boilerplate_lines(df).collect()}
    assert got[1]["clean_text"] == "first\nsecond\nthird"


def test_partition_invariance(spark):
    df = _corpus(spark)
    a = sorted(
        remove_boilerplate_lines(df).collect(), key=lambda r: r["doc_id"]
    )
    b = sorted(
        remove_boilerplate_lines(df.repartition(7, "doc_id")).collect(),
        key=lambda r: r["doc_id"],
    )
    assert a == b
