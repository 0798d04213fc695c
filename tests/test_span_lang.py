"""Span-level language consistency (text.span_lang_profile): majority /
minority / und closed forms, und-excluded majority, tie discipline,
NULL spans, duplicate doc_ids, partition invariance."""

from schemasaurus_spark.operators.text import span_lang_profile

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _t(text, off=0):
    return ("text", text, None, off)


def test_majority_minority_und(spark):
    rows = [
        (
            "d1",
            [
                _t("the cat and the dog", 0),
                _t("of the house", 10),
                _t("der hund ist nicht da", 20),  # german minority
                _t("xyzzy qwerty", 30),  # und
                ("image", None, "media://img/1", 40),  # not a text span
            ],
        )
    ]
    r = span_lang_profile(_df(spark, rows)).collect()[0]
    assert r["majority_lang"] == "en"
    assert r["n_text_spans"] == 4
    assert r["n_und"] == 1
    assert r["n_minority"] == 1


def test_und_never_outvotes_identified(spark):
    rows = [("d", [_t("zzz aaa"), _t("bbb ccc"), _t("the of to")])]
    r = span_lang_profile(_df(spark, rows)).collect()[0]
    # 2 und spans vs 1 english: majority is the identified language
    assert r["majority_lang"] == "en"
    assert (r["n_und"], r["n_minority"]) == (2, 0)


def test_all_und_and_tie_discipline(spark):
    rows = [
        ("a", [_t("zzz"), _t("qqq")]),
        # one de span, one en span: tie -> earliest code (de < en)
        ("b", [_t("der und ist"), _t("the of is")]),
        ("c", None),
    ]
    got = {r["doc_id"]: r for r in span_lang_profile(_df(spark, rows)).collect()}
    assert got["a"]["majority_lang"] == "und"
    assert got["a"]["n_minority"] == 0
    assert got["b"]["majority_lang"] == "de"
    assert got["b"]["n_minority"] == 1  # the en span disagrees
    assert got["c"]["majority_lang"] == "und"
    assert (got["c"]["n_text_spans"], got["c"]["n_und"]) == (0, 0)


def test_duplicate_doc_ids_stay_separate_rows(spark):
    rows = [
        ("dup", [_t("the of is")]),
        ("dup", [_t("der und ist")]),
    ]
    got = sorted(
        (r["doc_id"], r["majority_lang"])
        for r in span_lang_profile(_df(spark, rows)).collect()
    )
    assert got == [("dup", "de"), ("dup", "en")]


def test_partition_invariance(spark):
    rows = [
        (f"d{i}", [_t("the of is"), _t("el los es" if i % 3 else "zzz")])
        for i in range(30)
    ]
    df = _df(spark, rows)
    a = sorted(span_lang_profile(df).collect(), key=lambda r: r["doc_id"])
    b = sorted(
        span_lang_profile(df.repartition(7, "doc_id")).collect(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_readability_profile_hand_computed(spark):
    import math

    from schemasaurus_spark.operators.text import readability_profile

    rows = [
        ("a", "The cat sat. The dog ran!"),
        ("b", "xyz"),          # no vowels -> 1 syllable, no sentence mark -> 1
        ("c", None),
        ("d", "   "),
        ("e", "Wait... what?! Really."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.asDict() for r in readability_profile(df).collect()}

    a = got["a"]
    # words: the cat sat. the dog ran! -> 6; sentences: '.' and '!' runs -> 2
    # syllables: the(1) cat(1) sat.(1) the(1) dog(1) ran!(1) = 6
    assert (a["n_words"], a["n_sentences"], a["n_syllables"]) == (6, 2, 6)
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert a["flesch_x100"] == math.floor(expect * 100 + 0.5)

    b = got["b"]
    assert (b["n_words"], b["n_sentences"], b["n_syllables"]) == (1, 1, 1)

    for d in ("c", "d"):
        r = got[d]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (0, 0, 0)
        assert r["flesch_x100"] is None

    # '...' and '?!' are single sentence runs
    assert got["e"]["n_sentences"] == 3

    re7 = {
        r.doc_id: r.asDict()
        for r in readability_profile(df.repartition(7, "doc_id")).collect()
    }
    assert re7 == got
