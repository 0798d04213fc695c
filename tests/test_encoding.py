"""Script/mojibake profile: hand-computed fixtures, tie precedence,
NULL text, purity arithmetic, partition invariance, zero-shuffle plan."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.encoding import script_profile

SCHEMA = "doc_id string, text string"


def _profile(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r.doc_id: r.asDict() for r in script_profile(df).collect()}


def test_hand_computed_scripts(spark):
    got = _profile(
        spark,
        [
            ("lat", "Hello world"),
            ("cyr", "привет мир"),
            ("cjk", "你好世界"),
            ("mix", "abc привет"),
            ("heb", "שלום"),
            ("hang", "한국어"),
            ("deva", "हिन्दी"),
            ("arab", "مرحبا"),
            ("greek", "Ελλάς"),
        ],
    )
    assert got["lat"]["dominant_script"] == "latin"
    assert got["lat"]["n_latin"] == 10 and got["lat"]["n_chars"] == 11
    assert got["lat"]["script_purity_bp"] == 10000
    assert got["cyr"]["dominant_script"] == "cyrillic"
    assert got["cyr"]["n_cyrillic"] == 9
    assert got["cjk"]["dominant_script"] == "cjk" and got["cjk"]["n_cjk"] == 4
    # mix: 3 latin vs 6 cyrillic -> cyrillic, purity 6/9
    m = got["mix"]
    assert m["dominant_script"] == "cyrillic"
    assert m["script_purity_bp"] == 6 * 10000 // 9
    for d, s in [
        ("heb", "hebrew"),
        ("hang", "hangul"),
        ("deva", "devanagari"),
        ("arab", "arabic"),
        ("greek", "greek"),
    ]:
        assert got[d]["dominant_script"] == s, d


def test_mojibake_artifacts(spark):
    got = _profile(
        spark,
        [
            # "é" double-decoded -> U+00C3 U+00A9; "’" -> U+00E2 U+0080 U+0099
            ("moj", "cafÃ© itâs"),
            ("rep", "bad �� bytes"),
            ("c1", "xyz"),
            ("clean", "just ascii text"),
        ],
    )
    moj = got["moj"]
    # Ã© pair + â+U+0080 pair; U+0080 and the trailing U+0099 are C1 chars
    assert moj["n_mojibake_pairs"] == 2
    assert moj["n_c1"] == 2
    assert got["rep"]["n_replacement"] == 2
    assert got["c1"]["n_c1"] == 2
    assert got["c1"]["n_mojibake_pairs"] == 0
    clean = got["clean"]
    assert clean["n_mojibake_pairs"] == 0
    assert clean["n_replacement"] == 0 and clean["n_c1"] == 0


def test_tie_breaks_by_precedence_order(spark):
    # equal latin and cyrillic counts -> latin (first in SCRIPT_RANGES)
    got = _profile(spark, [("tie", "abпр")])
    assert got["tie"]["dominant_script"] == "latin"
    assert got["tie"]["script_purity_bp"] == 5000


def test_null_and_empty_text(spark):
    got = _profile(spark, [("n", None), ("e", "")])
    for d in ("n", "e"):
        r = got[d]
        assert r["n_chars"] == 0 and r["dominant_script"] == "none"
        assert r["script_purity_bp"] == 0
        assert r["n_latin"] == 0 and r["n_replacement"] == 0


def test_digits_punct_not_script_chars(spark):
    got = _profile(spark, [("d", "123 456 !!")])
    assert got["d"]["dominant_script"] == "none"
    assert got["d"]["n_chars"] == 10
    assert got["d"]["n_latin"] == 0


def test_partition_invariance(spark):
    rows = [
        (f"d{i}", ("latin text " * (i % 3 + 1)) + "п" * (i % 5))
        for i in range(40)
    ] + [("dup", "привет"), ("dup", "hello")]
    df = spark.createDataFrame(rows, SCHEMA)
    base = sorted(map(tuple, script_profile(df).collect()))
    re7 = sorted(map(tuple, script_profile(df.repartition(7, "doc_id")).collect()))
    assert base == re7
    # duplicate doc_ids stay separate physical rows
    assert sum(1 for t in base if t[0] == "dup") == 2


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("a", "x")], SCHEMA)
    plan = script_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
