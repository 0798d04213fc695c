"""Interleave profile: hand-computed fixtures (runs, switches, boundary
kinds, empty/NULL spans) and the zero-shuffle plan pin."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.interleave import interleave_profile

SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def _span(kind, ref=None):
    return (kind, "x" if kind == "text" else None, ref, 0)


def test_profile_hand_computed(spark):
    rows = [
        # text text image text ref ref -> switches 3, runs: text 2 / nontext 2
        (
            "a",
            [
                _span("text"),
                _span("text"),
                _span("image", "media://img/1"),
                _span("text"),
                _span("ref"),
                _span("ref"),
            ],
        ),
        ("b", [_span("audio", "media://aud/2")]),  # single nontext span
        ("c", []),  # empty
        ("d", None),  # NULL spans
        ("e", [_span("text"), _span("text"), _span("text")]),  # all text
    ]
    got = {
        r.doc_id: r.asDict()
        for r in interleave_profile(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    a = got["a"]
    assert (a["n_spans"], a["n_text"], a["n_image"], a["n_audio"], a["n_ref"]) == (
        6, 3, 1, 0, 2,
    )
    assert a["n_media_refs"] == 1
    assert a["n_switches"] == 3  # pairs (t,t)(t,i)(i,t)(t,r)(r,r) -> 3 changes
    assert a["max_text_run"] == 2 and a["max_nontext_run"] == 2
    assert a["first_kind"] == "text" and a["last_kind"] == "ref"

    b = got["b"]
    assert (b["n_spans"], b["n_switches"]) == (1, 0)
    assert (b["max_text_run"], b["max_nontext_run"]) == (0, 1)
    assert b["first_kind"] == b["last_kind"] == "audio"

    for k in ("c", "d"):
        row = got[k]
        assert row["n_spans"] == 0 and row["n_switches"] == 0
        assert row["max_text_run"] == 0 and row["max_nontext_run"] == 0
        assert row["first_kind"] is None and row["last_kind"] is None

    e = got["e"]
    assert e["n_switches"] == 0 and e["max_text_run"] == 3
    assert e["max_nontext_run"] == 0


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("a", [_span("text")])], SCHEMA)
    plan = (
        interleave_profile(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_duplicate_doc_ids_profile_independently(spark):
    """Two physical rows sharing a doc_id must yield two rows profiled
    from their OWN spans (the explode+window approach would merge them)."""
    rows = [
        ("dup", [_span("text"), _span("image", "m")]),
        ("dup", [_span("audio", "m"), _span("audio", "m"), _span("audio", "m")]),
    ]
    got = sorted(
        (r.n_spans, r.n_switches, r.max_nontext_run)
        for r in interleave_profile(spark.createDataFrame(rows, SCHEMA)).collect()
    )
    assert got == [(2, 1, 1), (3, 0, 3)]


def test_render_training_text_hand_computed(spark):
    rows = [
        (
            "a",
            [
                ("text", "hello world", None, 0),
                ("image", None, "media://img/1", 11),
                ("text", "caption", None, 12),
                ("audio", None, "media://aud/2", 19),
                ("ref", None, None, 20),  # NULL media_ref: placeholder, no manifest entry
            ],
        ),
        ("b", [("text", None, None, 0)]),  # NULL text renders as empty piece
        ("c", []),
        ("d", None),
    ]
    from schemasaurus_spark.operators.interleave import render_training_text

    got = {
        r.doc_id: r.asDict()
        for r in render_training_text(
            spark.createDataFrame(rows, SCHEMA)
        ).collect()
    }
    a = got["a"]
    assert a["training_text"] == "hello world\n<|image|>\ncaption\n<|audio|>\n<|ref|>"
    assert a["media_refs_csv"] == "media://img/1,media://aud/2"
    assert a["n_chars"] == len(a["training_text"])
    assert a["n_text_chars"] == len("hello world") + len("caption")
    assert a["n_placeholders"] == 3
    b = got["b"]
    assert b["training_text"] == "" and b["n_chars"] == 0
    assert b["n_text_chars"] == 0 and b["n_placeholders"] == 0
    for empty in ("c", "d"):
        e = got[empty]
        assert e["training_text"] is None
        assert e["media_refs_csv"] == ""
        assert (e["n_chars"], e["n_text_chars"], e["n_placeholders"]) == (0, 0, 0)


def test_render_training_text_duplicate_ids_and_partition_invariance(spark):
    from schemasaurus_spark.operators.interleave import render_training_text

    rows = [
        ("dup", [("text", "first", None, 0)]),
        ("dup", [("image", None, "media://img/9", 0)]),
    ] + [
        (f"doc{i}", [("text", f"t{i}", None, 0), ("ref", None, f"media://r/{i}", 2)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    base = sorted(
        (r.doc_id, r.training_text, r.media_refs_csv)
        for r in render_training_text(df).collect()
    )
    # duplicate doc_ids stay separate physical rows
    assert [t for t in base if t[0] == "dup"] == [
        ("dup", "<|image|>", "media://img/9"),
        ("dup", "first", ""),
    ]
    repart = sorted(
        (r.doc_id, r.training_text, r.media_refs_csv)
        for r in render_training_text(df.repartition(7, "doc_id")).collect()
    )
    assert repart == base


def test_render_training_text_zero_shuffle_plan(spark):
    from schemasaurus_spark.operators.interleave import render_training_text

    df = spark.createDataFrame([("a", [("text", "x", None, 0)])], SCHEMA)
    plan = render_training_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
