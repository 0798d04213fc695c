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
