"""Cross-span sequence integrity: each code fires on exactly its fault,
clean corpora are empty, pair codes are mutually exclusive, and the
planted-fault fixture exercises every code."""

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.span_integrity import (
    plant_sequence_faults,
    span_integrity_violations,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _viol(spark, rows):
    out = span_integrity_violations(_docs(spark, rows))
    return [tuple(r) for r in out.collect()]


def test_clean_doc_is_empty(spark):
    rows = [
        (
            "d1",
            [
                ("text", "hello world", None, 0),
                ("image", None, "media://img/1", 100),
                ("audio", None, "media://aud/2", 200),
                ("ref", None, None, 300),
            ],
        )
    ]
    assert _viol(spark, rows) == []


def test_span_order_and_overlap_mutually_exclusive(spark):
    rows = [
        # out of order (tie): spanOrder only
        ("d1", [("text", "abcde", None, 50), ("ref", None, None, 50)]),
        # ordered but text extent [50, 55) overruns next offset 52: overlap only
        ("d2", [("text", "abcde", None, 50), ("ref", None, None, 52)]),
        # regression (offset decreases): spanOrder only, never both
        ("d3", [("text", "abcde", None, 50), ("ref", None, None, 40)]),
    ]
    got = sorted(_viol(spark, rows))
    assert got == [
        ("d1", 1, "spanOrder", "/spans/1/offset", "50", "50"),
        ("d2", 1, "spanOverlap", "/spans/1/offset", "52", "55"),
        ("d3", 1, "spanOrder", "/spans/1/offset", "40", "50"),
    ]


def test_conditional_field_codes(spark):
    rows = [
        ("d1", [("text", None, None, 0)]),  # text span without text
        ("d2", [("ref", "stray", None, 0)]),  # text on a non-text span
        ("d3", [("image", None, None, 0)]),  # media span without ref
        ("d4", [("image", None, "media://aud/7", 0)]),  # kind/ref mismatch
        ("d5", [("audio", None, "media://img/7", 0)]),
    ]
    got = sorted(_viol(spark, rows))
    assert got == [
        ("d1", 0, "spanTextRequired", "/spans/0/text", None, None),
        ("d2", 0, "spanTextForbidden", "/spans/0/text", "stray", "ref"),
        ("d3", 0, "spanMediaRefRequired", "/spans/0/media_ref", None, None),
        ("d4", 0, "spanRefKindMismatch", "/spans/0/media_ref", "media://aud/7", "image"),
        ("d5", 0, "spanRefKindMismatch", "/spans/0/media_ref", "media://img/7", "audio"),
    ]


def test_null_fields_never_fire_sequence_checks(spark):
    # NULL offsets / kinds are the per-span schema walk's findings, not ours
    rows = [
        ("d1", [("text", "abc", None, None), ("ref", None, None, 5)]),
        ("d2", [("text", "abc", None, 5), ("ref", None, None, None)]),
        ("d3", [(None, "x", None, 0), (None, None, None, 5)]),
    ]
    got = _viol(spark, rows)
    assert {g[2] for g in got} <= {"spanTextForbidden"}  # from d3's (None, 'x')


def test_multi_span_indices_and_cascade_isolation(spark):
    # one bad pair in the middle; surrounding pairs stay clean
    rows = [
        (
            "d1",
            [
                ("text", "aa", None, 0),
                ("text", "bb", None, 10),
                ("text", "cc", None, 5),  # disorder at idx 2 only
                ("text", "dd", None, 20),
            ],
        )
    ]
    got = _viol(spark, rows)
    assert got == [("d1", 2, "spanOrder", "/spans/2/offset", "5", "10")]


def test_planted_fixture_fires_every_code(spark):
    from schemasaurus_spark.sources.generator import generate_documents

    docs = plant_sequence_faults(generate_documents(spark, 800, seed=11), seed=13)
    counts = dict(
        span_integrity_violations(docs)
        .groupBy("code")
        .count()
        .collect()
    )
    for code in (
        "spanOrder",
        "spanOverlap",
        "spanTextRequired",
        "spanTextForbidden",
        "spanMediaRefRequired",
        "spanRefKindMismatch",
    ):
        assert counts.get(code, 0) > 0, (code, counts)
    # untouched class (h%7==6) plus planted classes on a clean generator:
    # no other codes can appear
    assert set(counts) == {
        "spanOrder",
        "spanOverlap",
        "spanTextRequired",
        "spanTextForbidden",
        "spanMediaRefRequired",
        "spanRefKindMismatch",
    }


def test_no_shuffle_in_plan(spark):
    docs = _docs(spark, [("d1", [("text", "a", None, 0)])])
    plan = span_integrity_violations(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
