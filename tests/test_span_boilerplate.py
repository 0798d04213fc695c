"""Span-level boilerplate: profile thresholds, normalization identity,
dup-id logical-doc counting, removal pass, NULLs, partition invariance,
zero-shuffle removal plan."""

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.span_boilerplate import (
    remove_boilerplate_spans,
    span_boilerplate_profile,
)

SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def _t(text, off=0):
    return ("text", text, None, off)


def _m(ref, off=0):
    return ("image", None, ref, off)


def _docs(spark):
    rows = [
        ("d1", [_t("Accept  Cookies", 0), _t("real prose one", 20), _m("media://a", 40)]),
        ("d2", [_t("accept cookies", 0), _t("real prose two", 20)]),
        ("d3", [_t("ACCEPT COOKIES ", 0), _t("accept cookies", 20), _t("unique text", 40)]),
        ("d4", [_t(None, 0), _t("  ", 10), _m("media://b", 20)]),
        ("d5", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_profile_counts_and_threshold(spark):
    prof = {
        r.span_norm: r.asDict()
        for r in span_boilerplate_profile(_docs(spark), min_docs=2).collect()
    }
    # 'accept cookies' in 3 docs (d3 twice -> 4 spans); prose lines in 1 doc each
    assert list(prof) == ["accept cookies"]
    assert prof["accept cookies"]["n_docs"] == 3
    assert prof["accept cookies"]["n_spans"] == 4


def test_duplicate_doc_ids_one_logical_doc(spark):
    rows = [
        ("dup", [_t("shared footer")]),
        ("dup", [_t("shared footer")]),
        ("other", [_t("shared footer")]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    prof = span_boilerplate_profile(df, min_docs=2).collect()
    assert len(prof) == 1
    assert prof[0].n_docs == 2  # dup counts once
    assert prof[0].n_spans == 3  # physical spans all counted


def test_validation(spark):
    with pytest.raises(ValueError):
        span_boilerplate_profile(_docs(spark), min_docs=1)


def test_removal_keeps_order_offsets_and_media(spark):
    docs = _docs(spark)
    prof = span_boilerplate_profile(docs, min_docs=2)
    got = {
        r.doc_id: r.asDict()
        for r in remove_boilerplate_spans(docs, prof).collect()
    }
    d3 = got["d3"]
    assert [(s.kind, s.text, s.offset) for s in d3["spans"]] == [
        ("text", "unique text", 40)
    ]
    assert d3["n_boilerplate_removed"] == 2
    d1 = got["d1"]
    assert [(s.kind, s.text or s.media_ref, s.offset) for s in d1["spans"]] == [
        ("text", "real prose one", 20),
        ("image", "media://a", 40),
    ]
    assert d1["n_boilerplate_removed"] == 1
    # NULL-text / whitespace spans and media spans never match
    d4 = got["d4"]
    assert len(d4["spans"]) == 3 and d4["n_boilerplate_removed"] == 0
    # NULL spans array passes through
    assert got["d5"]["spans"] is None
    assert got["d5"]["n_boilerplate_removed"] == 0


def test_removal_zero_shuffle_over_corpus(spark):
    docs = _docs(spark)
    prof = span_boilerplate_profile(docs, min_docs=2)
    plan = (
        remove_boilerplate_spans(docs, prof)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchanges belong to building the broadcast profile array;
    # the corpus side must join via BroadcastNestedLoopJoin, never an
    # exchange of the docs themselves
    assert "BroadcastNestedLoopJoin" in plan


def test_partition_invariance(spark):
    docs = _docs(spark)
    prof = span_boilerplate_profile(docs, min_docs=2)
    base = sorted(
        (r.doc_id, tuple(map(tuple, r.spans or [])), r.n_boilerplate_removed)
        for r in remove_boilerplate_spans(docs, prof).collect()
    )
    re7 = sorted(
        (r.doc_id, tuple(map(tuple, r.spans or [])), r.n_boilerplate_removed)
        for r in remove_boilerplate_spans(
            docs.repartition(7, "doc_id"), prof
        ).collect()
    )
    assert base == re7
    p_base = sorted(
        map(tuple, span_boilerplate_profile(docs, min_docs=2).collect())
    )
    p_re7 = sorted(
        map(
            tuple,
            span_boilerplate_profile(
                docs.repartition(7, "doc_id"), min_docs=2
            ).collect(),
        )
    )
    assert p_base == p_re7


def test_sorted_array_contains_exact(spark):
    from pyspark.sql import functions as F

    from schemasaurus_spark.operators.span_boilerplate import (
        sorted_array_contains,
    )

    vocab = sorted(f"w{i:03d}" for i in range(0, 200, 3))
    probes = (
        [vocab[0], vocab[-1], vocab[37]]
        + ["w001", "aaa", "zzz", "w100"]  # misses: between / below / above
        + [None]
    )
    df = spark.createDataFrame([(p,) for p in probes], "key string")
    got = df.select(
        "key",
        sorted_array_contains(
            F.array(*[F.lit(v) for v in vocab]), F.col("key")
        ).alias("hit"),
    ).collect()
    for r in got:
        assert r.hit == (r.key in vocab), r
    # empty and NULL arrays -> false
    e = df.limit(1).select(
        sorted_array_contains(F.array().cast("array<string>"), F.lit("x")).alias("a"),
        sorted_array_contains(
            F.lit(None).cast("array<string>"), F.lit("x")
        ).alias("b"),
    ).first()
    assert e.a is False and e.b is False
