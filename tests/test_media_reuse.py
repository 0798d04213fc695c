"""Media reuse profile: hand-computed fan-in, duplicate doc_id collapse,
share arithmetic, catalog join / dangling flag, partition invariance."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.media_reuse import media_reuse_profile

SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)
CAT_SCHEMA = "media_ref string, media_kind string, bytes long"


def _span(kind, ref=None):
    return (kind, "x" if kind == "text" else None, ref, 0)


def _docs(spark):
    rows = [
        # hot ref a: twice in doc1, once in doc2
        ("doc1", [_span("image", "media://a"), _span("image", "media://a")]),
        ("doc2", [_span("image", "media://a"), _span("audio", "media://b")]),
        ("doc3", [_span("ref", "media://dangling")]),
        ("doc4", [_span("text"), _span("ref", None)]),  # NULL ref ignored
        ("doc5", None),
        ("doc5", [_span("image", "media://b")]),  # duplicate id, one logical doc
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_fan_in_and_share(spark):
    got = {
        r.media_ref: r.asDict()
        for r in media_reuse_profile(_docs(spark)).collect()
    }
    # totals: a=3 refs / 2 docs, b=2 refs / 2 docs, dangling=1/1 -> tot 6
    assert got["media://a"]["n_refs"] == 3 and got["media://a"]["n_docs"] == 2
    assert got["media://b"]["n_refs"] == 2 and got["media://b"]["n_docs"] == 2
    assert got["media://dangling"]["n_refs"] == 1
    assert got["media://a"]["share_bp"] == 3 * 10000 // 6
    assert got["media://b"]["share_bp"] == 2 * 10000 // 6
    assert got["media://dangling"]["share_bp"] == 1 * 10000 // 6
    assert len(got) == 3  # NULL refs never profiled


def test_catalog_join_flags_dangling(spark):
    cat = spark.createDataFrame(
        [("media://a", "image", 10), ("media://b", "audio", 20)], CAT_SCHEMA
    )
    got = {
        r.media_ref: r.asDict()
        for r in media_reuse_profile(_docs(spark), catalog=cat).collect()
    }
    assert got["media://a"]["media_kind"] == "image"
    assert got["media://a"]["in_catalog"] == 1
    assert got["media://dangling"]["media_kind"] is None
    assert got["media://dangling"]["in_catalog"] == 0


def test_partition_invariance(spark):
    df = _docs(spark)
    base = sorted(map(tuple, media_reuse_profile(df).collect()))
    re7 = sorted(
        map(tuple, media_reuse_profile(df.repartition(7, "doc_id")).collect())
    )
    assert base == re7


def test_no_expand_in_plan(spark):
    # exact distinct-doc counting must come from the two-phase aggregate,
    # not count(distinct)'s Expand operator
    plan = (
        media_reuse_profile(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan


def test_media_orphans(spark):
    from schemasaurus_spark.operators.media_reuse import media_orphans

    cat = spark.createDataFrame(
        [
            ("media://a", "image", 10),
            ("media://b", "audio", 20),
            ("media://unused", "image", 99),
        ],
        CAT_SCHEMA,
    )
    got = media_orphans(cat, _docs(spark)).collect()
    assert [(r.media_ref, r.media_kind, r.bytes) for r in got] == [
        ("media://unused", "image", 99)
    ]
    # partition invariance
    got7 = media_orphans(cat, _docs(spark).repartition(7, "doc_id")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got7))
