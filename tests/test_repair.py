"""Span repair (operators/repair.py): closed-form rule checks, offset
closed form (keep-valid / bump-invalid / NULL / negative), minimality,
repaired-output-passes-integrity composition, NULL spans passthrough,
partition invariance."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.repair import repair_spans
from schemasaurus_spark.operators.span_integrity import span_integrity_violations

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _one(spark, spans):
    out = repair_spans(_df(spark, [("d", spans)])).collect()[0]
    return out["spans"], sorted(
        (r["span_idx"], r["code"], r["detail"]) for r in out["repairs"]
    )


def test_kind_from_ref_both_directions(spark):
    spans, log = _one(
        spark,
        [
            ("image", None, "media://aud/7", 0),
            ("audio", None, "media://img/9", 10),
            ("image", None, "media://missing/3", 20),  # left alone
        ],
    )
    assert [s["kind"] for s in spans] == ["audio", "image", "image"]
    assert (0, "kindFromRef", "image->audio") in log
    assert (1, "kindFromRef", "audio->image") in log
    assert not any(c == "kindFromRef" and i == 2 for i, c, _ in log)


def test_text_dropped_and_drop_reasons(spark):
    spans, log = _one(
        spark,
        [
            ("image", "stray caption", "media://img/1", 0),  # text dropped
            ("text", None, None, 5),  # dropped: textMissing
            ("audio", None, None, 9),  # dropped: refMissing
            ("video", "x", None, 12),  # dropped: badKind
            ("ref", None, None, 20),  # ref needs nothing: kept
            ("text", "keep me", None, 30),
        ],
    )
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("image", None),
        ("ref", None),
        ("text", "keep me"),
    ]
    assert (0, "textDropped", "image") in log
    assert (1, "spanDropped", "textMissing") in log
    assert (2, "spanDropped", "refMissing") in log
    assert (3, "spanDropped", "badKind") in log


def test_offsets_valid_sequences_untouched(spark):
    spans, log = _one(
        spark,
        [
            ("text", "abcde", None, 3),  # extent 5 -> next must be > 7
            ("image", None, "media://img/1", 8),
            ("text", "xy", None, 9),
        ],
    )
    assert [s["offset"] for s in spans] == [3, 8, 9]
    assert log == []


def test_offsets_bumped_minimally(spark):
    spans, log = _one(
        spark,
        [
            ("text", "abcde", None, 0),  # extent 5
            ("text", "zz", None, 2),  # overlaps -> bumped to 5
            ("image", None, "media://img/1", 6),  # 6 < 5+2=7 -> bumped to 7
            ("text", "q", None, 100),  # already clear: kept exactly
        ],
    )
    assert [s["offset"] for s in spans] == [0, 5, 7, 100]
    assert (1, "offsetRepaired", "2->5") in log
    assert (2, "offsetRepaired", "6->7") in log
    assert len([1 for _, c, _ in log if c == "offsetRepaired"]) == 2


def test_offsets_null_and_negative(spark):
    spans, log = _one(
        spark,
        [
            ("text", "ab", None, -4),  # negative -> clamped to 0
            ("image", None, "media://img/1", None),  # NULL -> first legal (2)
            ("text", "c", None, 1),  # behind -> bumped to 3
        ],
    )
    assert [s["offset"] for s in spans] == [0, 2, 3]
    assert (0, "offsetRepaired", "-4->0") in log
    assert (1, "offsetRepaired", "NULL->2") in log
    assert (2, "offsetRepaired", "1->3") in log


def test_repaired_output_passes_integrity(spark):
    # compose: repair over a messy corpus, re-validate -> zero violations
    rows = [
        (
            f"d{i}",
            [
                ("text", "hello world", None, 5),
                ("image", "cap", "media://aud/1", 5),  # kind+text+offset broken
                ("text", None, None, None),  # dropped
                ("audio", None, "media://aud/2", 3),  # behind
                ("ref", None, None, None),  # NULL offset
            ],
        )
        for i in range(20)
    ]
    repaired = repair_spans(_df(spark, rows)).select("doc_id", "spans")
    assert span_integrity_violations(repaired).count() == 0


def test_null_spans_passthrough(spark):
    out = repair_spans(_df(spark, [("d", None)])).collect()[0]
    assert out["spans"] is None
    assert list(out["repairs"]) == []


def test_partition_invariance(spark):
    rows = [
        (f"d{i}", [("text", "abc", None, i % 3 - 1), ("image", None, "media://img/1", 0)])
        for i in range(40)
    ]
    df = _df(spark, rows)
    a = sorted(
        repair_spans(df).select("doc_id", "spans", "repairs").collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        repair_spans(df.repartition(7, "doc_id"))
        .select("doc_id", "spans", "repairs")
        .collect(),
        key=lambda r: r["doc_id"],
    )
    assert a == b


def test_referential_repair_with_catalog(spark):
    cat = spark.createDataFrame(
        [("media://img/1",), ("media://aud/2",)], "media_ref string"
    )
    rows = [
        (
            "d",
            [
                ("image", None, "media://img/1", 0),  # in catalog: kept
                ("image", None, "media://img/404", 5),  # dangling: dropped
                ("audio", None, "media://missing/9", 8),  # dangling: dropped
            ],
        )
    ]
    out = repair_spans(_df(spark, rows), catalog=cat).collect()[0]
    assert [s["media_ref"] for s in out["spans"]] == ["media://img/1"]
    codes = sorted((r["span_idx"], r["detail"]) for r in out["repairs"]
                   if r["code"] == "spanDropped")
    assert codes == [(1, "refDangling"), (2, "refDangling")]
    # without a catalog the same spans survive (referential repair is opt-in)
    out2 = repair_spans(_df(spark, rows)).collect()[0]
    assert len(out2["spans"]) == 3
    assert "_cat_refs" not in repair_spans(_df(spark, rows), catalog=cat).columns
