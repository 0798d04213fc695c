"""Caption-context mining (operators/captions.py): closed-form nearest-
text picks, the equidistant→following rule, uncaptionable media kept
with NULL, empty/NULL spans, duplicate doc_ids."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from schemasaurus_spark.operators.captions import caption_contexts

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _span(kind, text=None, ref=None, offset=0):
    return Row(kind=kind, text=text, media_ref=ref, offset=offset)


def _rows(spark, data):
    df = spark.createDataFrame(data, SCHEMA)
    return {
        (r["doc_id"], r["span_idx"]): r
        for r in caption_contexts(df).collect()
    }


def test_closed_form_picks(spark):
    got = _rows(
        spark,
        [
            (
                "d1",
                [
                    _span("text", text="intro words"),
                    _span("image", ref="media://img/1"),   # idx 1: prev=0 next=2, equidistant -> next
                    _span("text", text="the caption"),
                    _span("ref", ref="media://img/9"),      # ref kind: not media
                    _span("audio", ref="media://aud/2"),    # idx 4: prev=2 (d=2), next=None -> prev
                ],
            )
        ],
    )
    assert set(got) == {("d1", 1), ("d1", 4)}
    img = got[("d1", 1)]
    assert (img["prev_text_idx"], img["next_text_idx"]) == (0, 2)
    assert img["caption_src"] == "next" and img["caption"] == "the caption"
    assert img["caption_len"] == len("the caption")
    aud = got[("d1", 4)]
    assert (aud["prev_text_idx"], aud["next_text_idx"]) == (2, None)
    assert aud["caption_src"] == "prev" and aud["caption"] == "the caption"


def test_closer_prev_wins(spark):
    got = _rows(
        spark,
        [
            (
                "d2",
                [
                    _span("text", text="near"),
                    _span("image", ref="media://img/3"),    # prev d=1
                    _span("ref"),
                    _span("ref"),
                    _span("text", text="far"),              # next d=3
                ],
            )
        ],
    )
    # wait: idx1 prev=0 (d=1), next=4 (d=3) -> prev
    assert got[("d2", 1)]["caption_src"] == "prev"
    assert got[("d2", 1)]["caption"] == "near"


def test_uncaptionable_media_kept(spark):
    got = _rows(spark, [("d3", [_span("image", ref="media://img/7")])])
    r = got[("d3", 0)]
    assert r["caption_src"] is None and r["caption"] is None
    assert r["caption_len"] == 0
    assert r["prev_text_idx"] is None and r["next_text_idx"] is None


def test_empty_and_null_spans_and_null_ref(spark):
    df_rows = [
        ("e1", []),
        ("e2", None),
        ("e3", [_span("image", ref=None), _span("text", text="t")]),
    ]
    assert _rows(spark, df_rows) == {}


def test_duplicate_doc_ids_both_emit(spark):
    data = [
        ("dup", [_span("text", text="a"), _span("image", ref="media://img/1")]),
        ("dup", [_span("image", ref="media://img/2")]),
    ]
    df = spark.createDataFrame(data, SCHEMA)
    rows = caption_contexts(df.repartition(3)).collect()
    assert len(rows) == 2
    assert {r["media_ref"] for r in rows} == {"media://img/1", "media://img/2"}
