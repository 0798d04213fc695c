"""Span-aware multimodal packing (packing.pack_spans): Python replay of
the md5-ordered cumsum with fixed media costs, zero-cost exclusion,
duplicate-doc_id determinism, partition invariance."""

import hashlib

import pytest
from pyspark.sql import Row

from schemasaurus_spark.operators.packing import pack_spans

SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
IMG, AUD, REF = 576, 128, 1


def _span(kind, text=None, ref=None, offset=0):
    return Row(kind=kind, text=text, media_ref=ref, offset=offset)


def _cost(spans):
    t = m = 0
    for s in spans or []:
        if s.kind == "text":
            txt = (s.text or "").strip()
            t += len(txt.split()) if txt else 0
        elif s.kind == "image":
            m += IMG
        elif s.kind == "audio":
            m += AUD
        elif s.kind == "ref":
            m += REF
    return t, m


def _py_pack(data, budget, n_shards, seed):
    rows = []
    for did, spans in data:
        t, m = _cost(spans)
        if t + m == 0:
            continue
        k = hashlib.md5(f"{did}:sp:{seed}".encode()).hexdigest()
        sh = int(hashlib.md5(f"{did}#sp#{seed}".encode()).hexdigest()[:4], 16) % n_shards
        rows.append((did, t + m, t, m, sh, k))
    out = []
    for sh in set(r[4] for r in rows):
        run = 0
        for did, n, t, m, _, k in sorted(
            (r for r in rows if r[4] == sh), key=lambda r: (r[5], r[1])
        ):
            out.append((did, n, t, m, sh, run // budget, run % budget))
            run += n
    return sorted(out)


DATA = [
    ("a", [_span("text", text="one two three"), _span("image", ref="m://i/1")]),
    ("b", [_span("audio", ref="m://a/1"), _span("text", text="x")]),
    ("c", [_span("ref"), _span("text", text="  ")]),          # cost 1 (ref only)
    ("d", [_span("text", text=None), _span("text", text="")]),  # zero cost: excluded
    ("e", None),                                                # NULL spans: excluded
    ("f", [_span("image", ref="m://i/2"), _span("image", ref="m://i/3")]),
]


def _collect(df):
    return sorted(
        (
            r["doc_id"], r["n_tokens"], r["n_text_tokens"], r["n_media_tokens"],
            r["shard"], r["seq_id"], r["seq_offset"],
        )
        for r in df.collect()
    )


def test_pack_spans_matches_python_replay(spark):
    df = spark.createDataFrame(DATA, SCHEMA)
    got = _collect(pack_spans(df, budget=600, n_shards=2, seed=3))
    assert got == _py_pack(DATA, budget=600, n_shards=2, seed=3)
    # spot the closed-form costs
    by_id = {r[0]: r for r in got}
    assert by_id["a"][1:4] == (3 + IMG, 3, IMG)
    assert by_id["b"][1:4] == (1 + AUD, 1, AUD)
    assert by_id["c"][1:4] == (REF, 0, REF)
    assert "d" not in by_id and "e" not in by_id
    assert by_id["f"][1:4] == (2 * IMG, 0, 2 * IMG)


def test_pack_spans_partition_invariant_and_dup_ids(spark):
    data = DATA + [
        ("dup", [_span("text", text="p q")]),
        ("dup", [_span("image", ref="m://i/9")]),   # same id, different cost
        ("dup2", [_span("text", text="r s")]),
        ("dup2", [_span("text", text="t u")]),      # same id, same cost
    ]
    df = spark.createDataFrame(data, SCHEMA)
    want = _py_pack(data, budget=100, n_shards=1, seed=0)
    for parts in (1, 7):
        got = _collect(pack_spans(df.repartition(parts), budget=100, n_shards=1))
        assert got == want


def test_pack_spans_validates_budget(spark):
    df = spark.createDataFrame(DATA[:1], SCHEMA)
    with pytest.raises(ValueError):
        pack_spans(df, budget=0)
