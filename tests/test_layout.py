"""Layout fingerprinting: signature construction, md5 portability,
grouping threshold, dup-id counting, empty/NULL docs, invariance."""

import hashlib

import pytest

from schemasaurus_spark.operators.layout import (
    layout_fingerprint,
    layout_template_groups,
)

SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)


def _doc(doc_id, kinds):
    return (
        doc_id,
        [
            (k, "x" if k == "text" else None, None if k == "text" else "media://m", i)
            for i, k in enumerate(kinds)
        ],
    )


def _docs(spark):
    rows = [
        _doc("a1", ["text", "image", "text"]),
        _doc("a2", ["text", "image", "text"]),
        _doc("a3", ["text", "image", "text"]),
        _doc("b1", ["image", "audio"]),
        _doc("b2", ["image", "audio"]),
        _doc("solo", ["text"]),
        ("empty", []),
        ("nul", None),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_fingerprint_matches_python_md5(spark):
    got = {
        r.doc_id: r.asDict()
        for r in layout_fingerprint(_docs(spark)).collect()
    }
    a = got["a1"]
    assert a["kinds_sig"] == "text,image,text"
    assert a["layout_fp"] == hashlib.md5(b"text,image,text").hexdigest()
    assert (a["n_spans"], a["n_text"], a["n_media"]) == (3, 2, 1)
    for d in ("empty", "nul"):
        e = got[d]
        assert e["kinds_sig"] == ""
        assert e["layout_fp"] == hashlib.md5(b"").hexdigest()
        assert e["n_spans"] == 0


def test_template_groups_threshold_and_counts(spark):
    got = {
        r.kinds_sig: r.asDict()
        for r in layout_template_groups(_docs(spark), min_docs=2).collect()
    }
    assert set(got) == {"text,image,text", "image,audio", ""}
    assert got["text,image,text"]["n_docs"] == 3
    assert got["image,audio"]["n_docs"] == 2
    assert got[""]["n_docs"] == 2  # empty + NULL both fingerprint ''
    got3 = {
        r.kinds_sig
        for r in layout_template_groups(_docs(spark), min_docs=3).collect()
    }
    assert got3 == {"text,image,text"}


def test_duplicate_doc_ids_count_once(spark):
    rows = [_doc("dup", ["text"]), _doc("dup", ["text"]), _doc("o", ["text"])]
    df = spark.createDataFrame(rows, SCHEMA)
    g = layout_template_groups(df, min_docs=2).collect()
    assert len(g) == 1 and g[0].n_docs == 2 and g[0].n_rows == 3


def test_validation(spark):
    with pytest.raises(ValueError):
        layout_template_groups(_docs(spark), min_docs=1)


def test_partition_invariance_and_plan(spark):
    df = _docs(spark)
    base = sorted(map(tuple, layout_template_groups(df, min_docs=2).collect()))
    re7 = sorted(
        map(
            tuple,
            layout_template_groups(df.repartition(7, "doc_id"), min_docs=2).collect(),
        )
    )
    assert base == re7
    fp_plan = (
        layout_fingerprint(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in fp_plan
    grp_plan = (
        layout_template_groups(df, min_docs=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in grp_plan
