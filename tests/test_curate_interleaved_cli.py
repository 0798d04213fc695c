"""jobs/curate_interleaved_submit.py end-to-end: curated parquet +
report.json land, counts mode attributes stages, catalog turns on
referential repair."""

from __future__ import annotations

import json
import sys

import pytest

SCHEMA = (
    "doc_id string, spans array<struct<kind string, text string, "
    "media_ref string, offset int>>"
)
CAT_SCHEMA = "media_ref string, media_kind string, bytes long"
LONG = "genuine prose long enough to pass the trainability gate"


def _write_corpus(spark, tmp_path):
    rows = [
        ("k1", [("text", "Accept Cookies", None, 0), ("text", LONG + " a", None, 9)]),
        ("k2", [("text", "accept cookies", None, 0), ("text", LONG + " b", None, 9)]),
        ("k3", [("text", "ACCEPT COOKIES", None, 0), ("text", LONG + " c", None, 9)]),
        ("husk", [("text", "accept cookies", None, 0)]),
        ("dang", [("text", LONG + " d", None, 0), ("image", None, "media://missing", 90)]),
    ]
    in_dir = str(tmp_path / "in")
    cat_dir = str(tmp_path / "cat")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    spark.createDataFrame(
        [("media://img/1", "image", 5)], CAT_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(cat_dir)
    return in_dir, cat_dir


def _read_report(spark, out_dir):
    """write_text_file may land a flat file or a directory of parts."""
    import os

    path = f"{out_dir}/report.json"
    if os.path.isfile(path):
        return json.loads(open(path).read())
    return json.loads(
        "\n".join(r.value for r in spark.read.text(path).collect())
    )


def _run(cli, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["curate_interleaved_submit.py"] + argv)
    with pytest.raises(SystemExit) as e:
        cli.main()
    return e.value.code


def test_curate_interleaved_end_to_end(spark, tmp_path, monkeypatch):
    import jobs.curate_interleaved_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    in_dir, cat_dir = _write_corpus(spark, tmp_path)
    out_dir = str(tmp_path / "out")

    code = _run(
        cli,
        monkeypatch,
        [
            "--input", in_dir,
            "--output", out_dir,
            "--catalog", cat_dir,
            "--min-docs-boilerplate", "3",
            "--min-text-chars", "20",
        ],
    )
    assert code == 0
    curated = spark.read.parquet(f"{out_dir}/curated")
    got = {r.doc_id: r.asDict() for r in curated.collect()}
    assert set(got) == {"k1", "k2", "k3", "dang"}
    for r in got.values():
        assert "cookies" not in r["training_text"].lower()
    assert "<|" not in got["dang"]["training_text"]  # dangling ref repaired away
    assert _read_report(spark, out_dir)["curated_rows"] == 4


def test_counts_mode(spark, tmp_path, monkeypatch):
    import jobs.curate_interleaved_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    in_dir, cat_dir = _write_corpus(spark, tmp_path)
    out_dir = str(tmp_path / "out2")
    code = _run(
        cli,
        monkeypatch,
        [
            "--input", in_dir,
            "--output", out_dir,
            "--catalog", cat_dir,
            "--min-docs-boilerplate", "3",
            "--with-counts",
        ],
    )
    assert code == 0
    sc = _read_report(spark, out_dir)["stage_counts"]
    assert sc["input_rows"] == 5
    assert sc["repaired_rows"] == 5
    assert sc["curated_rows"] == 4
    assert spark.read.parquet(f"{out_dir}/curated").count() == 4
