"""jobs/migrate_submit.py end-to-end: static short-circuit on widening
migrations, measured matrix + breaking artifacts on narrowing ones, and
the --fail-on-breaking exit gate."""

from __future__ import annotations

import json
import os
import sys

import pytest

OLD = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True},
        "text": {"type": "string", "maxLength": 10},
        "lang": {"type": "string", "enum": ["en", "de"]},
    },
}
NEW_NARROW = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True},
        "text": {"type": "string", "maxLength": 5},
        "lang": {"type": "string", "enum": ["en", "de"]},
    },
}
NEW_WIDE = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True},
        "text": {"type": "string", "maxLength": 20},
        "lang": {"type": "string", "enum": ["en", "de", "fr"]},
    },
}

ROWS = [(1, "ok", "en"), (2, "longtext", "de"), (3, "x", "fr")]


def _setup(spark, tmp_path):
    in_dir = str(tmp_path / "docs")
    spark.createDataFrame(ROWS, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(in_dir)
    schemas = {}
    for name, s in [("old", OLD), ("narrow", NEW_NARROW), ("wide", NEW_WIDE)]:
        p = str(tmp_path / f"{name}.json")
        with open(p, "w") as f:
            json.dump(s, f)
        schemas[name] = p
    return in_dir, schemas


def _run(cli, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["migrate_submit.py"] + argv)
    with pytest.raises(SystemExit) as e:
        cli.main()
    return e.value.code


def test_narrowing_measures_and_gates(spark, tmp_path, monkeypatch):
    import jobs.migrate_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    in_dir, schemas = _setup(spark, tmp_path)
    out = str(tmp_path / "out")
    code = _run(
        cli,
        monkeypatch,
        [
            "--input", in_dir, "--output", out,
            "--schema-old", schemas["old"], "--schema-new", schemas["narrow"],
            "--fail-on-breaking",
        ],
    )
    assert code == 2  # doc 2 (len 8 <= 10 but > 5) regresses
    report = json.loads(open(os.path.join(out, "report.json")).read())
    assert not report["static"]["compatible"]
    assert report["static"]["n_narrowing"] == 1
    assert report["measured"]["breaking_docs"] == 1
    br = {r.doc_id: r.code for r in spark.read.parquet(f"{out}/breaking").collect()}
    assert br == {2: "maxLength"}


def test_widening_short_circuits_the_scan(spark, tmp_path, monkeypatch):
    import jobs.migrate_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    in_dir, schemas = _setup(spark, tmp_path)
    out = str(tmp_path / "out_wide")
    code = _run(
        cli,
        monkeypatch,
        [
            "--input", in_dir, "--output", out,
            "--schema-old", schemas["old"], "--schema-new", schemas["wide"],
            "--fail-on-breaking",
        ],
    )
    assert code == 0
    report = json.loads(open(os.path.join(out, "report.json")).read())
    assert report["static"]["compatible"]
    assert report["measured"] is None
    assert "backward-compatible" in report["skipped_scan_reason"]
    assert not os.path.exists(os.path.join(out, "matrix"))

    # audit mode forces the measured pass anyway — and finds nothing broken
    out2 = str(tmp_path / "out_audit")
    code = _run(
        cli,
        monkeypatch,
        [
            "--input", in_dir, "--output", out2,
            "--schema-old", schemas["old"], "--schema-new", schemas["wide"],
            "--scan-if-compatible", "--fail-on-breaking",
        ],
    )
    assert code == 0
    report = json.loads(open(os.path.join(out2, "report.json")).read())
    assert report["measured"]["breaking_docs"] == 0
    assert report["measured"]["forgiven_docs"] == 1  # the fr doc


def test_static_only_never_touches_the_corpus(spark, tmp_path, monkeypatch):
    import jobs.migrate_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    _, schemas = _setup(spark, tmp_path)
    out = str(tmp_path / "out_static")
    code = _run(
        cli,
        monkeypatch,
        [
            "--input", str(tmp_path / "does-not-exist"), "--output", out,
            "--schema-old", schemas["old"], "--schema-new", schemas["narrow"],
            "--static-only",
        ],
    )
    assert code == 0  # gate only applies to MEASURED breakage
    report = json.loads(open(os.path.join(out, "report.json")).read())
    assert report["measured"] is None
    assert report["static"]["n_narrowing"] == 1
