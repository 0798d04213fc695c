"""jobs/profile_submit.py end-to-end: artifacts land, the summary is
faithful, and the emitted rule suite closes the bootstrap loop (loads as
QualityRules and passes the gate on the corpus that produced it)."""

import json
import sys

from schemasaurus_spark.operators.quality_gate import QualityRule, quality_gate

SF_DIR = "/root/testdata/sf0.001"


def test_profile_submit_end_to_end(spark, tmp_path, monkeypatch):
    import jobs.profile_submit as cli

    out = str(tmp_path / "profile_out")
    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "profile_submit.py",
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--fd-columns", "doc_id,lang,source",
            "--corr-columns", "doc_id,n_chars",
            "--quasi-cols", "lang,source",
            "--k", "5",
            "--checksum",
            "--suggest-rules",
            "--script-profile",
            "--license-profile",
        ],
    )
    cli.main()

    summary = json.loads(open(f"{out}/summary.json").read())
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()

    stats = spark.read.parquet(f"{out}/column_stats")
    assert stats.count() == 5 == summary["column_stats_rows"]
    sugg = spark.read.parquet(f"{out}/suggestions")
    assert sugg.count() == summary["suggestions"] > 0
    fds = {(r.lhs, r.rhs): r.holds for r in spark.read.parquet(f"{out}/fds").collect()}
    assert fds[("doc_id", "lang")] and not fds[("lang", "doc_id")]
    assert summary["checksum"]["n_rows"] == n
    assert summary["privacy"]["n_groups"] > 0
    # text forensics artifacts: per-doc rows + rolled-up summary
    assert spark.read.parquet(f"{out}/script_profile").count() == n
    assert spark.read.parquet(f"{out}/license_profile").count() == n
    assert sum(summary["script_profile"]["dominant_script_docs"].values()) == n
    assert sum(summary["license_classes"].values()) == n

    # bootstrap loop: the emitted rules load and the gate passes on the
    # corpus that produced them
    rules = [QualityRule(**r) for r in json.loads(open(f"{out}/suggested_rules.json").read())]
    assert len(rules) == summary["suggested_rules"] > 0
    verdicts = quality_gate(docs, rules).collect()
    assert verdicts and all(v.passed for v in verdicts), [
        (v.rule_id, v.value) for v in verdicts if not v.passed
    ]


def test_profile_submit_infer_schema_roundtrip(spark, tmp_path, monkeypatch):
    """--infer-schema writes a draft-4 artifact the VALIDATORS accept: the
    corpus that produced it validates clean under it (the soundness loop,
    through the CLI surface)."""
    import jobs.profile_submit as cli

    out = str(tmp_path / "profile_infer")
    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "profile_submit.py",
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--infer-schema",
        ],
    )
    cli.main()

    inferred = json.loads(open(f"{out}/inferred_schema.json").read())
    summary = json.loads(open(f"{out}/summary.json").read())
    assert summary["inferred_schema"]["columns"] == sorted(inferred["properties"])
    assert "lang" in summary["inferred_schema"]["enums"]

    from schemasaurus_spark.schema.columns import validate_dataframe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert validate_dataframe(docs, inferred).where("NOT valid").count() == 0
