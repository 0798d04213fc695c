"""jobs/components_submit.py end-to-end: bootstrap -> ingest chain equals
the one-shot clustering of all pairs; delta-out rows feed the streaming
delta-log reader."""

from __future__ import annotations

import json
import os
import sys

import pytest

from schemasaurus_spark.operators.dedup import connected_components

PAIRS = "id_a long, id_b long"
OLD = [(1, 2), (10, 11)]
NEW = [(2, 10), (20, 21), (0, 1)]


def _run(cli, monkeypatch, argv):
    monkeypatch.setattr(sys, "argv", ["components_submit.py"] + argv)
    with pytest.raises(SystemExit) as e:
        cli.main()
    return e.value.code


def test_bootstrap_then_ingest_equals_one_shot(spark, tmp_path, monkeypatch):
    import jobs.components_submit as cli

    monkeypatch.setattr(cli, "build_session", lambda: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    p_old = str(tmp_path / "pairs_old")
    p_new = str(tmp_path / "pairs_new")
    spark.createDataFrame(OLD, PAIRS).write.parquet(p_old)
    spark.createDataFrame(NEW, PAIRS).write.parquet(p_new)

    out0 = str(tmp_path / "boot")
    assert _run(cli, monkeypatch, [
        "--pairs", p_old, "--output", out0, "--with-counts",
    ]) == 0
    rep0 = json.loads(open(os.path.join(out0, "report.json")).read())
    assert rep0["mode"] == "bootstrap" and rep0["n_ids"] == 4 and rep0["n_components"] == 2

    out1 = str(tmp_path / "next")
    delta_dir = str(tmp_path / "delta")
    assert _run(cli, monkeypatch, [
        "--pairs", p_new, "--assignment", os.path.join(out0, "assignment"),
        "--output", out1, "--delta-out", delta_dir, "--with-counts",
    ]) == 0
    rep1 = json.loads(open(os.path.join(out1, "report.json")).read())
    assert rep1["mode"] == "ingest"
    assert rep1["touched_roots"] >= 1 and rep1["new_nodes"] >= 2

    got = {
        (r.id, r.comp_id)
        for r in spark.read.parquet(os.path.join(out1, "assignment")).collect()
    }
    want = {
        (r.id, r.comp_id)
        for r in connected_components(
            spark.createDataFrame(OLD + NEW, PAIRS)
        ).collect()
    }
    assert got == want
    # 0 joins {1,2,10,11} -> everything labels 0; {20,21} labels 20
    assert dict(got)[11] == 0 and dict(got)[20] == 20

    # the delta rows carry the streaming log shape and replay to the same state
    kinds = {r.kind for r in spark.read.parquet(delta_dir).collect()}
    assert kinds == {"remap", "new"}
