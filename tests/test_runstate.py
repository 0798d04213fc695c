"""Checkpoint/resume (north rule): kill mid-run, rerun, prove completed
units are skipped and totals equal a straight-through pass."""

import os

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.plans.validation_job import ValidationJob
from schemasaurus_spark.runstate import (
    LineageDriftError,
    ResumableValidation,
    list_units,
    violations_table,
)
from schemasaurus_spark.sources.generator import generate_documents


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("resume") / "docs.parquet")
    generate_documents(spark, 4000, seed=13).repartition(8).write.parquet(p)
    return p


def test_units_are_deterministic(spark, docs_path):
    u1 = list_units(spark, docs_path, files_per_unit=2)
    u2 = list_units(spark, docs_path, files_per_unit=2)
    assert [u["unit_id"] for u in u1] == [u["unit_id"] for u in u2]
    assert len(u1) == 4


def test_kill_and_resume(spark, docs_path, tmp_path):
    out = str(tmp_path / "out")
    rv = ResumableValidation(files_per_unit=2)

    with pytest.raises(RuntimeError, match="injected failure"):
        rv.run(spark, docs_path, out, fail_after_units=2)
    assert len(os.listdir(os.path.join(out, "manifests"))) == 2

    summary = rv.run(spark, docs_path, out)
    assert summary["n_skipped"] == 2
    assert summary["n_processed"] == 2
    assert summary["n_units"] == 4

    # totals match a straight-through (non-checkpointed) pass
    docs = spark.read.parquet(docs_path)
    job = ValidationJob()
    direct = job.counted(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
        F.sum("n_violations").alias("n_viol"),
    ).collect()[0]
    assert summary["totals"]["n_docs"] == direct.n_docs == 4000
    assert summary["totals"]["n_invalid_docs"] == direct.n_invalid
    assert summary["totals"]["n_violations"] == direct.n_viol

    # accumulated violation rows match the count too
    assert violations_table(spark, out).count() == direct.n_viol

    # a third run is a no-op
    again = rv.run(spark, docs_path, out)
    assert again["n_processed"] == 0
    assert again["n_skipped"] == 4


def test_lineage_drift_detected_and_reset(spark, tmp_path):
    """Appending input files between runs reshuffles positional unit
    membership: resume must refuse (stale violations/unit=* dirs would
    double-count), and on_drift='reset' must invalidate the orphans so
    totals still equal a straight-through pass over the new input."""
    p = str(tmp_path / "docs.parquet")
    generate_documents(spark, 2000, seed=13).repartition(4).write.parquet(p)
    out = str(tmp_path / "out")
    rv = ResumableValidation(files_per_unit=2)
    rv.run(spark, p, out)

    # grow the input: file listing (lineage) changes, old unit ids orphan
    generate_documents(spark, 1000, seed=14).repartition(3).write.mode(
        "append"
    ).parquet(p)
    with pytest.raises(LineageDriftError, match="immutable input snapshot"):
        rv.run(spark, p, out)

    summary = rv.run(spark, p, out, on_drift="reset")
    docs = spark.read.parquet(p)
    job = ValidationJob()
    direct = job.counted(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_violations").alias("n_viol"),
    ).collect()[0]
    assert summary["totals"]["n_docs"] == direct.n_docs == 3000
    assert summary["totals"]["n_violations"] == direct.n_viol
    # no stale violation dirs double-counting rows
    assert violations_table(spark, out).count() == direct.n_viol


def test_per_unit_snapshots_merge_to_whole_and_survive_resume(spark, docs_path, tmp_path):
    """snapshot_spec: each unit writes a mergeable stats snapshot; the
    manifested-units merge equals a whole-corpus snapshot (same grid), and
    kill/resume neither loses nor double-counts any unit's contribution."""
    from schemasaurus_spark.operators.snapshot import (
        SnapshotSpec, compute_snapshot, distinct_estimates,
    )
    from schemasaurus_spark.runstate import merged_snapshot

    spec = SnapshotSpec(numeric=("n_spans",), categorical=("first_kind",), n_bins=32)
    prep = lambda df: df.select(
        F.size("spans").alias("n_spans"),
        F.col("spans")[0]["kind"].alias("first_kind"),
    )
    out = str(tmp_path / "out")
    rv = ResumableValidation(files_per_unit=2, snapshot_spec=spec, snapshot_prep=prep)

    with pytest.raises(RuntimeError, match="injected failure"):
        rv.run(spark, docs_path, out, fail_after_units=2)
    # mid-crash: only manifested units merge (exactly-once, partial corpus)
    partial = merged_snapshot(spark, out)
    assert partial.columns.count() == 2
    n_partial = {r.column: r.n for r in partial.columns.collect()}["n_spans"]
    assert 0 < n_partial < 4000

    rv.run(spark, docs_path, out)
    merged = merged_snapshot(spark, out)

    whole = compute_snapshot(prep(spark.read.parquet(docs_path)), spec, grid=merged.grid)
    m_cols = {r.column: r for r in merged.columns.collect()}
    w_cols = {r.column: r for r in whole.columns.collect()}
    for c in ("n_spans", "first_kind"):
        assert m_cols[c].n == w_cols[c].n == 4000
        assert m_cols[c].n_null == w_cols[c].n_null
    m_est = {r.column: r.distinct_est for r in distinct_estimates(merged).collect()}
    w_est = {r.column: r.distinct_est for r in distinct_estimates(whole).collect()}
    assert m_est == w_est
    assert (
        {(r.column, r.bin): r.cnt for r in merged.bins.collect()}
        == {(r.column, r.bin): r.cnt for r in whole.bins.collect()}
    )
    assert (
        {(r.column, r.value): r.cnt for r in merged.categories.collect()}
        == {(r.column, r.value): r.cnt for r in whole.categories.collect()}
    )
