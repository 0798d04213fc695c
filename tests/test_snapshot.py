"""Mergeable stats snapshots + drift-vs-snapshot (operators/snapshot.py).

The invariants that make the component trustworthy at scale:
* split-merge equivalence — per-unit snapshots folded with
  ``merge_snapshots`` equal the whole-corpus snapshot (counts/bins/cats
  exactly; HLL estimates exactly, since union is register-max),
* drift fires on a shifted distribution and stays quiet on an identical
  resample,
* the frozen baseline grid keeps later snapshots comparable even when new
  data falls outside the baseline range (edge buckets, not data loss).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from schemasaurus_spark.operators.snapshot import (
    Snapshot,
    SnapshotSpec,
    compute_snapshot,
    distinct_estimates,
    drift_vs_snapshot,
    merge_snapshots,
    read_snapshot,
    write_snapshot,
)

SPEC = SnapshotSpec(numeric=("value",), categorical=("event_type",), n_bins=64)


@pytest.fixture(scope="module")
def events(spark):
    # deterministic synthetic events: value ~ triangular-ish, 5 types
    return spark.range(0, 4000).select(
        F.col("id"),
        ((F.col("id") * 37 % 1000) / 10.0 + (F.col("id") * 11 % 100) / 10.0).alias(
            "value"
        ),
        F.concat(F.lit("type_"), (F.col("id") * 7 % 5).cast("string")).alias(
            "event_type"
        ),
    )


def _collect_counts(df):
    return {tuple(r[:-1]): r[-1] for r in df.collect()}


def test_snapshot_columns_exact(spark, events):
    snap = compute_snapshot(events, SPEC)
    rows = {r.column: r for r in snap.columns.collect()}
    assert rows["value"].n == 4000 and rows["value"].n_null == 0
    assert rows["event_type"].kind == "categorical"
    est = {r.column: r.distinct_est for r in distinct_estimates(snap).collect()}
    assert est["event_type"] == 5  # tiny cardinality: HLL is exact
    # bins cover all rows
    assert snap.bins.agg(F.sum("cnt")).first()[0] == 4000
    cats = _collect_counts(snap.categories)
    assert sum(cats.values()) == 4000 and len(cats) == 5


def test_split_merge_equals_whole(spark, events, tmp_path):
    whole = compute_snapshot(events, SPEC)
    grid = whole.grid
    a = events.where(F.col("id") < 1500)
    b = events.where(F.col("id") >= 1500)
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_snapshot(a, SPEC, pa, grid=grid)
    write_snapshot(b, SPEC, pb, grid=grid)
    merged = merge_snapshots(spark, [pa, pb])

    assert merged.grid == grid
    mcols = {r.column: r for r in merged.columns.collect()}
    wcols = {r.column: r for r in whole.columns.collect()}
    for c in ("value", "event_type"):
        assert mcols[c].n == wcols[c].n
        assert mcols[c].n_null == wcols[c].n_null
    # HLL union of unit sketches == whole-corpus sketch estimate
    mest = {r.column: r.distinct_est for r in distinct_estimates(merged).collect()}
    west = {r.column: r.distinct_est for r in distinct_estimates(whole).collect()}
    assert mest == west
    # bin + category counts sum exactly
    assert _collect_counts(merged.bins) == _collect_counts(whole.bins)
    assert _collect_counts(merged.categories) == _collect_counts(whole.categories)


def test_merge_refuses_mismatched_grids(spark, events, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_snapshot(events, SPEC, pa)
    other = SnapshotSpec(numeric=("value",), categorical=("event_type",), n_bins=32)
    write_snapshot(events, other, pb)
    with pytest.raises(ValueError, match="different bin grids"):
        merge_snapshots(spark, [pa, pb])


def test_roundtrip_write_read(spark, events, tmp_path):
    p = str(tmp_path / "base")
    grid = write_snapshot(events, SPEC, p)
    snap = read_snapshot(spark, p)
    assert snap.grid == grid
    assert snap.columns.count() == 2
    assert snap.bins.agg(F.sum("cnt")).first()[0] == 4000


def test_drift_quiet_on_identical_distribution(spark, events, tmp_path):
    p = str(tmp_path / "base")
    write_snapshot(events, SPEC, p)
    base = read_snapshot(spark, p)
    # disjoint ids, same generating process = same distribution
    cur = spark.range(4000, 8000).select(
        F.col("id"),
        ((F.col("id") * 37 % 1000) / 10.0 + (F.col("id") * 11 % 100) / 10.0).alias(
            "value"
        ),
        F.concat(F.lit("type_"), (F.col("id") * 7 % 5).cast("string")).alias(
            "event_type"
        ),
    )
    report = {r["column"]: r for r in drift_vs_snapshot(cur, base, SPEC)}
    assert not report["value"]["drifted"]
    assert not report["event_type"]["drifted"]


def test_drift_fires_on_shift(spark, events, tmp_path):
    p = str(tmp_path / "base")
    write_snapshot(events, SPEC, p)
    base = read_snapshot(spark, p)
    shifted = events.select(
        "id",
        (F.col("value") + 40.0).alias("value"),  # location shift
        F.when(F.col("event_type") == "type_0", "type_1")
        .otherwise(F.col("event_type"))
        .alias("event_type"),  # collapse a category
    )
    report = {r["column"]: r for r in drift_vs_snapshot(shifted, base, SPEC)}
    assert report["value"]["drifted"] and report["value"]["test"] == "ks"
    assert report["value"]["statistic"] > 0.1
    assert report["event_type"]["drifted"] and report["event_type"]["test"] == "chi_square"


def test_out_of_range_values_land_in_edge_buckets(spark, events):
    base_grid = compute_snapshot(events, SPEC).grid
    lo, hi, nb = base_grid["value"]
    beyond = spark.range(0, 100).select(
        F.col("id"),
        (F.lit(hi) + 5.0 + F.col("id")).alias("value"),
        F.lit("type_0").alias("event_type"),
    )
    snap = compute_snapshot(beyond, SPEC, grid=base_grid)
    bins = {r.bin: r.cnt for r in snap.bins.collect()}
    assert bins == {nb + 1: 100}  # all counted, all in the overflow bucket


def test_nulls_excluded_from_bins_counted_in_stats(spark):
    df = spark.range(0, 100).select(
        F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id").cast("double")).alias(
            "value"
        ),
        F.lit("t").alias("event_type"),
    )
    snap = compute_snapshot(df, SPEC)
    cols = {r.column: r for r in snap.columns.collect()}
    assert cols["value"].n == 100 and cols["value"].n_null == 25
    assert snap.bins.agg(F.sum("cnt")).first()[0] == 75


def test_ks_pvalue_sanity():
    # large samples, moderate stat => tiny p; zero stat => p = 1
    from schemasaurus_spark.operators.drift import ks_significance

    assert ks_significance(0.0, 1000, 1000) == 1.0
    assert ks_significance(0.2, 2000, 2000) < 1e-6
    assert 0.0 <= ks_significance(0.01, 500, 500) <= 1.0


def test_exact_ks_known_value_and_binned_crosscheck(spark):
    """Planted distributions with a closed-form KS: base uniform over
    0..99, cur uniform over 50..149 => exact KS = 0.5.  The snapshot's
    binned KS must agree to within one bin of resolution."""
    from schemasaurus_spark.operators.drift import exact_ks_statistic

    df = spark.range(0, 200).select(
        F.col("id"),
        F.when(F.col("id") < 100, F.col("id"))
        .otherwise(F.col("id") - 50)
        .cast("double")
        .alias("value"),
        (F.col("id") < 100).alias("is_base"),
    )
    row = exact_ks_statistic(df, "value", F.col("is_base")).first()
    assert row.ks_statistic == 0.5
    assert row.n_base == 100 and row.n_cur == 100

    spec = SnapshotSpec(numeric=("value",), n_bins=50)
    base = compute_snapshot(df.where("is_base"), spec)
    rep = drift_vs_snapshot(df.where("NOT is_base"), base, spec)
    binned = rep[0]["statistic"]
    assert abs(binned - 0.5) <= 1.0 / 50 + 1e-9
    assert rep[0]["drifted"]


def test_spec_rejects_empty_and_overlapping_columns():
    """Round-4 hardening: an empty spec used to surface as a confusing
    df.agg(*[]) engine error; a column tracked as both kinds used to emit
    duplicate aliases in the wide aggregate."""
    with pytest.raises(ValueError, match="tracks no columns"):
        SnapshotSpec()
    with pytest.raises(ValueError, match="both numeric and categorical"):
        SnapshotSpec(numeric=("value",), categorical=("value", "event_type"))
