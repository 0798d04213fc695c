"""PSI drift (drift.py psi_from_counts / psi_statistic; snapshot report
integration).  In-engine statistic parity-checked against the driver-side
math on the same counts.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from schemasaurus_spark.operators.drift import PSI_SMOOTH, psi_from_counts, psi_statistic


def test_identical_distributions_zero():
    c = {0: 10, 1: 20, 2: 5}
    assert psi_from_counts(c, dict(c)) == 0.0


def test_shift_positive_and_symmetric():
    base = {0: 100, 1: 100}
    cur = {0: 180, 1: 20}
    psi = psi_from_counts(base, cur)
    assert psi > 0.25  # major shift
    assert abs(psi - psi_from_counts(cur, base)) < 1e-12  # symmetric by construction


def test_empty_cells_contribute_when_totals_differ():
    # same observed cells, but one side twice the mass: an absent cell's
    # smoothed term is nonzero only through the explicit cell list
    base, cur = {0: 100}, {0: 200}
    with_missing = psi_from_counts(base, cur, cells=[0, 1])
    only_observed = psi_from_counts(base, cur, cells=[0])
    assert with_missing != only_observed


def test_in_engine_matches_driver_math(spark):
    rows = [(i, float(i % 7) * 3.0 + (0.5 if i % 2 else 0.0)) for i in range(400)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    lo, width, n_bins = 0.0, 4.0, 6
    got = psi_statistic(df, "value", F.col("event_id") % 2 == 0, lo, width, n_bins).collect()[0]

    base: dict[int, int] = {}
    cur: dict[int, int] = {}
    for i, v in rows:
        b = min(max(math.floor((v - lo) / width), 0), n_bins - 1)
        (base if i % 2 == 0 else cur)[b] = (base if i % 2 == 0 else cur).get(b, 0) + 1
    want = psi_from_counts(base, cur, cells=list(range(n_bins)))
    assert abs(got.psi - round(want, 6)) < 2e-6
    assert got.n_base == sum(base.values()) and got.n_cur == sum(cur.values())


def test_smoothing_constant_is_laplace_half():
    # pin the documented contract: p = (c + 0.5) / (n + 0.5 k)
    assert PSI_SMOOTH == 0.5
    psi = psi_from_counts({0: 1}, {}, cells=[0])
    p = 1.5 / 1.5
    q = 0.5 / 0.5
    assert abs(psi - (p - q) * math.log(p / q)) < 1e-12  # == 0


def test_snapshot_report_carries_psi(spark, tmp_path):
    from schemasaurus_spark.operators.snapshot import (
        SnapshotSpec,
        compute_snapshot,
        drift_vs_snapshot,
    )

    spec = SnapshotSpec(numeric=["v"], categorical=["c"])
    base_df = spark.createDataFrame(
        [(float(i % 10), f"k{i % 3}") for i in range(300)], "v double, c string"
    )
    cur_df = spark.createDataFrame(
        [(float(i % 10) + 3.0, f"k{i % 2}") for i in range(300)], "v double, c string"
    )
    snap = compute_snapshot(base_df, spec)
    report = {r["column"]: r for r in drift_vs_snapshot(cur_df, snap, spec)}
    assert report["v"]["psi"] > 0.1  # shifted numeric
    assert report["c"]["psi"] > 0.0  # reshaped categories
    same = {r["column"]: r for r in drift_vs_snapshot(base_df, snap, spec)}
    assert same["v"]["psi"] == 0.0 and same["c"]["psi"] == 0.0
