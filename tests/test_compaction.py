"""Compaction planner (operators/compaction.py): closed-form bin
assignment, zero-size files, single-large-file no-op, boundary landing
exactly on target, and partition-invariance."""

import pytest

from schemasaurus_spark.operators.compaction import compaction_plan

T = 100  # tiny target so fixtures stay readable


def _plan(spark, rows, n_part=None, target=T):
    df = spark.createDataFrame(rows, "part string, file_id long, size_bytes long")
    if n_part:
        df = df.repartition(n_part)
    out = compaction_plan(df, target).collect()
    return {
        (r["part"], r["bin_id"]): (
            r["n_files"],
            r["total_bytes"],
            r["first_file"],
            r["last_file"],
            r["needs_rewrite"],
        )
        for r in out
    }


def test_offset_binning_closed_form(spark):
    # sizes 60,60,60: starts 0,60,120 -> bins 0,0,1
    got = _plan(spark, [("p", 1, 60), ("p", 2, 60), ("p", 3, 60)])
    assert got == {
        ("p", 0): (2, 120, 1, 2, True),
        ("p", 1): (1, 60, 3, 3, True),  # below target -> still a rewrite task
    }


def test_boundary_exactly_on_target(spark):
    # start offsets 0 and 100: second file opens bin 1 exactly
    got = _plan(spark, [("p", 1, 100), ("p", 2, 5)])
    assert got == {
        ("p", 0): (1, 100, 1, 1, False),  # lone file at target: no-op
        ("p", 1): (1, 5, 2, 2, True),
    }


def test_zero_size_files_bin_with_neighbors(spark):
    got = _plan(spark, [("p", 1, 0), ("p", 2, 0), ("p", 3, 30)])
    assert got == {("p", 0): (3, 30, 1, 3, True)}


def test_partitions_bin_independently(spark):
    rows = [("a", 1, 150), ("b", 1, 150)]
    got = _plan(spark, rows)
    assert got[("a", 0)] == (1, 150, 1, 1, False)
    assert got[("b", 0)] == (1, 150, 1, 1, False)


def test_partition_invariance(spark):
    rows = [("p", i, 37) for i in range(1, 40)] + [("q", i, 251) for i in range(1, 9)]
    assert _plan(spark, rows, n_part=1) == _plan(spark, rows, n_part=7)


def test_rejects_bad_target(spark):
    df = spark.createDataFrame([("p", 1, 5)], "part string, file_id long, size_bytes long")
    with pytest.raises(ValueError):
        compaction_plan(df, 0)
