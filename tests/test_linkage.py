"""Blocked record linkage (operators/linkage.py): hand-computed scores,
blocking recall semantics, NULL-neutral comparators, multi-block dedup,
validation, partition invariance."""

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.linkage import FieldComparator, record_linkage

L = "lid long, name string, phone string, city string"
R = "rid long, name string, phone string, city string"

FIELDS = [
    FieldComparator("name", "name", "name", w_agree=3, w_disagree=-2, max_edit=1),
    FieldComparator("phone", "phone", "phone", w_agree=2, w_disagree=-1),
    FieldComparator("city", "city", "city", w_agree=1, w_disagree=-1),
]


def _match(spark, lrows, rrows, blocks=None, threshold=4):
    left = spark.createDataFrame(lrows, L)
    right = spark.createDataFrame(rrows, R)
    blocks = blocks or [(F.col("city"), F.col("city"))]
    return {
        (r.lid, r.rid, r.score)
        for r in record_linkage(
            left, right,
            left_id="lid", right_id="rid",
            blocks=blocks, fields=FIELDS, threshold=threshold,
        ).collect()
    }


def test_hand_computed_scores(spark):
    lrows = [(1, "alice", "555-01", "rome"), (2, "bob", "555-02", "rome")]
    rrows = [
        (10, "alicx", "555-01", "rome"),  # vs 1: name lev1 +3, phone +2, city +1 = 6
        (11, "carol", "999-99", "rome"),  # vs either: -2 -1 +1 = -2, rejected
    ]
    # every same-city pair is a candidate; only (1, 10) clears threshold 4
    assert _match(spark, lrows, rrows) == {(1, 10, 6)}


def test_blocking_bounds_recall(spark):
    # identical records in DIFFERENT blocks are invisible by design
    lrows = [(1, "alice", "555-01", "rome")]
    rrows = [(10, "alice", "555-01", "paris")]
    assert _match(spark, lrows, rrows) == set()
    # a second blocking pass on phone recovers them
    got = _match(
        spark, lrows, rrows,
        blocks=[(F.col("city"), F.col("city")), (F.col("phone"), F.col("phone"))],
    )
    assert got == {(1, 10, 3 + 2 - 1)}


def test_null_fields_are_neutral(spark):
    lrows = [(1, "alice", None, "rome")]
    rrows = [(10, "alice", "555-01", "rome")]
    # phone NULL contributes 0: 3 + 0 + 1 = 4
    assert _match(spark, lrows, rrows) == {(1, 10, 4)}


def test_multi_block_pair_scored_once(spark):
    lrows = [(1, "alice", "555-01", "rome")]
    rrows = [(10, "alice", "555-01", "rome")]
    got = record_linkage(
        spark.createDataFrame(lrows, L),
        spark.createDataFrame(rrows, R),
        left_id="lid", right_id="rid",
        blocks=[
            (F.col("city"), F.col("city")),
            (F.col("phone"), F.col("phone")),
            (F.substring("name", 1, 3), F.substring("name", 1, 3)),
        ],
        fields=FIELDS, threshold=4,
    ).collect()
    assert [(r.lid, r.rid, r.score) for r in got] == [(1, 10, 6)]  # ONE row


def test_validation(spark):
    df = spark.createDataFrame([(1, "a", "p", "c")], L)
    rf = spark.createDataFrame([(2, "a", "p", "c")], R)
    with pytest.raises(ValueError):
        record_linkage(df, rf, left_id="lid", right_id="rid", blocks=[],
                       fields=FIELDS, threshold=1)
    with pytest.raises(ValueError):
        record_linkage(df, rf, left_id="lid", right_id="rid",
                       blocks=[(F.col("city"), F.col("city"))],
                       fields=[], threshold=1)
    with pytest.raises(ValueError):
        record_linkage(df, rf, left_id="lid", right_id="rid",
                       blocks=[(F.col("city"), F.col("city"))],
                       fields=FIELDS + [FIELDS[0]], threshold=1)


def test_partition_invariance(spark):
    lrows = [(i, f"name{i}", f"p{i % 7}", f"c{i % 3}") for i in range(40)]
    rrows = [(100 + i, f"name{i}x", f"p{i % 7}", f"c{i % 3}") for i in range(40)]
    left = spark.createDataFrame(lrows, L)
    right = spark.createDataFrame(rrows, R)
    kw = dict(left_id="lid", right_id="rid",
              blocks=[(F.col("city"), F.col("city"))], fields=FIELDS, threshold=4)
    a = {tuple(r) for r in record_linkage(left, right, **kw).collect()}
    b = {
        tuple(r)
        for r in record_linkage(
            left.repartition(7, "lid"), right.repartition(5, "rid"), **kw
        ).collect()
    }
    assert a == b
    # 40 true pairs + one legitimate fuzzy collision: "name23" -> "name2x"
    # is a single substitution, with phone (23%7 == 2%7) and city
    # (23%3 == 2%3) agreeing — exactly the near-miss the score model admits
    assert len(a) == 41 and (23, 102, 6) in a
