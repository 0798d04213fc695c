"""SemDeDup (operators/semdedup.py): closed-form clusters + keep rule
(least-centroid-similar survives, id tie-break), cross-cell miss (the
documented approximation), applied filter, zero-norm passthrough,
list_cap truncation reporting, derived cell count, partition
invariance."""

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.operators.semdedup import (
    derive_semdedup_n_list,
    semantic_dedup,
    semantic_dup_members,
)
from schemasaurus_spark.operators.similarity import IVF_MAX_LIST, IvfIndex

DIM = 4
INDEX = IvfIndex([(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])], DIM)

# cell 0: ids 1,2,3 pairwise-cosine > 0.95; id 3 is FARTHEST from the
# centroid (keep). cell 1: ids 4,5 (id 5 farther -> keep). id 6:
# singleton. ids 7/8: cosine 0.99995 but straddle the cell boundary
# (7 -> cell 1, 8 -> cell 0) -> the documented cross-cell miss. id 9:
# zero-norm, never compared.
ROWS = [
    (1, [1.0, 0.10, 0.0, 0.0]),
    (2, [1.0, 0.12, 0.0, 0.0]),
    (3, [1.0, 0.30, 0.0, 0.0]),
    (4, [0.0, 1.0, 0.05, 0.0]),
    (5, [0.0, 1.0, 0.06, 0.0]),
    (6, [0.5, 0.5, 0.70, 0.0]),
    (7, [1.0, 1.01, 0.0, 0.0]),
    (8, [1.01, 1.0, 0.0, 0.0]),
    (9, [0.0, 0.0, 0.0, 0.0]),
]


def _emb(spark, rows=ROWS):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_components_and_keep_rule(spark):
    got = {
        r["vec_id"]: r
        for r in semantic_dup_members(_emb(spark), DIM, index=INDEX).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert {got[i]["comp_id"] for i in (1, 2, 3)} == {1}
    assert {got[i]["comp_id"] for i in (4, 5)} == {4}
    # keep = least similar to the centroid (the SemDeDup outlier rule)
    assert [i for i in (1, 2, 3) if got[i]["keep"]] == [3]
    assert [i for i in (4, 5) if got[i]["keep"]] == [5]
    # centroid_sim is the winning assignment cosine, rounded to 6
    assert got[3]["centroid_sim"] == pytest.approx(1.0 / (1.09 ** 0.5), abs=1e-6)


def test_cross_cell_pair_is_missed(spark):
    ids = {
        r["vec_id"]
        for r in semantic_dup_members(_emb(spark), DIM, index=INDEX).collect()
    }
    # 7 and 8 are 0.99995-similar but land in different cells
    assert 7 not in ids and 8 not in ids


def test_semantic_dedup_filter(spark):
    kept = {
        r["vec_id"]
        for r in semantic_dedup(_emb(spark), DIM, index=INDEX).collect()
    }
    assert kept == {3, 5, 6, 7, 8, 9}  # zero-norm id 9 passes through


def test_list_cap_truncation_reported(spark):
    report = {}
    got = semantic_dup_members(
        _emb(spark), DIM, index=INDEX, list_cap=2, report_out=report
    ).collect()
    # cell 0 holds 5 members (1,2,3,8 + the equidistant 6, whose
    # centroid tie breaks to the smaller list id) > cap -> excluded;
    # cell 1 (4,5,7) also over cap -> nothing pairs, and the report says so
    assert got == []
    assert report["n_truncated_buckets"] == 2
    assert report["n_truncated_rows"] == 8


def test_keep_rule_id_tiebreak(spark):
    rows = [(10, [1.0, 0.2, 0.0, 0.0]), (11, [1.0, 0.2, 0.0, 0.0])]
    got = {
        r["vec_id"]: r["keep"]
        for r in semantic_dup_members(_emb(spark, rows), DIM, index=INDEX).collect()
    }
    assert got == {10: True, 11: False}


def test_derive_semdedup_n_list():
    assert derive_semdedup_n_list(None) == 1
    assert derive_semdedup_n_list(64) == 1
    assert derive_semdedup_n_list(65) == 2
    assert derive_semdedup_n_list(10**12) == IVF_MAX_LIST


def test_derived_index_path_and_partition_invariance(spark):
    # no explicit index: md5-sampled centroids, derived cell count —
    # result must not depend on input partitioning
    df = _emb(spark)
    a = sorted(
        semantic_dup_members(df, DIM, n_list=2).collect(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        semantic_dup_members(df.repartition(7, "vec_id"), DIM, n_list=2).collect(),
        key=lambda r: r["vec_id"],
    )
    assert a == b
    assert len(a) >= 2  # something grouped under the derived index too
