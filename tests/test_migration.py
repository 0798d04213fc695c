"""Schema-evolution impact analysis (schema/migration.py): both schema
versions evaluated in one scan; transition matrix + breaking-violation rows."""

import os

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.schema.migration import (
    breaking_violations,
    migration_impact,
    migration_matrix,
)

OLD = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True, "minimum": 0},
        "text": {"type": "string", "required": True, "minLength": 1, "maxLength": 10},
        "lang": {"type": "string", "enum": ["en", "de"]},
    },
}

# tightened maxLength (10 -> 5: breaks long-text docs), widened enum
# (+ "fr": forgives fr docs)
NEW = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "required": True, "minimum": 0},
        "text": {"type": "string", "required": True, "minLength": 1, "maxLength": 5},
        "lang": {"type": "string", "enum": ["en", "de", "fr"]},
    },
}

SCHEMA = "doc_id long, text string, lang string"

ROWS = [
    (1, "ok", "en"),        # valid -> valid
    (2, "longtext", "en"),  # valid(8<=10) -> invalid(8>5): BREAKING
    (3, "ok", "fr"),        # invalid(enum) -> valid: forgiven
    (4, "x" * 20, "zz"),    # invalid -> invalid (both schemas)
]


def _matrix(df):
    return {
        (r["valid_old"], r["valid_new"]): r["n_docs"]
        for r in migration_matrix(df, OLD, NEW).collect()
    }


def test_matrix_all_four_cells(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    assert _matrix(df) == {
        (True, True): 1,
        (True, False): 1,
        (False, True): 1,
        (False, False): 1,
    }


def test_breaking_rows_are_new_schema_errors(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = breaking_violations(df, OLD, NEW).collect()
    # only doc 2 regresses; its single new-schema error is the tightened
    # maxLength with the standard (code, pointer, value, arg) shape
    assert [(r.doc_id, r.code, r.json_pointer, r.value, r.arg) for r in rows] == [
        (2, "maxLength", "/text", "longtext", "5")
    ]


def test_loosening_only_migration_has_no_breaking_rows(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    # migrating NEW -> OLD only loosens maxLength but narrows the enum;
    # doc 3 (fr, valid under NEW) regresses under OLD
    rows = breaking_violations(df, NEW, OLD).collect()
    assert [(r.doc_id, r.code) for r in rows] == [(3, "enum")]
    # and pure widening (OLD -> OLD-with-wider-enum) breaks nothing
    wider = {**OLD, "properties": {**OLD["properties"],
                                   "lang": {"type": "string",
                                            "enum": ["en", "de", "fr", "zz"]}}}
    assert breaking_violations(df, OLD, wider).count() == 0


def test_impact_shares_one_scan_zero_shuffle(spark, tmp_path):
    path = os.path.join(str(tmp_path), "docs")
    spark.createDataFrame(ROWS, SCHEMA).write.parquet(path)
    impact = migration_impact(spark.read.parquet(path), OLD, NEW)
    plan = impact._jdf.queryExecution().executedPlan().toString()
    # both validators fuse into one projection over ONE scan of the corpus
    assert plan.count("FileScan") == 1
    assert "Exchange" not in plan


def test_matrix_partition_invariance(spark):
    df = spark.createDataFrame(ROWS * 10, SCHEMA)
    assert _matrix(df) == _matrix(df.repartition(7, "doc_id"))


def test_null_required_counts_invalid_under_both(spark):
    df = spark.createDataFrame([(5, None, "en")], SCHEMA)
    assert _matrix(df) == {(False, False): 1}


def test_closed_root_schema_not_poisoned_by_appended_columns(spark):
    # root additionalProperties: false — both validators must judge the
    # PRISTINE row struct, not each other's appended errors/valid columns
    closed = {
        "type": "object",
        "properties": {
            "doc_id": {"type": "integer", "required": True},
            "text": {"type": "string", "maxLength": 10},
        },
        "additionalProperties": False,
    }
    closed_tight = {
        **closed,
        "properties": {
            "doc_id": {"type": "integer", "required": True},
            "text": {"type": "string", "maxLength": 5},
        },
    }
    df = spark.createDataFrame([(1, "ok"), (2, "longtext")], "doc_id long, text string")
    got = {
        (r["valid_old"], r["valid_new"]): r["n_docs"]
        for r in migration_matrix(df, closed, closed_tight).collect()
    }
    assert got == {(True, True): 1, (True, False): 1}


def test_matrix_differential_vs_walker_on_random_data(spark):
    # the vectorized dual validation must agree with the reference-parity
    # walker applied per row under BOTH schema versions
    import random

    from schemasaurus_spark import new_validator

    rng = random.Random(23)
    rows = []
    for i in range(200):
        rows.append(
            (
                i if rng.random() < 0.9 else -i,
                rng.choice(["ok", "longtext-here", "x" * 30, "", None]),
                rng.choice(["en", "de", "fr", "zz", None]),
            )
        )
    df = spark.createDataFrame(rows, SCHEMA)
    got = _matrix(df)

    v_old, v_new = new_validator(OLD), new_validator(NEW)
    want: dict = {}
    for doc_id, text, lang in rows:
        inst = {"doc_id": doc_id}
        if text is not None:
            inst["text"] = text
        if lang is not None:
            inst["lang"] = lang
        key = (v_old(inst)["valid"], v_new(inst)["valid"])
        want[key] = want.get(key, 0) + 1
    assert got == want
