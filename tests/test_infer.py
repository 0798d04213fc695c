"""Schema inference (schema/infer.py): soundness (inferred schema accepts
its own data), tightness, enum path, NULL/required semantics, and the
composition with the compat analyzer (drift reads as schema evolution)."""

import pytest

from schemasaurus_spark.schema.compat import schema_delta
from schemasaurus_spark.schema.infer import infer_schema, schema_constraint_rows
from schemasaurus_spark.schema.migration import migration_matrix
from schemasaurus_spark.schema.columns import validate_dataframe

SCHEMA = "doc_id long, text string, lang string, score double, flag boolean"

ROWS = [
    (1, "hello", "en", 0.5, True),
    (2, "hi", "de", -1.25, False),
    (3, "longer text", None, 2.0, True),
]


def test_soundness_inferred_schema_accepts_its_data(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    s = infer_schema(df)
    validated = validate_dataframe(df, s)
    assert validated.where("NOT valid").count() == 0


def test_inferred_constraints_are_tight(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    s = infer_schema(df)
    p = s["properties"]
    assert p["doc_id"] == {
        "type": "integer", "required": True, "minimum": 1, "maximum": 3
    }
    assert p["text"]["minLength"] == 2 and p["text"]["maxLength"] == 11
    assert p["text"]["required"] is True
    # lang has a NULL -> not required; low cardinality -> enum
    assert "required" not in p["lang"]
    assert p["lang"]["enum"] == ["de", "en"]
    assert p["score"] == {
        "type": "number", "required": True, "minimum": -1.25, "maximum": 2.0
    }
    assert p["flag"] == {"type": "boolean", "required": True}


def test_enum_suppressed_above_cardinality_cap(spark):
    rows = [(i, f"v{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, cat string")
    assert "enum" not in infer_schema(df, enum_max=10)["properties"]["cat"]
    assert len(infer_schema(df, enum_max=25)["properties"]["cat"]["enum"]) == 20
    assert "enum" not in infer_schema(df, enum_max=0)["properties"]["cat"]


def test_all_null_column_is_type_only(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    p = infer_schema(df)["properties"]["s"]
    assert p == {"type": "string"}


def test_drift_reads_as_schema_evolution(spark):
    old = spark.createDataFrame([(1, "aa"), (2, "bbb")], "id long, t string")
    new = spark.createDataFrame([(1, "aa"), (2, "bbbbbb"), (3, None)], "id long, t string")
    # enum off: the low-cardinality enum would (correctly) narrow when a
    # value vanishes between corpora; this test isolates the bound/required
    # widenings
    s_old, s_new = infer_schema(old, enum_max=0), infer_schema(new, enum_max=0)
    deltas = {(d.path, d.keyword): d.kind for d in schema_delta(s_old, s_new)}
    # longer strings -> maxLength widened; a NULL appeared -> required dropped
    assert deltas[("/t", "maxLength")] == "widening"
    assert deltas[("", "required")] == "widening"
    assert deltas[("/id", "maximum")] == "widening"
    # and the measured matrix agrees: every old row is valid under the
    # new inferred schema (pure widening)
    m = {
        (r.valid_old, r.valid_new): r.n_docs
        for r in migration_matrix(old, s_old, s_new).collect()
    }
    assert m == {(True, True): 2}


def test_constraint_rows_projection(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rows = schema_constraint_rows(infer_schema(df))
    assert ("lang", "enum", "de|en") in rows
    assert ("doc_id", "required", "true") in rows
    assert ("score", "minimum", "-1.25") in rows


def test_validation(spark):
    arr_df = spark.createDataFrame([([1],)], "a array<int>")
    with pytest.raises(ValueError):
        infer_schema(arr_df)  # no supported flat columns
    flat = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        infer_schema(flat, enum_max=-1)


def test_nonfinite_float_columns_stay_json_and_sound(spark):
    """Round-5 fixes: (a) NaN/Inf must never reach minimum/maximum (the
    JSON tokens NaN/Infinity break every draft-4 consumer), and (b) a
    column MIXING finite and non-finite values gets NO bounds at all —
    finite-only bounds would reject the very rows that produced them
    (validators sort NaN/Inf above any finite maximum)."""
    import json

    from schemasaurus_spark import new_validator

    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, 2.5), (4, float("inf"))],
        "id long, x double",
    )
    s = infer_schema(df)
    sub = s["properties"]["x"]
    assert "minimum" not in sub and "maximum" not in sub  # mixed -> type-only
    json.dumps(s)  # never emits NaN/Infinity tokens
    # soundness round-trip: every producing row validates (NaN/Inf are
    # draft-4 numbers as far as `type` goes; no bounds to violate)
    v = new_validator(s)
    for r in df.collect():
        assert v({"id": r["id"], "x": r["x"]})["valid"], r
    # all-non-finite column: same type-only fallback
    df2 = spark.createDataFrame(
        [(1, float("nan")), (2, float("-inf"))], "id long, x double"
    )
    sub2 = infer_schema(df2)["properties"]["x"]
    assert "minimum" not in sub2 and "maximum" not in sub2
    # pure-finite column still gets exact bounds
    df3 = spark.createDataFrame([(1, 1.5), (2, 7.25)], "id long, x double")
    sub3 = infer_schema(df3)["properties"]["x"]
    assert sub3["minimum"] == 1.5 and sub3["maximum"] == 7.25
