"""Columnar normalizer vs the walker normalizer (reference-parity oracle):
defaults, undeclared-property removal, and JS type coercions over typed
rows must agree with running the reference semantics on the same values."""

import pytest
from pyspark.sql import types as T

from schemasaurus_spark import new_normalizer
from schemasaurus_spark.schema.normalize_columns import (
    ColumnNormalizer,
    normalize_dataframe,
)


def test_defaults_and_removal(spark):
    schema = {
        "properties": {
            "intProp": {"default": 10},
            "strProp": {"default": "test"},
        }
    }
    df = spark.createDataFrame(
        [(5, "str", 99), (None, None, 7)], "intProp int, strProp string, extra int"
    )
    out = normalize_dataframe(df, schema)
    assert out.columns == ["intProp", "strProp"]  # extra removed
    rows = out.collect()
    assert (rows[0].intProp, rows[0].strProp) == (5, "str")
    assert (rows[1].intProp, rows[1].strProp) == (10, "test")

    walker = new_normalizer(schema)
    assert walker({"intProp": 5, "strProp": "str", "extra": 99}) == {
        "intProp": 5, "strProp": "str",
    }
    assert walker({}) == {"intProp": 10, "strProp": "test"}


def test_js_coercions_match_walker(spark):
    schema = {
        "properties": {
            "i": {"type": "integer"},
            "n": {"type": "number"},
            "s": {"type": "string"},
            "b": {"type": "boolean"},
            "a": {"type": "array"},
        }
    }
    data = [
        ("22", "22.2", 5, "on", 1),
        ("7px", ".5", -3, "off", 2),
        ("abc", "1e3", 0, "whatever", 3),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame(
        data, "i string, n string, s int, b string, a int"
    )
    out = normalize_dataframe(df, schema)
    assert dict((f.name, f.dataType) for f in out.schema.fields) == {
        "i": T.LongType(),
        "n": T.DoubleType(),
        "s": T.StringType(),
        "b": T.BooleanType(),
        "a": T.ArrayType(T.IntegerType()),
    }
    rows = out.collect()

    walker = new_normalizer(schema)
    for got, src in zip(rows, data):
        doc = {k: v for k, v in zip("insba", src) if v is not None}
        expected = walker(doc)
        for k in "insba":
            if k not in expected:
                assert got[k] is None
                continue
            exp = expected[k]
            if k == "i" and isinstance(exp, float) and exp != exp:  # NaN
                assert got[k] is None  # typed backend: NaN -> null (documented)
            elif k == "a":
                assert got[k] == exp
            else:
                assert got[k] == exp, (k, got[k], exp)


def test_float_to_integer_truncates_toward_zero(spark):
    df = spark.createDataFrame([(3.9,), (-3.9,), (2.0,)], "x double")
    out = normalize_dataframe(df, {"properties": {"x": {"type": "integer"}}})
    assert [r.x for r in out.collect()] == [3, -3, 2]


def test_nested_array_items_coercion(spark):
    schema = {
        "properties": {
            "tags": {"type": "array", "items": {"type": "string"}},
        }
    }
    df = spark.createDataFrame([([1, 2, 3],)], "tags array<int>")
    out = normalize_dataframe(df, schema)
    assert out.collect()[0].tags == ["1", "2", "3"]


def test_unsupported_routes_to_walker(spark):
    from schemasaurus_spark.schema.columns import SchemaUnsupportedError

    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(SchemaUnsupportedError):
        normalize_dataframe(df, {"properties": {"x": {"type": ["integer", "string"]}}})


def test_default_is_not_coerced(spark):
    """Reference quirk: [default] fires before [type] but the coercion
    reads the stale (undefined) binding, so a filled-in default is never
    coerced.  Typed path: the default is injected uncoerced into the
    coerced output column; non-null values are coerced as usual."""
    schema = {"properties": {"s": {"type": "string", "default": "absent"}}}
    df = spark.createDataFrame([(5,), (None,)], "s int")
    rows = normalize_dataframe(df, schema).collect()
    assert [r.s for r in rows] == ["5", "absent"]
    walker = new_normalizer(schema)
    assert walker({"s": 5}) == {"s": "5"}
    assert walker({"s": None}) == {"s": "absent"}


def test_default_mutated_by_coercion_routes_to_walker(spark):
    """{default: 'on', type: 'boolean'} on a nullable string column: the
    reference yields the *string* 'on' for defaulted rows and booleans for
    the rest — unrepresentable in one typed column, so the columnar backend
    must refuse (rather than silently coercing the default to true)."""
    from schemasaurus_spark.schema.columns import SchemaUnsupportedError

    schema = {"properties": {"b": {"type": "boolean", "default": "on"}}}
    df = spark.createDataFrame([("true",), (None,)], "b string")
    with pytest.raises(SchemaUnsupportedError):
        normalize_dataframe(df, schema)
    walker = new_normalizer(schema)
    assert walker({"b": "yes"}) == {"b": True}
    assert walker({"b": None}) == {"b": "on"}  # default stays uncoerced
