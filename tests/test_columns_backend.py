"""Columnar-backend correctness: the native-Column validator must agree with
the Python walker (the reference-parity oracle) on the generated interleaved
documents table — same verdicts, same ordered (code, json-pointer) violation
lists per document.  This is the typed-backend equivalent of running the
reference's validate fixtures."""

import json

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark import new_validator
from schemasaurus_spark.plans.validation_job import DOCUMENT_SCHEMA, ValidationJob
from schemasaurus_spark.sources.generator import generate_documents


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, 300, seed=42, max_text_len=64).cache()


@pytest.fixture(scope="module")
def schema():
    # tighter maxLength so the generator's ~1% long-text injections violate
    s = json.loads(json.dumps(DOCUMENT_SCHEMA))
    s["properties"]["spans"]["items"]["properties"]["text"]["maxLength"] = 200
    return s


def walker_errors(schema, doc):
    res = new_validator(schema)(doc)
    return [
        (e["code"], "/" + "/".join(str(c) for c in e["path"]) if e["path"] else "")
        for e in res["errors"]
    ]


def test_column_backend_matches_walker(spark, docs, schema):
    job = ValidationJob(schema)
    validated = job.validated(docs)
    rows = validated.select(
        "doc_id", F.to_json(F.struct("doc_id", "spans")).alias("doc_json"), "errors", "valid"
    ).collect()
    assert len(rows) == 300
    n_invalid = 0
    for r in rows:
        doc = json.loads(r.doc_json)
        expected = walker_errors(schema, doc)
        got = [(e.code, e.path) for e in r.errors]
        assert got == expected, f"doc {r.doc_id}: {got} != {expected}"
        assert r.valid == (not expected)
        n_invalid += 0 if r.valid else 1
    # the generator injects violations — make sure both classes are present
    assert 0 < n_invalid < 300


def test_violations_contract(spark, docs, schema):
    job = ValidationJob(schema)
    v = job.violations(job.validated(docs))
    assert v.columns == [
        "doc_id", "span_idx", "keyword", "json_pointer",
        "code", "message", "value", "arg", "err_idx",
    ]
    sample = v.limit(5).collect()
    assert len(sample) > 0
    for row in sample:
        assert row.json_pointer.startswith("/")


def test_verdicts_two_phase(spark, docs, schema):
    job = ValidationJob(schema)
    verd = job.verdicts(job.validated(docs))
    rows = verd.collect()
    assert sum(r.n_docs for r in rows) == 300
    assert all(isinstance(r["pass"], bool) for r in rows)
    total_violations = sum(r.n_violations for r in rows)
    assert total_violations > 0


def test_count_mode_matches_error_arrays(spark, docs, schema):
    """The verdict fast path (count_only) must produce exactly
    size(errors) for every row of the generated corpus."""
    job = ValidationJob(schema)
    full = job.validated(docs).select(F.size("errors").alias("n")).collect()
    fast = job.counted(docs).select(F.col("n_violations").alias("n")).collect()
    assert [r.n for r in full] == [r.n for r in fast]
    assert sum(r.n for r in full) > 0


def test_count_mode_structural_keywords(spark):
    """Count mode over combinators / uniqueItems / tuple items /
    dependencies agrees with the error-array backend."""
    from schemasaurus_spark.schema.columns import ColumnValidator

    schema = {
        "type": "object",
        "properties": {
            "a": {"oneOf": [{"type": "integer", "minimum": 5}, {"type": "integer", "maximum": 2}]},
            "b": {"type": "array", "uniqueItems": True, "items": {"type": "integer"}},
            "c": {"allOf": [{"minimum": 0}, {"multipleOf": 2}]},
            "d": {"not": {"type": "integer", "minimum": 10}},
        },
        "dependencies": {"a": ["d"]},
    }
    df = spark.createDataFrame(
        [
            (3, [1, 2, 2, 3, 3, 3], 4, 1),
            (7, [1, 2], -3, 20),
            (None, None, None, None),
            (1, [5, 5], 2, None),
        ],
        "a int, b array<int>, c int, d int",
    )
    full = ColumnValidator(schema).apply(df).select(F.size("errors").alias("n")).collect()
    fast = (
        ColumnValidator(schema, count_only=True)
        .apply(df)
        .select(F.col("n_violations").alias("n"))
        .collect()
    )
    assert [r.n for r in full] == [r.n for r in fast]


def test_span_sequence_invariant(spark, docs):
    """Per-row span-sequence equality (kind, text, media_ref, order): the
    engine's projection must reproduce the source order exactly."""
    job = ValidationJob()
    first = docs.limit(1)
    src = first.collect()[0]
    flat = job.span_sequence(first).orderBy("order").collect()
    assert [r.order for r in flat] == list(range(len(src.spans)))
    assert [(r.kind, r.text, r.media_ref) for r in flat] == [
        (s.kind, s.text, s.media_ref) for s in src.spans
    ]
    nested = job.span_sequence_nested(first).collect()[0]
    assert [s["order"] for s in nested.span_seq] == list(range(len(src.spans)))


def test_offsets_strictly_increasing(spark, docs):
    bad = docs.select(
        F.exists(
            F.transform(
                "spans",
                lambda s, i: F.when(
                    i > 0,
                    s.getField("offset")
                    <= F.get(F.col("spans"), i - 1).getField("offset"),
                ).otherwise(F.lit(False)),
            ),
            lambda x: x,
        ).alias("violated")
    )
    assert bad.where("violated").count() == 0
