"""Arrow-batch walker backend: distributed validation of dynamic JSON
payloads must agree with (a) the driver-side walker and (b) the native
Column backend on the generated corpus."""

import json

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark import new_validator
from schemasaurus_spark.plans.validation_job import DOCUMENT_SCHEMA, ValidationJob
from schemasaurus_spark.schema.batch import validate_json_column
from schemasaurus_spark.sources.generator import (
    documents_as_json,
    generate_documents,
)


@pytest.fixture(scope="module")
def json_docs(spark):
    docs = generate_documents(spark, 200, seed=31, max_text_len=64)
    return documents_as_json(docs).cache()


def test_batch_matches_driver_walker(spark, json_docs):
    out = validate_json_column(
        json_docs, DOCUMENT_SCHEMA, "doc_json", keep=["doc_id", "doc_json"]
    ).collect()
    validate = new_validator(DOCUMENT_SCHEMA)
    assert len(out) == 200
    n_invalid = 0
    for row in out:
        res = validate(json.loads(row.doc_json))
        assert row.valid == res["valid"]
        got = [(e.code, e.path) for e in row.errors]
        exp = [
            (e["code"], "/" + "/".join(str(c) for c in e["path"]) if e["path"] else "")
            for e in res["errors"]
        ]
        assert got == exp
        n_invalid += 0 if row.valid else 1
    assert 0 < n_invalid < 200


def test_batch_matches_column_backend_verdicts(spark):
    docs = generate_documents(spark, 300, seed=33, max_text_len=64).cache()
    jdocs = documents_as_json(docs)
    job = ValidationJob()
    col_valid = sorted(
        (r.doc_id, r.valid)
        for r in job.counted(docs).select("doc_id", "valid").collect()
    )
    batch_valid = sorted(
        (r.doc_id, r.valid)
        for r in validate_json_column(
            jdocs, DOCUMENT_SCHEMA, "doc_json", keep=["doc_id"]
        ).collect()
    )
    assert col_valid == batch_valid


def test_batch_handles_dynamic_union_types(spark):
    """A schema the Column backend rejects (union type) runs on the batch
    backend with reference semantics."""
    schema = {"type": "object", "properties": {"x": {"type": ["integer", "string"]}}}
    df = spark.createDataFrame(
        [('{"x": 5}',), ('{"x": "ok"}',), ('{"x": 1.5}',), ('{"x": true}',)],
        "doc_json string",
    )
    rows = validate_json_column(df, schema, "doc_json").collect()
    assert [r.valid for r in rows] == [True, True, False, False]
    # all-branches-failed: one error per union branch (v4validator.js:122-143)
    assert [e.code for e in rows[2].errors] == ["integer", "string"]
