"""Official-suite-shaped draft-4 corpus (same {description, schema, tests}
triples as json-schema-test-suite, authored for the keywords we support —
the reference's submodule copy is not vendored in its snapshot) driven
through (a) the walker and (b) the distributed Arrow-batch backend."""

import json
import os

import pytest

from schemasaurus_spark import new_validator

CORPUS = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "draft4_corpus.json"))
)

CASES = [
    pytest.param(g["schema"], t["data"], t["valid"],
                 id=f"{g['description']} / {t['description']}")
    for g in CORPUS
    for t in g["tests"]
]


@pytest.mark.parametrize("schema,data,valid", CASES)
def test_walker_verdict(schema, data, valid):
    assert new_validator(schema)(data)["valid"] == valid


def test_batch_backend_runs_whole_corpus(spark):
    """Every (schema, data) pair validated distributed; verdicts match."""
    from schemasaurus_spark.schema.batch import validate_json_column

    for g in CORPUS:
        rows = [(json.dumps(t["data"]),) for t in g["tests"]]
        df = spark.createDataFrame(rows, "doc_json string")
        got = [
            r.valid
            for r in validate_json_column(df, g["schema"], "doc_json")
            .select("valid")
            .collect()
        ]
        expected = [t["valid"] for t in g["tests"]]
        assert got == expected, g["description"]
