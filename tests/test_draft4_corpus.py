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


def test_corpus_verdicts_match_reference_implementation():
    """The corpus is not self-graded: every expected verdict is re-derived
    by RUNNING the reference (node + /root/reference/src) and must agree.
    Skipped where node or the reference checkout is unavailable.

    The harness compiles once per schema group — the reference leaks its
    $$visited recursion marker on $ref-holding nodes (compiler.js step()
    returns early on the deref path without the trailing delete), so a
    second compile of the same schema object miscompiles refs as
    root-recursion self-calls.  Known deviation kept OUT of the corpus:
    anyOf: [] (reference throws at runtime; our walker returns valid)."""
    import shutil
    import subprocess

    if shutil.which("node") is None or not os.path.isdir("/root/reference/src"):
        pytest.skip("node or reference checkout unavailable")
    corpus_path = os.path.join(os.path.dirname(__file__), "data", "draft4_corpus.json")
    harness = os.path.join(os.path.dirname(__file__), "..", "tools", "corpus_vs_reference.js")
    res = subprocess.run(
        ["node", harness, corpus_path], capture_output=True, text=True, check=True
    )
    verdicts = json.loads(res.stdout)
    bad = [v for v in verdicts if v["error"] or v["reference"] != v["expected"]]
    assert not bad, f"{len(bad)} corpus verdicts disagree with the reference: {bad[:5]}"
    assert len(verdicts) == sum(len(g["tests"]) for g in CORPUS)
