"""JSONL ingestion (sources/jsonl.py + the Arrow-batch walker backends):
raw reference-style JSON lines validated and normalized at the cluster
boundary, with malformed lines surfaced, never dropped."""

from __future__ import annotations

import json

import pytest

from schemasaurus_spark import new_normalizer, new_validator
from schemasaurus_spark.sources.jsonl import (
    normalize_jsonl,
    read_jsonl,
    validate_jsonl,
)

SCHEMA = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "string", "required": True, "pattern": "^d[0-9]+$"},
        "n": {"type": "integer", "minimum": 0, "default": 0},
        "lang": {"type": "string", "enum": ["en", "de"]},
        "tags": {"type": "array", "items": {"type": "string"}},
    },
}

LINES = [
    {"doc_id": "d1", "n": 3, "lang": "en", "tags": ["a", "b"]},
    {"doc_id": "d2", "lang": "de"},
    {"doc_id": "nope", "n": -1, "lang": "zz"},  # 3 violations
    {"n": 5},  # missing required doc_id
    {"doc_id": "d5", "tags": ["ok", 7], "extra": True},  # bad item + extra prop
]
BAD_LINE = '{"doc_id": "d6", "n": '  # truncated JSON


@pytest.fixture(scope="module")
def jsonl_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "docs.jsonl"
    with open(p, "w") as f:
        for d in LINES:
            f.write(json.dumps(d) + "\n")
        f.write(BAD_LINE + "\n")
    return str(p)


def test_read_jsonl_line_per_row(spark, jsonl_path):
    assert read_jsonl(spark, jsonl_path).count() == 6


def test_validate_jsonl_matches_driver_walker(spark, jsonl_path):
    """Distributed verdicts/errors == the driver-side walker run line by
    line (the reference-parity boundary)."""
    rows = {r.doc_json: r for r in validate_jsonl(spark, jsonl_path, SCHEMA).collect()}
    assert len(rows) == 6
    v = new_validator(SCHEMA)
    for d in LINES:
        line = json.dumps(d)
        res = v(json.loads(line))
        got = rows[line]
        assert got.valid == res["valid"]
        assert [e.code for e in got.errors] == [e["code"] for e in res["errors"]]
        assert [e.path for e in got.errors] == [
            "/" + "/".join(str(p) for p in e["path"]) if e["path"] else ""
            for e in res["errors"]
        ]


def test_malformed_line_becomes_jsonParse_record(spark, jsonl_path):
    rows = {r.doc_json: r for r in validate_jsonl(spark, jsonl_path, SCHEMA).collect()}
    bad = rows[BAD_LINE]
    assert not bad.valid
    assert [e.code for e in bad.errors] == ["jsonParse"]
    assert bad.errors[0].value == BAD_LINE


def test_malformed_line_raise_mode(spark, jsonl_path):
    with pytest.raises(Exception):
        validate_jsonl(spark, jsonl_path, SCHEMA, on_parse_error="raise").collect()


def test_normalize_jsonl_matches_driver_and_nulls_malformed(spark, jsonl_path):
    rows = {r.doc_json: r.normalized for r in normalize_jsonl(spark, jsonl_path, SCHEMA).collect()}
    n = new_normalizer(SCHEMA)
    for d in LINES:
        line = json.dumps(d)
        expect = json.dumps(n(json.loads(line)), separators=(",", ":"))
        assert rows[line] == expect
    assert rows[BAD_LINE] is None
    # spot-check reference semantics came through: default applied, extra
    # property removed, key order preserved
    got = json.loads(rows[json.dumps(LINES[1])])
    assert got == {"doc_id": "d2", "lang": "de", "n": 0}
    assert "extra" not in json.loads(rows[json.dumps(LINES[4])])
