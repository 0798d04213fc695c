"""Observed-schema profile + conformance (schema/profile.py): counts are
exact vs hand-computed walks, malformed/SQL-NULL handling, the declared
inventory comes from the iterator ghost walk, and draft-4 numeric
subsumption holds in conformance."""

import pytest
from pyspark.sql import functions as F

from schemasaurus_spark.schema.profile import (
    declared_paths,
    json_schema_profile,
    schema_conformance,
)

DOCS = [
    '{"k": 1, "tags": ["a", "b"], "meta": {"src": "web", "lvl": 2}}',
    '{"k": "oops"}',
    '{"k": 1.5, "tags": []}',
    "{broken",
    None,
    '[1, 2.5, {"x": true}]',
]


@pytest.fixture(scope="module")
def profile_df(spark):
    df = spark.createDataFrame([(s,) for s in DOCS], "j string")
    return json_schema_profile(df, "j")


def test_profile_counts_exact(profile_df):
    got = {(r.path, r.jtype): r.n for r in profile_df.collect()}
    assert got == {
        ("", "object"): 3,
        ("", "malformed"): 1,
        ("", "array"): 1,
        ("/k", "integer"): 1,
        ("/k", "string"): 1,
        ("/k", "number"): 1,
        ("/tags", "array"): 2,
        ("/tags[]", "string"): 2,
        ("/meta", "object"): 1,
        ("/meta/src", "string"): 1,
        ("/meta/lvl", "integer"): 1,
        ("[]", "integer"): 1,
        ("[]", "number"): 1,
        ("[]", "object"): 1,
        ("[]/x", "boolean"): 1,
    }
    # SQL NULL contributed nothing anywhere (5 non-null inputs, 4 roots + 1 malformed)
    assert sum(n for (p, t), n in got.items() if p == "") == 5


def test_profile_escapes_pointer_tokens(spark):
    df = spark.createDataFrame([('{"a/b": {"c~d": 1}}',)], "j string")
    got = {(r.path, r.jtype) for r in json_schema_profile(df, "j").collect()}
    assert ("/a~1b/c~0d", "integer") in got


DECLARED = {
    "type": "object",
    "properties": {
        "k": {"type": "number"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "meta": {
            "type": "object",
            "properties": {"src": {"type": "string"}, "lvl": {}},
        },
    },
}


def test_declared_paths_from_iterator_ghost_walk():
    got = dict(declared_paths(DECLARED))
    assert got[""] == ["object"]
    assert got["/k"] == ["number"]
    assert got["/tags"] == ["array"]
    assert got["/tags[]"] == ["string"]
    assert got["/meta/src"] == ["string"]
    assert got["/meta/lvl"] is None  # declared but untyped


def test_conformance_issues(profile_df):
    out = schema_conformance(profile_df, DECLARED)
    got = {(r.path, r.jtype): r.issue for r in out.collect()}
    # integer k satisfies declared number (subsumption) -> absent
    assert ("/k", "integer") not in got
    assert ("/k", "number") not in got
    # string k is a mismatch
    assert got[("/k", "string")] == "type_mismatch"
    # untyped declared path conforms to anything -> /meta/lvl absent
    assert ("/meta/lvl", "integer") not in got
    # array-root docs and their members are undeclared paths
    assert got[("", "array")] == "type_mismatch"  # root IS declared (object)
    assert got[("[]", "integer")] == "undeclared_path"
    assert got[("[]/x", "boolean")] == "undeclared_path"
    assert got[("", "malformed")] == "malformed"
    # nothing else flagged
    assert set(got) == {
        ("/k", "string"),
        ("", "array"),
        ("", "malformed"),
        ("[]", "integer"),
        ("[]", "number"),
        ("[]", "object"),
        ("[]/x", "boolean"),
    }


def test_kernel_preaggregates_before_shuffle(spark):
    # the exchange feeding the final groupBy must hang off the Arrow
    # kernel's per-batch counter rows, not per-JSON-node rows: the plan
    # is scan -> ArrowEvalPython/MapInPandas -> partial agg -> ONE exchange
    df = spark.createDataFrame([(s,) for s in DOCS * 50], "j string")
    plan = json_schema_profile(df, "j")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "MapInPandas" in plan
    # partial aggregation sits below the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange")


# ---------------------------------------------------------------- drift


def _profile_of(spark, docs):
    from schemasaurus_spark.schema.profile import json_schema_profile

    df = spark.createDataFrame([(d,) for d in docs], "j string")
    return json_schema_profile(df, "j")


def test_schema_profile_drift_all_statuses(spark):
    from schemasaurus_spark.schema.profile import schema_profile_drift

    base = _profile_of(
        spark,
        ['{"u": 1, "v": 1.5, "tags": ["x"]}', '{"u": 2, "old": "s"}'],
    )
    cur = _profile_of(
        spark,
        ['{"u": "1", "v": 2}', '{"u": 3, "nk": true}', '{"u": 4, "old": "s"}',
         '{"u": 5, "old": "s"}'],
    )
    rows = {
        (r.path, r.jtype): r for r in schema_profile_drift(base, cur).collect()
    }
    assert rows[("/nk", "boolean")].status == "added_path"
    assert rows[("/tags", "array")].status == "removed_path"
    assert rows[("/tags[]", "string")].status == "removed_path"
    assert rows[("/u", "string")].status == "added_type"
    assert rows[("/v", "number")].status == "removed_type"
    assert rows[("/v", "integer")].status == "added_type"
    assert rows[("/u", "integer")].status == "common"
    assert rows[("/old", "string")].status == "common"
    # share arithmetic: /old 1/2 -> 2/4 = no shift; root = 1 -> 1
    r = rows[("/old", "string")]
    assert (r.n_base, r.n_cur) == (1, 2)
    assert r.share_base == 0.5 and r.share_cur == 0.5 and r.share_delta == 0.0
    root = rows[("", "object")]
    assert root.status == "common" and root.share_delta == 0.0
    # /u integer share drops 2/2 -> 3/4
    u = rows[("/u", "integer")]
    assert u.share_base == 1.0 and u.share_cur == 0.75


def test_schema_profile_drift_empty_side(spark):
    from schemasaurus_spark.schema.profile import schema_profile_drift

    base = _profile_of(spark, ['{"a": 1}'])
    empty = _profile_of(spark, [])
    rows = {(r.path, r.jtype): r for r in schema_profile_drift(base, empty).collect()}
    assert rows[("/a", "integer")].status == "removed_path"
    assert rows[("/a", "integer")].share_cur is None
    assert rows[("/a", "integer")].share_delta is None
