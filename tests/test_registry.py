"""Versioned-schema routing (schema/registry.py): per-row dispatch to
the right compiled validator, parity with per-version apply(), and the
fail-closed unknown-version branch."""

from schemasaurus_spark.schema.columns import validate_dataframe
from schemasaurus_spark.schema.registry import SchemaRegistry

V1 = {
    "type": "object",
    "properties": {
        "n": {"type": "integer", "required": True, "maximum": 100},
    },
}
V2 = {
    "type": "object",
    "properties": {
        "n": {"type": "integer", "required": True, "maximum": 10},
        "tag": {"type": "string", "required": True, "minLength": 2},
    },
}


def _frame(spark):
    rows = [
        # (id, version, n, tag): row 1 ok under v1 (n<=100, tag ignored)
        (1, "1", 50, None),
        (2, "1", 500, None),     # v1 violation: maximum
        (3, "2", 5, "ok"),       # v2 ok
        (4, "2", 50, "ok"),      # v2 violation: maximum 10
        (5, "2", 5, None),       # v2 violation: tag required
        (6, "9", 5, "x"),        # unregistered version
        (7, None, 5, "x"),       # NULL version
    ]
    return spark.createDataFrame(
        rows, "id bigint, schema_version string, n bigint, tag string"
    )


def test_routing_matches_per_version_apply(spark):
    df = _frame(spark)
    reg = SchemaRegistry({"1": V1, "2": V2})
    got = {r.id: r for r in reg.validate(df).collect()}
    # parity: each known-version row judged exactly as apply() would
    for ver, schema in (("1", V1), ("2", V2)):
        sub = df.where(f"schema_version = '{ver}'")
        want = {r.id: r for r in validate_dataframe(sub, schema).collect()}
        for rid, w in want.items():
            g = got[rid]
            assert g.valid == w.valid, rid
            assert [e.code for e in g.errors] == [e.code for e in w.errors], rid
    assert got[1].valid and got[3].valid
    assert not got[2].valid and got[2].errors[0].code == "maximum"
    # NULL required property fires required AND the type check — same
    # two codes apply() emits (parity asserted above)
    assert {e.code for e in got[5].errors} == {"required", "string"}


def test_unknown_and_null_versions_fail_closed(spark):
    got = {r.id: r for r in SchemaRegistry({"1": V1, "2": V2}).validate(_frame(spark)).collect()}
    for rid, val in ((6, "9"), (7, "null")):
        r = got[rid]
        assert not r.valid
        assert len(r.errors) == 1
        assert r.errors[0].code == "schemaVersion"
        assert r.errors[0].value == val


def test_validation_errors(spark):
    df = _frame(spark)
    try:
        SchemaRegistry({})
        assert False
    except ValueError:
        pass
    try:
        SchemaRegistry({"1": V1}).validate(df, version_col="nope")
        assert False
    except ValueError as e:
        assert "nope" in str(e)
