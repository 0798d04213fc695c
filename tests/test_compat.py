"""Static compatibility analyzer (schema/compat.py): per-keyword delta
classification, the soundness contract checked differentially against the
reference-parity walker, and agreement with the measured migration impact."""

import random

from schemasaurus_spark import new_validator
from schemasaurus_spark.schema.compat import (
    is_backward_compatible,
    schema_delta,
)


def _kinds(old, new):
    return {(d.path, d.keyword): d.kind for d in schema_delta(old, new)}


# ---------------------------------------------------------------- unit rules


def test_bound_and_enum_directions():
    old = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 10},
            "b": {"type": "string", "enum": ["x", "y"]},
        },
    }
    new = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "minimum": 2, "maximum": 20},
            "b": {"type": "string", "enum": ["x", "y", "z"]},
        },
    }
    k = _kinds(old, new)
    assert k[("/a", "minimum")] == "narrowing"
    assert k[("/a", "maximum")] == "widening"
    assert k[("/b", "enum")] == "widening"
    assert not is_backward_compatible(old, new)  # the minimum tightened
    assert is_backward_compatible(new, old) is False  # enum shrinks back


def test_type_lattice_integer_number():
    assert _kinds({"type": "integer"}, {"type": "number"})[("", "type")] == "widening"
    assert _kinds({"type": "number"}, {"type": "integer"})[("", "type")] == "narrowing"
    assert (
        _kinds({"type": "string"}, {"type": ["string", "null"]})[("", "type")]
        == "widening"
    )
    assert _kinds({"type": "string"}, {"type": "integer"})[("", "type")] == "incomparable"


def test_required_pattern_format_additional():
    old = {
        "type": "object",
        "properties": {"a": {"type": "string", "pattern": "^x", "required": True}},
    }
    new = {
        "type": "object",
        "required": ["a", "b"],
        "properties": {
            "a": {"type": "string", "pattern": "^y"},
            "b": {"type": "integer"},
        },
        "additionalProperties": False,
    }
    k = _kinds(old, new)
    assert ("", "required") in k and k[("", "required")] == "narrowing"  # b added
    assert k[("/a", "pattern")] == "incomparable"
    assert k[("", "additionalProperties")] == "narrowing"
    assert k[("/b", "properties")] == "narrowing"  # newly constrained property
    assert not is_backward_compatible(old, new)


def test_identical_schemas_are_compatible():
    s = {
        "type": "object",
        "properties": {"a": {"type": "string", "minLength": 1, "format": "uri"}},
        "patternProperties": {"^x": {"type": "integer"}},
    }
    assert schema_delta(s, s) == []
    assert is_backward_compatible(s, s)


def test_opaque_keywords_are_incomparable():
    old = {"patternProperties": {"^a": {"type": "string"}}}
    new = {"patternProperties": {"^a": {"type": "integer"}}}
    assert _kinds(old, new)[("", "patternProperties")] == "incomparable"
    old = {"definitions": {"d": {"type": "string"}}, "$ref": "#/definitions/d"}
    new = {"definitions": {"d": {"type": "integer"}}, "$ref": "#/definitions/d"}
    assert _kinds(old, new)[("", "definitions")] == "incomparable"


def test_multiple_of_divisibility():
    assert _kinds({"multipleOf": 10}, {"multipleOf": 5})[("", "multipleOf")] == "widening"
    assert _kinds({"multipleOf": 5}, {"multipleOf": 10})[("", "multipleOf")] == "narrowing"
    assert (
        _kinds({"multipleOf": 4}, {"multipleOf": 6})[("", "multipleOf")]
        == "incomparable"
    )


def test_agrees_with_measured_migration_paths():
    # the contract pair: V2 tightens /text + /n_chars, widens /lang
    import __spark_entry__ as e

    k = _kinds(e.FLAT_DOC_SCHEMA, e.FLAT_DOC_SCHEMA_V2)
    assert k[("/text", "maxLength")] == "narrowing"
    assert k[("/n_chars", "maximum")] == "narrowing"
    assert k[("/lang", "enum")] == "widening"
    assert not is_backward_compatible(e.FLAT_DOC_SCHEMA, e.FLAT_DOC_SCHEMA_V2)


# ------------------------------------------------- differential soundness


def _random_base(rng):
    props = {}
    for name in "abcd":
        kind = rng.choice(["int", "str", "num"])
        if kind == "int":
            sub = {"type": "integer", "minimum": rng.randrange(-5, 3)}
            if rng.random() < 0.5:
                sub["maximum"] = rng.randrange(5, 30)
        elif kind == "num":
            sub = {"type": "number"}
            if rng.random() < 0.5:
                sub["multipleOf"] = rng.choice([1, 2, 5])
        else:
            sub = {"type": "string", "minLength": rng.randrange(0, 3)}
            if rng.random() < 0.4:
                sub["maxLength"] = rng.randrange(3, 12)
            if rng.random() < 0.3:
                sub["enum"] = rng.sample(["a", "bb", "ccc", "dddd", "x"], 3)
        if rng.random() < 0.4:
            sub["required"] = True
        props[name] = sub
    return {"type": "object", "properties": props}


def _widen(rng, schema):
    """Apply 1-3 purely-widening mutations; returns the new schema."""
    import copy

    new = copy.deepcopy(schema)
    for _ in range(rng.randrange(1, 4)):
        name = rng.choice(list(new["properties"]))
        sub = new["properties"][name]
        op = rng.random()
        if op < 0.25 and "minimum" in sub:
            sub["minimum"] -= rng.randrange(1, 5)
        elif op < 0.4 and "maximum" in sub:
            sub["maximum"] += rng.randrange(1, 5)
        elif op < 0.55 and "enum" in sub:
            sub["enum"] = sub["enum"] + ["zzz"]
        elif op < 0.7 and sub.get("required"):
            del sub["required"]
        elif op < 0.85 and "maxLength" in sub:
            del sub["maxLength"]
        elif sub.get("type") == "integer":
            sub["type"] = "number"
            sub.pop("multipleOf", None)
    return new


def _mutate(rng, schema):
    """Arbitrary (possibly narrowing) mutation."""
    import copy

    new = copy.deepcopy(schema)
    name = rng.choice(list(new["properties"]))
    sub = new["properties"][name]
    op = rng.random()
    if op < 0.25:
        sub["minimum"] = sub.get("minimum", 0) + rng.randrange(0, 6)
    elif op < 0.45:
        sub["required"] = True
    elif op < 0.65 and "enum" in sub:
        sub["enum"] = sub["enum"][:-1] or ["a"]
    elif op < 0.8:
        sub["maxLength"] = rng.randrange(0, 6)
        sub["type"] = "string"
    else:
        new["additionalProperties"] = False
    return new


def _instances(rng, n=40):
    out = []
    for _ in range(n):
        inst = {}
        for name in "abcde":
            r = rng.random()
            if r < 0.2:
                continue  # key absent
            inst[name] = rng.choice(
                [0, 1, -3, 7, 25, 2.5, 10.0, "a", "bb", "ccc", "dddd", "zzz",
                 "longer-string", None, True, [1, 2], {"k": 1}]
            )
        out.append(inst)
    return out


def test_soundness_compatible_widenings_never_regress():
    # analyzer-approved widenings: NO instance may flip valid -> invalid
    rng = random.Random(42)
    checked = 0
    for _ in range(120):
        old = _random_base(rng)
        new = _widen(rng, old)
        if not is_backward_compatible(old, new):
            # a "widening" op that the analyzer cannot order statically is
            # allowed to be flagged; soundness only constrains True verdicts
            continue
        v_old, v_new = new_validator(old), new_validator(new)
        for inst in _instances(rng, 60):
            if v_old(inst)["valid"]:
                assert v_new(inst)["valid"], (old, new, inst)
                checked += 1
    assert checked > 100  # the fuzz actually exercised the contract


def test_narrowing_mutations_are_flagged():
    # every mutation in _mutate strictly tightens some accept-set; the
    # analyzer must never call the result backward-compatible when a real
    # regression exists among sampled instances
    rng = random.Random(7)
    for _ in range(30):
        old = _random_base(rng)
        new = _mutate(rng, old)
        v_old, v_new = new_validator(old), new_validator(new)
        regressed = any(
            v_old(i)["valid"] and not v_new(i)["valid"] for i in _instances(rng)
        )
        if regressed:
            assert not is_backward_compatible(old, new), (old, new)


def test_exclusivity_flip_same_bound():
    old = {"type": "number", "minimum": 5}
    new = {"type": "number", "minimum": 5, "exclusiveMinimum": True}
    assert _kinds(old, new)[("", "exclusiveMinimum")] == "narrowing"
    assert _kinds(new, old)[("", "exclusiveMinimum")] == "widening"
    # exclusivity flip IS respected by the validators: 5 regresses
    v_old, v_new = new_validator(old), new_validator(new)
    assert v_old(5)["valid"] and not v_new(5)["valid"]


def test_bound_added_and_removed():
    assert _kinds({}, {"maximum": 3})[("", "maximum")] == "narrowing"
    assert _kinds({"maximum": 3}, {})[("", "maximum")] == "widening"
    assert _kinds({}, {"minLength": 1})[("", "minLength")] == "narrowing"
    assert _kinds({"uniqueItems": True}, {})[("", "uniqueItems")] == "widening"


def test_property_removed_under_closed_vs_open_object():
    old = {"type": "object", "properties": {"a": {"type": "string"}}}
    new_open = {"type": "object", "properties": {}}
    new_closed = {
        "type": "object",
        "properties": {},
        "additionalProperties": False,
    }
    assert _kinds(old, new_open)[("/a", "properties")] == "widening"
    # under a closed object the key becomes forbidden -> narrowing
    assert _kinds(old, new_closed)[("/a", "properties")] == "narrowing"


def test_nested_items_recursion():
    old = {"type": "array", "items": {"type": "integer", "minimum": 0}}
    new = {"type": "array", "items": {"type": "integer", "minimum": 5}}
    assert _kinds(old, new)[("/items", "minimum")] == "narrowing"
    # tuple form: equal lists -> no delta; changed -> incomparable
    t = {"items": [{"type": "string"}]}
    assert schema_delta(t, t) == []
    t2 = {"items": [{"type": "integer"}]}
    assert _kinds(t, t2)[("/items", "items")] == "incomparable"


def test_schema_valued_additional_properties_is_not_invisible():
    """ADVICE r4 (high): schema-form additionalProperties participates in
    the ordering — the validators enforce it, so the analyzer must see it.

    Witness instance {"x": "hello"}: valid under old, invalid under new —
    is_backward_compatible must NOT return True."""
    old = {"type": "object", "additionalProperties": {"type": "string"}}
    new = {"type": "object", "additionalProperties": {"type": "integer"}}
    assert _kinds(old, new)[("", "additionalProperties")] == "incomparable"
    assert not is_backward_compatible(old, new)
    # differential witness against the parity walker
    assert new_validator(old)({"x": "hello"})["valid"]
    assert not new_validator(new)({"x": "hello"})["valid"]

    # True/absent -> schema: constrains previously-free keys -> narrowing
    assert (
        _kinds({"type": "object"}, new)[("", "additionalProperties")]
        == "narrowing"
    )
    # schema -> True/absent: drops the constraint -> widening, compatible
    assert (
        _kinds(old, {"type": "object"})[("", "additionalProperties")]
        == "widening"
    )
    assert is_backward_compatible(old, {"type": "object"})
    # False -> schema: old forbade extras entirely, so every old-valid
    # instance (no extras) trivially satisfies the subschema -> widening
    closed = {"type": "object", "additionalProperties": False}
    assert _kinds(closed, new)[("", "additionalProperties")] == "widening"
    assert is_backward_compatible(closed, new)
    # schema -> False -> narrowing
    assert _kinds(new, closed)[("", "additionalProperties")] == "narrowing"
    # equal subschemas -> no delta at all
    assert schema_delta(old, {"type": "object", "additionalProperties": {"type": "string"}}) == []


def test_property_removed_under_schema_valued_additional_properties():
    """ADVICE r4 (high): a property removed from `properties` whose values
    fall through to a schema-valued additionalProperties can regress —
    must be flagged incomparable, not widening.

    Witness: {"a": "x"} valid under old, invalid under new."""
    old = {
        "type": "object",
        "properties": {"a": {"type": "string"}},
        "additionalProperties": {"type": "integer"},
    }
    new = {"type": "object", "additionalProperties": {"type": "integer"}}
    assert _kinds(old, new)[("/a", "properties")] == "incomparable"
    assert not is_backward_compatible(old, new)
    assert new_validator(old)({"a": "x"})["valid"]
    assert not new_validator(new)({"a": "x"})["valid"]
