"""Normalizer golden in/out pairs ported from
/root/reference/test/normalizer_spec.js (N1-N4 in FIXTURES.md §6)."""

from schemasaurus_spark import new_normalizer


def test_defaults_applied():  # normalizer_spec.js:7-23
    n = new_normalizer(
        {
            "properties": {
                "intProp": {"default": 10},
                "strProp": {"default": "test"},
                "arrProp": {"type": "array", "items": {"default": {"obj": True}}},
            }
        }
    )
    assert n({}) == {"intProp": 10, "strProp": "test"}


def test_defaults_respect_existing():  # normalizer_spec.js:24-31
    n = new_normalizer(
        {
            "properties": {
                "intProp": {"default": 10},
                "strProp": {"default": "test"},
                "arrProp": {"type": "array", "items": {"default": {"obj": True}}},
            }
        }
    )
    assert n({"intProp": 5, "strProp": "str", "arrProp": [None, "test"]}) == {
        "intProp": 5,
        "strProp": "str",
        "arrProp": [{"obj": True}, "test"],
    }


def test_removes_additional_properties():  # normalizer_spec.js:33-42
    n = new_normalizer({"properties": {"oneProp": {"type": "integer"}}})
    assert n({"oneProp": 10}) == {"oneProp": 10}
    assert n({"oneProp": 10, "secondProp": 5}) == {"oneProp": 10}


def test_type_coercions():  # normalizer_spec.js:43-65
    n = new_normalizer(
        {
            "properties": {
                "i": {"type": "integer"},
                "n": {"type": "number"},
                "s": {"type": "string"},
                "b": {"type": "boolean"},
                "a": {"type": "array"},
                "u": {"type": "null"},
                "o": {"type": "object"},
            }
        }
    )
    # reference fixture feeds an object with a custom toString for `s`; the
    # JS-ToString equivalent here is a plain number 1 -> "1"
    out = n(
        {"i": "10", "n": ["22.2"], "s": 1, "b": "false", "a": 77, "u": 33, "o": -5}
    )
    assert out == {
        "i": 10,
        "n": 22.2,
        "s": "1",
        "b": False,
        "a": [77],
        "u": None,
        "o": -5,
    }


def test_boolean_word_map():
    n = new_normalizer({"properties": {"b": {"type": "boolean"}}})
    assert n({"b": "true"}) == {"b": True}
    assert n({"b": "on"}) == {"b": True}
    assert n({"b": "off"}) == {"b": False}
    assert n({"b": 1}) == {"b": True}
    assert n({"b": 0}) == {"b": False}


def test_defaults_not_coerced():
    # reference semantics: the local value binding is not refreshed after
    # ctx.replace, so a default is NOT subsequently type-coerced
    n = new_normalizer({"properties": {"i": {"type": "integer", "default": "7"}}})
    assert n({}) == {"i": "7"}
