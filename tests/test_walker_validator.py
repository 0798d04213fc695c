"""Keyword/path/value/message fixtures ported from
/root/reference/test/validator_spec.js (the reference's layer-1 golden specs).

Path components: the reference emits property names as strings and array
indices as numbers; its assertions use expect.js ``eql`` (loose equality), so
we normalize both sides to strings before comparing.
"""

import pytest

from schemasaurus_spark import new_validator

OK = {"valid": True, "errors": []}


def check(schema, value, expected, options=None, what="code"):
    v = new_validator(schema, options)
    res = v(value)
    got = [e[what] for e in res["errors"]]
    if what == "path":
        got = [[str(c) for c in p] for p in got]
        expected_errors = [[str(c) for c in p] for p in expected.get("errors", [])]
    else:
        expected_errors = expected.get("errors", [])
    assert {"valid": res["valid"], "errors": got} == {
        "valid": expected["valid"],
        "errors": expected_errors,
    }, f"value={value!r}"


def fail_with(*errs):
    return {"valid": False, "errors": list(errs)}


class TestBooleanType:  # validator_spec.js:53-66
    def test_pass_boolean(self):
        check({"type": "boolean"}, True, OK)
        check({"type": "boolean"}, False, OK)

    def test_reject_non_boolean(self):
        check({"type": "boolean"}, 1, fail_with("boolean"))
        check({"type": "boolean"}, "hello", fail_with("boolean"))
        check({"type": "boolean"}, {}, fail_with("boolean"))


class TestNumericTypes:  # validator_spec.js:68-113
    def test_integer(self):
        check({"type": "integer"}, 1, OK)
        check({"type": "integer"}, 1.1, fail_with("integer"))
        # JS has one number type: 1.0 IS an integer (v4validator.js:97-101)
        check({"type": "integer"}, 1.0, OK)

    def test_number(self):
        check({"type": "number"}, 1, OK)
        check({"type": "number"}, 1.1, OK)

    def test_reject_non_numeric(self):
        check({"type": "integer"}, "string", fail_with("integer"))
        check({"type": "integer"}, True, fail_with("integer"))
        check({"type": "integer"}, "1", fail_with("integer"))

    def test_multiple_of(self):
        s = {"type": "integer", "multipleOf": 11}
        check(s, 11, OK)
        check(s, 0, OK)
        check(s, 22, OK)
        check(s, 12, fail_with("multipleOf"))
        check(s, 10, fail_with("multipleOf"))
        check(s, 1, fail_with("multipleOf"))

    def test_minimum(self):
        s = {"type": "number", "minimum": 3}
        check(s, 3, OK)
        check(s, 2, fail_with("minimum"))
        check(s, 4, OK)

    def test_maximum(self):
        s = {"type": "number", "maximum": 3}
        check(s, 3, OK)
        check(s, 4, fail_with("maximum"))
        check(s, 2, OK)

    def test_range(self):
        s = {"type": "number", "minimum": 1, "maximum": 2}
        check(s, 0, fail_with("minimum"))
        check(s, 1, OK)
        check(s, 2, OK)
        check(s, 3, fail_with("maximum"))

    def test_exclusive_bounds(self):
        s = {"minimum": 1, "exclusiveMinimum": True}
        check(s, 1, fail_with("minimum.exclusive"))
        check(s, 1.01, OK)
        s = {"maximum": 1, "exclusiveMaximum": True}
        check(s, 1, fail_with("maximum.exclusive"))
        check(s, 0.99, OK)


class TestStrings:  # validator_spec.js:114-171
    def test_pass_strings(self):
        check({"type": "string"}, "str", OK)
        check({"type": "string"}, "", OK)

    def test_reject_non_strings(self):
        check({"type": "string"}, 10, fail_with("string"))
        check({"type": "string"}, True, fail_with("string"))
        check({"type": "string"}, {}, fail_with("string"))

    def test_min_length(self):
        s = {"type": "string", "minLength": 3}
        check(s, "123", OK)
        check(s, "1234", OK)
        check(s, "12", fail_with("minLength"))

    def test_max_length(self):
        s = {"maxLength": 3}
        check(s, "123", OK)
        check(s, "12", OK)
        check(s, "1234", fail_with("maxLength"))

    def test_pattern(self):
        s = {"type": "string", "pattern": "^[ab][12]$"}
        check(s, "a1", OK)
        check(s, "b2", OK)
        check(s, "c1", fail_with("pattern"))
        check(s, "a3", fail_with("pattern"))

    def test_email_format(self):
        s = {"type": "string", "format": "email"}
        check(s, "a@b.com", OK)
        check(s, "ab.com", fail_with("format.email"))

    def test_custom_format(self):
        s = {"type": "string", "format": "pet"}
        opts = {
            "formats": {
                "pet": {"regexp": r"(dog|cat|rat)", "message": "shall be pet"}
            }
        }
        check(s, "cat", OK, opts)
        check(s, "dog", OK, opts)
        check(s, "rat", OK, opts)
        check(s, "crow", fail_with("format.pet"), opts)

    def test_unknown_format_throws(self):
        with pytest.raises(ValueError):
            new_validator({"type": "string", "format": "unknown"})


class TestErrorInformation:  # validator_spec.js:174-256
    def test_root_values(self):
        s = {"type": "boolean"}
        check(s, 10, fail_with([]), what="path")
        check(s, 10, fail_with(10), what="value")

    def test_nested_objects(self):
        s = {
            "type": "object",
            "properties": {
                "a": {
                    "type": "object",
                    "properties": {
                        "b": {
                            "type": "object",
                            "properties": {"c": {"type": "number"}},
                        }
                    },
                }
            },
        }
        check(s, {"a": {"b": {"c": "fail"}}}, fail_with(["a", "b", "c"]), what="path")
        check(s, {"a": {"b": {"c": "fail"}}}, fail_with("fail"), what="value")

    def test_nested_arrays(self):
        s = {"type": "array", "items": {"type": "array", "items": {"type": "number"}}}
        check(s, [[1, 2], [3, "4"]], fail_with(["1", "1"]), what="path")
        check(s, [[1, 2], [3, "4"]], fail_with("4"), what="value")

    def test_additional_items(self):
        s = {"type": "array", "items": [{"type": "number"}], "additionalItems": False}
        check(s, [1, 2, 3], fail_with(["1"], ["2"]), what="path")
        check(s, [1, 2, 3], fail_with(2, 3), what="value")

    def test_additional_properties(self):
        s = {
            "type": "object",
            "properties": {"a": {"type": "number"}},
            "additionalProperties": False,
        }
        check(s, {"a": 10, "b": 20}, fail_with(["b"]), what="path")
        check(s, {"a": 10, "b": 20}, fail_with(20), what="value")

    def test_nested_schemas(self):
        s = {
            "type": "object",
            "properties": {
                "a": {
                    "oneOf": [
                        {"type": "object", "properties": {"b": {"type": "string"}}}
                    ]
                }
            },
        }
        check(s, {"a": {"b": 5}}, fail_with(["a"], ["a", "b"]), what="path")

    def test_nested_schemas_in_arrays(self):
        s = {
            "type": "object",
            "properties": {
                "a": {
                    "type": "array",
                    "items": {"oneOf": [{"properties": {"b": {"type": "string"}}}]},
                }
            },
        }
        check(
            s,
            {"a": [{"b": "valid"}, {"b": False}]},
            fail_with(["a", 1, ], ["a", 1, "b"]),
            what="path",
        )


class TestCustomValidatorsAndMessages:  # validator_spec.js:258-311
    def test_custom_conform_fn(self):
        s = {"type": "number", "conform": lambda v, ctx: v > 5}
        check(s, 6, OK)
        check(s, 5, fail_with("custom"))

    def test_custom_conform_named(self):
        s = {"type": "number", "conform": {"larger": [5]}}
        opts = {"custom": {"larger": lambda value, arg, ctx: value > arg}}
        check(s, 6, OK, opts)
        check(s, 5, fail_with("custom.larger"), opts)

    def test_user_messages(self):
        s = {
            "type": "number",
            "minimum": 3,
            "maximum": 10,
            "messages": {"minimum": ":(", "maximum": ":O", "number": ":/"},
        }
        check(s, 2, fail_with(":("), what="message")
        check(s, 11, fail_with(":O"), what="message")
        check(s, "5", fail_with(":/"), what="message")
        check(s, 4, OK, what="message")

    def test_messages_through_gettext(self):
        s = {
            "type": "number",
            "conform": lambda o, ctx: o == -1,
            "messages": {"custom": "hello"},
        }
        opts = {"gettext": lambda m: "~" + str(m)}
        check(s, 1, fail_with("~hello"), opts, what="message")


class TestCombinators:
    def test_all_of(self):
        s = {"allOf": [{"type": "number"}, {"minimum": 3}]}
        check(s, 4, OK)
        check(s, 2, fail_with("allOf", "minimum"))
        check(s, "x", fail_with("allOf", "number"))

    def test_any_of(self):
        s = {"anyOf": [{"type": "number"}, {"type": "string"}]}
        check(s, 4, OK)
        check(s, "x", OK)
        check(s, True, fail_with("anyOf", "number", "string"))

    def test_one_of_counts(self):
        s = {"oneOf": [{"type": "integer"}, {"minimum": 2}]}
        check(s, 1, OK)          # integer only
        check(s, 2.5, OK)        # minimum only
        check(s, 3, fail_with("oneOf"))          # both match
        check(s, 1.5, fail_with("oneOf.zero", "integer", "minimum"))

    def test_not(self):
        s = {"not": {"type": "integer"}}
        check(s, "x", OK)
        check(s, 3, fail_with("not"))

    def test_union_types(self):
        s = {"type": ["integer", "string"]}
        check(s, 1, OK)
        check(s, "x", OK)
        check(s, 1.5, fail_with("integer", "string"))

    def test_dependencies_property_form(self):
        s = {"dependencies": {"a": ["b"]}}
        check(s, {"a": 1, "b": 2}, OK)
        check(s, {"c": 1}, OK)
        check(s, {"a": 1}, fail_with("dependency", "required"))

    def test_dependencies_schema_form(self):
        s = {"dependencies": {"a": {"properties": {"b": {"type": "integer"}}}}}
        check(s, {"a": 1, "b": 2}, OK)
        check(s, {"a": 1, "b": "x"}, fail_with("dependency", "integer"))


class TestObjectAndArrayKeywords:
    def test_required_v4(self):
        s = {"required": ["a", "b"]}
        check(s, {"a": 1, "b": 2}, OK)
        check(s, {"a": 1}, fail_with("required"))
        check(s, {}, fail_with("required", "required"))

    def test_required_v3_merged(self):
        s = {"properties": {"a": {"type": "integer", "required": True}}}
        check(s, {"a": 1}, OK)
        # required fires at the parent; the child's own [^required] skip does
        # not apply (schema HAS `required`), so its type check also fires on
        # the missing value — exact reference behavior (v4validator.js:81-86)
        check(s, {}, fail_with("required", "integer"))

    def test_min_max_items(self):
        check({"minItems": 2}, [1], fail_with("minItems"))
        check({"minItems": 2}, [1, 2], OK)
        check({"maxItems": 1}, [1, 2], fail_with("maxItems"))

    def test_unique_items_per_occurrence(self):
        s = {"uniqueItems": True}
        check(s, [1, 2, 3], OK)
        # one error per duplicate occurrence (v4validator.js:277-290)
        check(s, [1, 2, 1, 1], fail_with("uniqueItems", "uniqueItems"))
        # structural equality via JSON.stringify (key-order-sensitive)
        check(s, [{"a": 1}, {"a": 1}], fail_with("uniqueItems"))

    def test_min_max_properties(self):
        check({"maxProperties": 1}, {"a": 1, "b": 2}, fail_with("maxProperties"))
        check({"minProperties": 2}, {"a": 1}, fail_with("minProperties"))
        check({"minProperties": 1}, {"a": 1}, OK)

    def test_pattern_properties(self):
        s = {
            "patternProperties": {"^s_": {"type": "string"}},
            "additionalProperties": False,
        }
        check(s, {"s_a": "ok"}, OK)
        check(s, {"s_a": 1}, fail_with("string"))
        check(s, {"other": 1}, fail_with("additionalProperties"))

    def test_optional_missing_is_valid(self):
        # [^required] skip: missing != invalid unless required
        s = {"properties": {"a": {"type": "integer"}}}
        check(s, {}, OK)
        check(s, {"a": "x"}, fail_with("integer"))


class TestRefsAndRecursion:
    def test_local_ref(self):
        s = {
            "definitions": {"pos": {"type": "integer", "minimum": 0}},
            "properties": {"n": {"$ref": "#/definitions/pos"}},
        }
        check(s, {"n": 3}, OK)
        check(s, {"n": -1}, fail_with("minimum"))

    def test_root_recursion(self):
        s = {"properties": {"foo": {"$ref": "#"}}, "additionalProperties": False}
        check(s, {"foo": {"foo": {}}}, OK)
        check(s, {"bar": 1}, fail_with("additionalProperties"))
        check(s, {"foo": {"bar": 1}}, fail_with("additionalProperties"))

    def test_detilde(self):
        s = {
            "definitions": {"a/b": {"type": "integer"}},
            "properties": {"x": {"$ref": "#/definitions/a~1b"}},
        }
        check(s, {"x": "no"}, fail_with("integer"))
