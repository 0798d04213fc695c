"""Default validator messages — ported from /root/reference/src/messages.js:4-36."""

from __future__ import annotations

from collections.abc import Callable


def messages(gettext: Callable[[str], str]) -> dict[str, str]:
    g = gettext
    return {
        "string": g("shall be a string"),
        "null": g("shall be null"),
        "minLength": g("shall have length at least %d"),
        "maxLength": g("shall have length no more than %d"),
        "pattern": g("shall match pattern %s"),
        "integer": g("shall be an integer"),
        "multipleOf": g("shall be multiple of %d"),
        "number": g("shall be a number"),
        "minimum": g("shall be >= %d"),
        "minimum.exclusive": g("shall be > %d"),
        "maximum": g("shall be <= %d"),
        "maximum.exclusive": g("shall be < %d"),
        "boolean": g("shall be boolean"),
        "object": g("shall be object"),
        "additionalProperties": g("shall not have additional properties"),
        "minProperties": g("shall have at least %d properties"),
        "maxProperties": g("shall have no more than %d properties"),
        "array": g("shall be array"),
        "additionalItems": g("shall not have additional items"),
        "minItems": g("shall have at least %d items"),
        "maxItems": g("shall have no more %d items"),
        "uniqueItems": g("shall have unique items"),
        "enum": g("shall be one of values %s"),
        "required": g("is required"),
        "dependency": g("does not meet additional requirements for %s"),
        "not": g("does not meet 'not' requirement"),
        "oneOf": g("does not meet exactly one requirement"),
        "oneOf.zero": g("does not meet any requirement"),
        "allOf": g("does not meet all requirements"),
        "anyOf": g("does not meet any requirement"),
        "custom": g("is not valid"),
    }
