"""JavaScript-value semantics helpers.

The reference validator (/root/reference/src/v4validator.js) runs on JS
values: one number type, ``typeof`` dispatch, ToNumber/ToString coercions in
comparisons, UTF-16 string lengths, and ``JSON.stringify`` structural
equality.  These helpers replicate exactly the slices of those semantics the
validator/normalizer exercise, so the Python walker produces byte-identical
verdicts and error records.
"""

from __future__ import annotations

import math
from typing import Any


class _Undefined:
    """Singleton for JS ``undefined`` (a *missing* value, distinct from null)."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):  # pragma: no cover
        return "undefined"

    def __bool__(self):
        return False


UNDEFINED = _Undefined()


def js_typeof(v: Any) -> str:
    """``typeof v`` — note ``typeof null === 'object'`` and one number type."""
    if v is UNDEFINED:
        return "undefined"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (int, float)):
        return "number"
    return "object"  # dict, list, None


def is_js_object(v: Any) -> bool:
    """Reference ``isObject`` (v4validator.js:4-6): object, not array, not null."""
    return isinstance(v, dict)


def js_number_to_string(n: Any) -> str:
    """JS Number#toString: integral floats print without a fraction (1.0 -> "1")."""
    if isinstance(n, bool):
        return "true" if n else "false"
    if isinstance(n, float):
        if math.isnan(n):
            return "NaN"
        if math.isinf(n):
            return "Infinity" if n > 0 else "-Infinity"
        if n.is_integer() and abs(n) < 1e21:
            return str(int(n))
        return repr(n)
    return str(n)


def js_to_string(v: Any) -> str:
    """JS ToString (the slice the normalizer's string coercion needs)."""
    if v is UNDEFINED:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, (int, float)):
        return js_number_to_string(v)
    if isinstance(v, list):
        return ",".join(
            "" if e is None or e is UNDEFINED else js_to_string(e) for e in v
        )
    return "[object Object]"


def js_to_number(v: Any) -> float:
    """JS ToNumber; NaN for unconvertible values."""
    nan = float("nan")
    if v is UNDEFINED:
        return nan
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0.0
        try:
            if s.lower().startswith("0x"):
                return float(int(s, 16))
            return float(s)
        except ValueError:
            return nan
    if isinstance(v, list):  # ToPrimitive(array) -> join(',') -> ToNumber
        return js_to_number(js_to_string(v))
    return nan


def js_lt(a: Any, b: Any) -> bool:
    """JS abstract relational ``a < b`` (both-strings → lexicographic;
    otherwise ToNumber with NaN → false)."""
    if isinstance(a, str) and isinstance(b, str):
        return a < b
    na, nb = js_to_number(a), js_to_number(b)
    if math.isnan(na) or math.isnan(nb):
        return False
    return na < nb


def js_gt(a: Any, b: Any) -> bool:
    return js_lt(b, a)


def js_le(a: Any, b: Any) -> bool:
    """``a <= b`` is ``!(b < a)`` unless NaN (then false)."""
    if isinstance(a, str) and isinstance(b, str):
        return a <= b
    na, nb = js_to_number(a), js_to_number(b)
    if math.isnan(na) or math.isnan(nb):
        return False
    return na <= nb


def js_ge(a: Any, b: Any) -> bool:
    return js_le(b, a)


def js_string_length(s: str) -> int:
    """JS String#length counts UTF-16 code units (astral chars count 2)."""
    return len(s.encode("utf-16-le")) // 2


def js_stringify(v: Any) -> str:
    """``JSON.stringify`` — compact, insertion key order, JS number format.

    Used by ``toComparable`` (v4validator.js:54-56) so enum / uniqueItems
    equality is structural and **key-order-sensitive**, like the reference.
    """
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_number_to_string(v)
    if isinstance(v, str):
        import json

        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(
            "null" if e is UNDEFINED else js_stringify(e) for e in v
        ) + "]"
    if isinstance(v, dict):
        parts = []
        for k, val in v.items():
            if val is UNDEFINED:
                continue
            parts.append(js_stringify(str(k)) + ":" + js_stringify(val))
        return "{" + ",".join(parts) + "}"
    return "null"


def js_property_key(v: Any) -> str:
    """JS object property lookup coerces keys to string — ``{1:..}["1"]`` hits.

    Replicates the enum hash-set keying quirk: ``toComparable`` output is used
    as a JS property name (v4validator.js:228-231)."""
    if isinstance(v, str):
        return v
    return js_to_string(v)


def to_comparable(v: Any) -> Any:
    """Reference ``toComparable``: objects/arrays/null → JSON.stringify, else value."""
    if js_typeof(v) == "object":
        return js_stringify(v)
    return v


def js_parse_int(v: Any) -> Any:
    """JS ``parseInt`` (radix 10 path) as used by the normalizer."""
    s = js_to_string(v).strip()
    sign = 1
    i = 0
    if s[:1] in ("+", "-"):  # NB not `in "+-"`: '' is a substring of any str
        sign = -1 if s[0] == "-" else 1
        i = 1
    digits = ""
    while i < len(s) and s[i].isdigit():
        digits += s[i]
        i += 1
    if not digits:
        return float("nan")
    return sign * int(digits)


def js_parse_float(v: Any) -> Any:
    """JS ``parseFloat``: longest leading float prefix, NaN otherwise."""
    import re

    s = js_to_string(v).strip()
    m = re.match(r"[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", s)
    if not m:
        return float("nan")
    f = float(m.group(0))
    return int(f) if f.is_integer() and "e" not in m.group(0).lower() and "." not in m.group(0) else f


def js_truthy(v: Any) -> bool:
    if v is UNDEFINED or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0
    return True  # objects/arrays always truthy in JS
