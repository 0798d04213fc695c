"""Built-in string formats — regexes ported from
/root/reference/src/v4validator.js:8-33 (``fillDefaultFormats``).

JS ``String#match`` does an *unanchored search*; Python ``re.search`` and
Spark's Java regex (used unanchored via our columnar backend) match that.
These particular patterns are all self-anchored with ``^..$`` anyway.
"""

from __future__ import annotations

import re

_IPV6 = (
    r"^\s*((([0-9A-Fa-f]{1,4}:){7}([0-9A-Fa-f]{1,4}|:))"
    r"|(([0-9A-Fa-f]{1,4}:){6}(:[0-9A-Fa-f]{1,4}|((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))"
    r"|(([0-9A-Fa-f]{1,4}:){5}(((:[0-9A-Fa-f]{1,4}){1,2})|:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))"
    r"|(([0-9A-Fa-f]{1,4}:){4}(((:[0-9A-Fa-f]{1,4}){1,3})|((:[0-9A-Fa-f]{1,4})?:"
    r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
    r"|(([0-9A-Fa-f]{1,4}:){3}(((:[0-9A-Fa-f]{1,4}){1,4})|((:[0-9A-Fa-f]{1,4}){0,2}:"
    r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
    r"|(([0-9A-Fa-f]{1,4}:){2}(((:[0-9A-Fa-f]{1,4}){1,5})|((:[0-9A-Fa-f]{1,4}){0,3}:"
    r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
    r"|(([0-9A-Fa-f]{1,4}:){1}(((:[0-9A-Fa-f]{1,4}){1,6})|((:[0-9A-Fa-f]{1,4}){0,4}:"
    r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
    r"|(:(((:[0-9A-Fa-f]{1,4}){1,7})|((:[0-9A-Fa-f]{1,4}){0,5}:((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    r"(\.(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:)))(%.+)?\s*$"
)

DEFAULT_FORMATS: dict[str, dict[str, str]] = {
    "email": {"regexp": r"^[^@]+@[^@]+$", "message": "shall be valid email"},
    "date-time": {
        "regexp": (
            r"^\d{4}-(?:0[0-9]{1}|1[0-2]{1})-[0-9]{2}[tT ]"
            r"\d{2}:\d{2}:\d{2}(\.\d+)?([zZ]|[+-]\d{2}:\d{2})$"
        ),
        "message": "shall be valid date",
    },
    "ipv4": {
        "regexp": (
            r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
        ),
        "message": "shall be valid ipv4 address",
    },
    "ipv6": {"regexp": _IPV6, "message": "shall be valid ipv6 address"},
    "uri": {"regexp": r"^[a-zA-Z][a-zA-Z0-9+-.]*:[^\s]*$", "message": "shall be valid URI"},
    "hostname": {
        "regexp": (
            r"^([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])"
            r"(\.([a-zA-Z0-9]|[a-zA-Z0-9][a-zA-Z0-9\-]{0,61}[a-zA-Z0-9]))*$"
        ),
        "message": "shall be valid host name",
    },
}


def fill_default_formats(formats: dict) -> dict:
    """Merge user formats over the defaults (user wins), compiling regexes.

    A user format is ``{"regexp": str | compiled, "message": str}`` like the
    reference's options.formats (v4validator.js:44-45, README.md:128-152).
    """
    out = {}
    for name, fmt in {**DEFAULT_FORMATS, **(formats or {})}.items():
        rx = fmt["regexp"]
        out[name] = {
            "regexp": rx if hasattr(rx, "search") else re.compile(rx),
            "pattern": rx if isinstance(rx, str) else rx.pattern,
            "message": fmt.get("message", "shall match format " + name),
        }
    return out
