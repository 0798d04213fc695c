"""Arrow-batch walker backend: reference-exact validation for *dynamic*
JSON payloads (union types, heterogeneous arrays, true missing-vs-null,
recursive $ref, custom ``conform`` callables) that the static Column
compiler cannot express.

The schema is compiled ONCE per executor python worker (the walker is the
same closure-specializing compiler the driver uses for fixture parity —
the reference's `new Function` JIT analog, /root/reference/src/compiler.js:294-311);
``mapInPandas`` then streams Arrow record batches through it.  The batch
boundary, worker reuse, and Arrow transfer are the scale story; the
per-value walk is the price of full dynamic semantics and is the
documented fallback path (SURVEY.md §3.4) — typed tables take the
native-Column backend instead.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import DataFrame

ERRORS_DDL = (
    "errors array<struct<code:string,message:string,value:string,"
    "arg:string,path:string>>, valid boolean"
)


def _pointer(path) -> str:
    if not path:
        return ""
    return "/" + "/".join(str(p).replace("~", "~0").replace("/", "~1") for p in path)


def _stringify(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"))
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


class BatchValidator:
    """validate a JSON-string column with reference-exact walker semantics.

    >>> BatchValidator(schema).apply_json(df, "doc_json", keep=["doc_id"])
    DataFrame[doc_id, errors, valid]
    """

    def __init__(
        self,
        schema: dict,
        options: dict | None = None,
        on_parse_error: str = "record",
    ):
        """``on_parse_error``: malformed JSON text yields ``"record"`` — an
        invalid row with a single ``jsonParse`` error (path "", value = the
        offending text) — or ``"raise"`` to fail the task.  Parsing is our
        extension: the reference takes already-parsed values, so it has no
        counterpart to mirror here."""
        if on_parse_error not in ("record", "raise"):
            raise ValueError(f"on_parse_error must be record|raise, got {on_parse_error!r}")
        self.schema = schema
        self.options = options
        self.on_parse_error = on_parse_error

    def apply_json(
        self, df: DataFrame, json_col: str, keep: list[str] | None = None
    ) -> DataFrame:
        keep = keep or []
        schema, options = self.schema, self.options
        on_parse_error = self.on_parse_error
        out_ddl = ", ".join(
            [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep] + [ERRORS_DDL]
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            # compile once per worker: every batch reuses the specialized walker
            from schemasaurus_spark.schema.walker import new_validator

            validate = new_validator(schema, options)

            for pdf in batches:
                errors_out = []
                valid_out = []
                for s in pdf[json_col]:
                    try:
                        val = json.loads(s) if s is not None else None
                    except ValueError as exc:
                        if on_parse_error == "raise":
                            raise
                        errors_out.append(
                            [
                                {
                                    "code": "jsonParse",
                                    "message": str(exc),
                                    "value": s,
                                    "arg": None,
                                    "path": "",
                                }
                            ]
                        )
                        valid_out.append(False)
                        continue
                    res = validate(val)
                    errors_out.append(
                        [
                            {
                                "code": e["code"],
                                "message": e["message"],
                                "value": _stringify(e["value"]),
                                "arg": _stringify(e.get("arg")),
                                "path": _pointer(e["path"]),
                            }
                            for e in res["errors"]
                        ]
                    )
                    valid_out.append(res["valid"])
                out = pd.DataFrame({c: pdf[c] for c in keep})
                out["errors"] = errors_out
                out["valid"] = valid_out
                yield out

        return df.mapInPandas(run, out_ddl)


def validate_json_column(
    df: DataFrame, schema: dict, json_col: str,
    keep: list[str] | None = None, options: dict | None = None,
) -> DataFrame:
    return BatchValidator(schema, options).apply_json(df, json_col, keep)


class BatchNormalizer:
    """Normalize a JSON-string column with reference-exact walker
    semantics (defaults, additionalProperty removal, type coercions) —
    the ELT companion to :class:`BatchValidator`.

    >>> BatchNormalizer(schema).apply_json(df, "doc_json", keep=["doc_id"])
    DataFrame[doc_id, normalized]

    ``normalized`` is the normalized value re-serialized as compact JSON.
    Serialization is deterministic: python dicts preserve insertion order
    exactly as the reference's JS objects do, so round-tripping keeps the
    reference's key order (including keys appended by ``[default]``).
    Malformed input rows yield NULL ``normalized`` (or raise, matching
    ``on_parse_error``)."""

    def __init__(
        self,
        schema: dict,
        options: dict | None = None,
        on_parse_error: str = "record",
    ):
        if on_parse_error not in ("record", "raise"):
            raise ValueError(f"on_parse_error must be record|raise, got {on_parse_error!r}")
        self.schema = schema
        self.options = options
        self.on_parse_error = on_parse_error

    def apply_json(
        self, df: DataFrame, json_col: str, keep: list[str] | None = None
    ) -> DataFrame:
        keep = keep or []
        schema, options = self.schema, self.options
        on_parse_error = self.on_parse_error
        out_ddl = ", ".join(
            [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
            + ["normalized string"]
        )

        def run(batches: Iterator) -> Iterator:
            import pandas as pd

            from schemasaurus_spark.schema.walker import new_normalizer

            normalize = new_normalizer(schema, options)

            for pdf in batches:
                out_vals = []
                for s in pdf[json_col]:
                    if s is None:
                        out_vals.append(None)
                        continue
                    try:
                        val = json.loads(s)
                    except ValueError:
                        if on_parse_error == "raise":
                            raise
                        out_vals.append(None)
                        continue
                    out_vals.append(
                        json.dumps(normalize(val), separators=(",", ":"))
                    )
                out = pd.DataFrame({c: pdf[c] for c in keep})
                out["normalized"] = out_vals
                yield out

        return df.mapInPandas(run, out_ddl)


def normalize_json_column(
    df: DataFrame, schema: dict, json_col: str,
    keep: list[str] | None = None, options: dict | None = None,
) -> DataFrame:
    return BatchNormalizer(schema, options).apply_json(df, json_col, keep)
