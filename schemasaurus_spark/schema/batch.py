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

    def __init__(self, schema: dict, options: dict | None = None):
        self.schema = schema
        self.options = options

    def apply_json(
        self, df: DataFrame, json_col: str, keep: list[str] | None = None
    ) -> DataFrame:
        keep = keep or []
        schema, options = self.schema, self.options
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
                    res = validate(json.loads(s) if s is not None else None)
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
