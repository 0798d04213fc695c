"""Draft-4 schema INFERENCE from observed data — the inverse of the
validators and the missing arc in the engine's loop: profile → infer →
validate (schema/columns.py) → evolve (schema/compat.py + migration.py).

``infer_schema`` reads one aggregate pass over the corpus and emits the
tightest draft-4 schema its keyword vocabulary can state such that EVERY
OBSERVED ROW VALIDATES (the soundness contract, asserted in tests by
running the inferred schema back through ``validate_dataframe``):

* ``type``                  from the Spark column type (static);
* ``required``              when the column has zero NULLs;
* ``minimum`` / ``maximum`` exact observed bounds for numerics;
* ``minLength``/``maxLength`` exact observed length bounds for strings;
* ``enum``                  for string columns whose EXACT distinct count
                            is <= ``enum_max`` (sorted values, collected
                            in a second pass over just those columns —
                            enum-sized, not corpus-sized).

The schema is descriptive, not predictive: fresh data lying outside the
observed ranges SHOULD fail it — that is the point (drift shows up as
violations, and ``schema_delta(infer(old), infer(new))`` reads the drift
as widening/narrowing schema evolution).  Columns with no non-NULL
values contribute type-only constraints.

Scale shape: ONE wide aggregate (count/nulls/min/max/lengths + exact
distinct per candidate enum column) — everything map-side combinable
except the exact distincts, which draft-4 enum semantics genuinely need
(a sketch could emit an enum missing a real value, breaking soundness);
restrict ``enum_candidates`` to known-low-cardinality columns at corpus
scale.  The enum value collect is bounded by ``enum_max`` per column.

No reference counterpart as code — but the OUTPUT is exactly the
reference's input language, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
)

__all__ = ["infer_schema", "schema_constraint_rows"]

_INT = (ByteType, ShortType, IntegerType, LongType)
_NUM = (FloatType, DoubleType)
_INF = float("inf")


def infer_schema(
    df: DataFrame,
    columns: list[str] | None = None,
    enum_max: int = 10,
    enum_candidates: list[str] | None = None,
) -> dict:
    """Infer the tightest draft-4 object schema accepting every row of
    ``df`` (flat columns; unsupported types are skipped)."""
    cols = []
    for f_ in df.schema.fields:
        if columns is not None and f_.name not in columns:
            continue
        if isinstance(f_.dataType, _INT + _NUM + (StringType, BooleanType)):
            cols.append((f_.name, f_.dataType))
    if not cols:
        raise ValueError("infer_schema: no supported flat columns")
    if enum_max < 0:
        raise ValueError(f"enum_max must be >= 0, got {enum_max}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, dtype in cols:
        c = F.col(name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"_nulls_{name}"))
        if isinstance(dtype, _NUM):
            # NaN sorts above every number in Spark's max, and json.dumps
            # would emit the non-JSON tokens NaN/Infinity — aggregate the
            # bounds over finite values only.  A column with ANY
            # non-finite value gets NO bounds at all (type-only): the
            # validators treat NaN/Inf as greater than any finite
            # maximum, so finite-only bounds would REJECT the very rows
            # that produced them, breaking the every-observed-row-
            # validates soundness contract (round-5 review finding).
            finite = F.when(~F.isnan(c) & ~c.isin(_INF, -_INF), c)
            aggs.append(F.min(finite).alias(f"_min_{name}"))
            aggs.append(F.max(finite).alias(f"_max_{name}"))
            aggs.append(
                F.sum((F.isnan(c) | c.isin(_INF, -_INF)).cast("long")).alias(
                    f"_nonfin_{name}"
                )
            )
        elif isinstance(dtype, _INT):
            aggs.append(F.min(c).alias(f"_min_{name}"))
            aggs.append(F.max(c).alias(f"_max_{name}"))
        elif isinstance(dtype, StringType):
            aggs.append(F.min(F.length(c)).alias(f"_minl_{name}"))
            aggs.append(F.max(F.length(c)).alias(f"_maxl_{name}"))
            if enum_max > 0 and (
                enum_candidates is None or name in enum_candidates
            ):
                aggs.append(F.count_distinct(c).alias(f"_dist_{name}"))
    row = df.agg(*aggs).collect()[0]

    props: dict = {}
    for name, dtype in cols:
        sub: dict = {}
        if isinstance(dtype, _INT):
            sub["type"] = "integer"
        elif isinstance(dtype, _NUM):
            sub["type"] = "number"
        elif isinstance(dtype, BooleanType):
            sub["type"] = "boolean"
        else:
            sub["type"] = "string"
        if row[f"_nulls_{name}"] == 0 and row["_n"] > 0:
            sub["required"] = True
        non_null = row["_n"] - row[f"_nulls_{name}"]
        if non_null > 0:
            if isinstance(dtype, _INT + _NUM):
                mn, mx = row[f"_min_{name}"], row[f"_max_{name}"]
                nonfin = (
                    row[f"_nonfin_{name}"] if isinstance(dtype, _NUM) else 0
                )
                # bounds only when every observed value is finite —
                # otherwise type-only (soundness; see aggregate comment)
                if mn is not None and not nonfin:
                    sub["minimum"] = int(mn) if isinstance(dtype, _INT) else float(mn)
                    sub["maximum"] = int(mx) if isinstance(dtype, _INT) else float(mx)
            elif isinstance(dtype, StringType):
                sub["minLength"] = int(row[f"_minl_{name}"])
                sub["maxLength"] = int(row[f"_maxl_{name}"])
                dist = row.asDict().get(f"_dist_{name}")
                if dist is not None and 0 < dist <= enum_max:
                    values = [
                        r[0]
                        for r in df.select(name)
                        .where(F.col(name).isNotNull())
                        .distinct()
                        .collect()
                    ]
                    sub["enum"] = sorted(values)
        props[name] = sub
    return {"type": "object", "properties": props}


def schema_constraint_rows(schema: dict) -> list[tuple[str, str, str]]:
    """Flatten an inferred schema to ``(column, keyword, value)`` rows —
    the engine-portable projection the contract oracle recomputes (enum
    rendered as a '|'-joined sorted list, numbers via repr)."""
    import json as _json

    rows = []
    for col, sub in sorted((schema.get("properties") or {}).items()):
        for kw in ("type", "required", "minimum", "maximum",
                   "minLength", "maxLength", "enum"):
            if kw in sub:
                v = sub[kw]
                if kw == "enum":
                    v = "|".join(v)
                elif isinstance(v, bool):
                    v = "true"
                elif isinstance(v, float):
                    v = _json.dumps(v)
                else:
                    v = str(v)
                rows.append((col, kw, v))
    return rows
