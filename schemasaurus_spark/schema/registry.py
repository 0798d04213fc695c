"""Versioned-schema validation (the schema-registry pattern): a real
corpus is heterogeneous — producers migrate, so rows carry a schema
version and each version validates against ITS declared schema, not one
lowest-common-denominator contract.

The reference validates one value against one schema
(/root/reference/src/v4validator.js); routing is engine territory: the
registry compiles EVERY version's schema through the same Column backend
(schema/columns.py) once, then dispatches rows by their version column.

Scale shape: one scan, zero shuffles.  Per version the validator is a
pure Column expression tree, so routing is
``CASE WHEN version = v THEN <v's valid/errors expression> ...`` — every
version's checks are evaluated lazily per row (Catalyst's CaseWhen is
short-circuiting), all inside whole-stage codegen.  The alternative
(filter + validate + union per version) scans the corpus once PER
VERSION; the CASE form is the one-pass fusion of it, identical output.
Unknown versions fail closed: ``valid = false`` with a single
``schemaVersion`` violation naming the unregistered version — silently
passing unversioned rows is how contract rot starts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .columns import ColumnValidator

__all__ = ["SchemaRegistry"]


class SchemaRegistry:
    """``{version: draft4-schema}`` compiled once, applied per row by a
    version column."""

    def __init__(self, schemas: dict, options: dict | None = None):
        if not schemas:
            raise ValueError("SchemaRegistry: need at least one version")
        self._validators = {
            str(v): ColumnValidator(schema, options) for v, schema in schemas.items()
        }

    def validate(self, df: DataFrame, version_col: str = "schema_version") -> DataFrame:
        """``df`` + ``valid`` (boolean) + ``errors`` (array of error
        structs), each row judged by its own version's schema; rows with
        an unregistered (or NULL) version get ``valid=false`` and one
        ``schemaVersion`` error carrying the offending value."""
        if version_col not in df.columns:
            raise ValueError(f"SchemaRegistry.validate: no column {version_col!r}")
        ver = F.col(version_col).cast("string")

        # each compiled validator contributes its error-array expression
        # over the SAME row struct; the CASE dispatch picks one per row —
        # one scan, no union, no re-read.  valid falls out of the unified
        # errors column (unknown versions carry one error, hence invalid).
        row_type = df.schema
        value = F.struct(*[F.col(f.name) for f in row_type.fields])
        errors_expr = None
        for v, cv in self._validators.items():
            errs = cv.errors(value, row_type, F.lit(""))
            cond = ver == F.lit(v)
            errors_expr = (
                F.when(cond, errs)
                if errors_expr is None
                else errors_expr.when(cond, errs)
            )
        unknown_err = F.array(
            F.struct(
                F.lit("schemaVersion").alias("code"),
                F.lit("unregistered schema version").alias("message"),
                F.coalesce(ver, F.lit("null")).alias("value"),
                F.lit(None).cast("string").alias("arg"),
                F.lit("").alias("path"),
            )
        )
        return df.withColumn("errors", errors_expr.otherwise(unknown_err)).withColumn(
            "valid", F.size(F.col("errors")) == 0
        )
