"""schemasaurus_spark — a from-scratch PySpark-native schema + constraint
validation engine with the capabilities of brettz9/schemasaurus (a JSON-Schema
draft-4 compiled iterator/validator/normalizer), rebuilt Spark-first.

Two execution backends share one driver-side schema compiler:

* ``schema.walker`` — a closure-specializing Python walker with exact
  reference-semantics parity (error codes / values / args / paths in walk
  order).  Used for fixture parity, arbitrary-JSON payloads, and as the
  oracle for the columnar backend.
* ``schema.columns`` — the scale path: the same JSON Schema compiled into
  native Spark ``Column`` expression trees (whole-stage-codegen'd, zero
  Python in the hot loop) over typed DataFrames such as the interleaved
  text+media ``documents`` table.

Around the validator sits a data-quality engine (``operators``): column
stats, salted uniqueness, broadcast referential checks, KS / chi-square
drift, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, and text analysis — all expressed with built-in
``pyspark.sql.functions`` so Catalyst owns the physical plan.
"""

from schemasaurus_spark.schema.walker import (
    new_iterator,
    new_normalizer,
    new_validator,
)

__all__ = ["new_iterator", "new_validator", "new_normalizer"]
