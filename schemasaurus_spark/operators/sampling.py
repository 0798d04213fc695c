"""Deterministic sampling for training-data curation.

Spark's built-in ``DataFrame.sample`` is seeded per-partition, so its
output changes with partitioning/parallelism — useless for reproducible
corpus curation or cross-engine verification.  These operators instead
derive the keep/drop decision from a 16-bit md5 bucket of the row's key:

* identical across runs, parallelism levels, and engines (the DuckDB
  oracle reproduces the exact row set);
* a pure projection + filter — no shuffle, pushed into the scan stage,
  embarrassingly parallel at 10^12 rows;
* stratified form: per-stratum rates (downsample the over-represented
  language / source / quality band) expressed as a CASE column, still one
  scan and zero shuffles.

Bucket scheme: ``md5(key || ':' || seed)`` first 4 hex chars -> int in
[0, 65536); keep when ``bucket < round(fraction * 65536)``.  Rates are
therefore quantized to 1/65536 — documented contract, not a bug.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 16


def sample_bucket(key_col: str, seed: int = 0) -> Column:
    """Deterministic int bucket in [0, 65536) from a key column."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(key_col), F.lit(str(seed)))), 1, 4),
        16,
        10,
    ).cast("int")


def _keep_threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return round(fraction * BUCKETS)


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Reproducible Bernoulli-style sample keyed on ``key_col``."""
    return df.where(sample_bucket(key_col, seed) < F.lit(_keep_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. ``{"en": 0.1, "de": 0.5}``).

    Strata absent from ``fractions`` keep ``default_fraction`` of rows; a
    NULL stratum is treated as absent.  The per-row threshold is a CASE
    expression, so the whole operator stays one filtered scan."""
    thr = F.lit(_keep_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(_keep_threshold(fraction))
        ).otherwise(thr)
    return df.where(sample_bucket(key_col, seed) < thr)
