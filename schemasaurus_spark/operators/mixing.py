"""Target-weighted source mixing for training-corpus assembly.

Training mixtures (Pile / Dolma / LLaMA-style) are specified as *target
proportions per source* plus a total document budget — not as per-source
sampling rates.  This operator derives the rates from the observed
per-source counts entirely IN-PLAN and applies them deterministically,
including **upsampling**: a source whose target exceeds its size is
repeated ``floor(rate)`` times plus a deterministically-sampled
fractional epoch, each copy tagged with an ``epoch`` number so
downstream packing/shuffling can interleave repeats instead of emitting
them adjacently.

Shape at 10^12 docs:

* the per-source count aggregate is map-side combined and collapses to
  |sources| rows (tiny), which then broadcast-join back onto the corpus
  — the corpus itself never shuffles;
* the keep/repeat decision is the 16-bit md5 bucket scheme from
  ``sampling.py`` in an OPERATOR-SCOPED hash domain (``key:mix:seed``;
  run/partitioning/engine-invariant, quantized to 1/65536 — documented
  contract).  Domain scoping keeps a composed pipeline's stages
  statistically independent: with the samplers' bare ``key:seed``
  domain, an upstream deterministic sample at the same seed would leave
  only low-bucket keys, skewing which docs get the fractional extra
  epoch (the same trap caught live for quota_cap+assign_splits);
* repetition is a JVM-side ``explode(sequence(...))`` — map-only, no
  Python, output rows ≈ budget.

Rate arithmetic is pure IEEE-double (``budget * weight / n_source``) with
``floor`` for the copy split, so a SQL engine reproduces the exact row
set — the DuckDB oracle in ``__spark_entry__`` replays it verbatim.

No reference counterpart (schemasaurus validates documents; mixing is
part of this repo's training-data pipeline surface alongside
sampling.py / packing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.sampling import BUCKETS


def _weight_case(source_col: str, weights: dict[str, float]) -> Column:
    """Per-row target weight as a CASE literal; unlisted sources get 0."""
    w = F.lit(0.0)
    for value, weight in sorted(weights.items()):
        if weight < 0:
            raise ValueError(f"negative weight for {value!r}")
        w = F.when(F.col(source_col) == F.lit(value), F.lit(float(weight))).otherwise(w)
    return w


def temperature_weights(counts: dict[str, int], alpha: float = 0.3) -> dict[str, float]:
    """mT5/XLM-R-style temperature sampling: target weights
    ``w_s ∝ n_s^alpha`` normalized to 1.  ``alpha=1`` reproduces the
    natural distribution; ``alpha -> 0`` approaches uniform (boosting
    low-resource sources).  Driver-side math over the per-source count
    map (|sources| entries — metadata-sized); feed the result to
    ``mix_sources``.  Kept out of the Spark plan on purpose: ``pow`` is
    the one operation whose last-ulp rounding differs across engines, so
    baking the derived weights as literals keeps the mixture row set
    engine-reproducible."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    if not counts:
        return {}
    powed = {s: float(n) ** alpha for s, n in counts.items() if n > 0}
    total = sum(powed.values())
    return {s: v / total for s, v in sorted(powed.items())}


def mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    budget_docs: int | None = None,
    budget_factor: float | None = None,
) -> DataFrame:
    """Per-source ``(source, n_source, rate)`` derived from targets.

    ``rate = budget * weight / n_source`` where ``budget`` is either the
    absolute ``budget_docs`` or ``budget_factor * total_docs`` (exactly
    one must be given).  Rates > 1 mean upsampling.  All arithmetic stays
    in the plan — no driver-side collect."""
    if (budget_docs is None) == (budget_factor is None):
        raise ValueError("give exactly one of budget_docs / budget_factor")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    total = counts.agg(F.sum("n_source").alias("_total"))
    budget = (
        F.lit(float(budget_factor)) * F.col("_total").cast("double")
        if budget_factor is not None
        else F.lit(float(budget_docs))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            source_col,
            "n_source",
            (budget * _weight_case(source_col, weights) / F.col("n_source").cast("double")).alias("rate"),
        )
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    budget_docs: int | None = None,
    budget_factor: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """Rows of ``df`` resampled to the target mixture, with an ``epoch``
    column (0-based copy index).  ``rate < 1`` downsamples (epoch always
    0); ``rate >= 1`` emits ``floor(rate)`` full copies plus one more for
    the deterministic ``rate - floor(rate)`` fraction of keys."""
    rates = mixture_rates(
        df, weights, source_col, budget_docs=budget_docs, budget_factor=budget_factor
    ).select(source_col, "rate")
    bucket = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col(key_col).cast("string"), F.lit("mix"), F.lit(str(seed))
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")
    full = F.floor(F.col("rate")).cast("long")
    frac_thr = F.floor((F.col("rate") - F.floor(F.col("rate"))) * F.lit(float(BUCKETS)))
    n_copies = (full + F.when(bucket < frac_thr, F.lit(1)).otherwise(F.lit(0))).alias("_n_copies")
    return (
        df.join(F.broadcast(rates), source_col)
        .select(*df.columns, n_copies)
        .where(F.col("_n_copies") > 0)
        .select(
            *df.columns,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_copies") - 1)).alias("epoch"),
        )
    )
