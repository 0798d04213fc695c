"""DSIR-style hashed-n-gram importance resampling — data selection that
pulls a raw corpus toward a target distribution.

The method (public formulation: Xie et al., "Data Selection for Language
Models via Importance Resampling", NeurIPS 2023) is the standard recipe
for "give me the k raw-web documents that look most like my high-quality
target set": fit two bag-of-hashed-n-grams models (target and raw),
score every raw document by its log importance weight
``Σ_features [ln p_target(bucket) − ln p_raw(bucket)]``, and resample
via Gumbel top-k so the selected set is a weighted sample rather than a
brittle argmax of near-duplicated high scorers.  No reference
counterpart (schemasaurus validates documents — SURVEY.md §2E; this is
part of the repo's training-data curation surface next to classify.py /
sampling.py / mixing.py).

Exactness discipline (the DuckDB oracle hash-matches the whole chain):

* Features are unigrams + bigrams of THE corpus tokenization
  (operators/tokenize.py), hashed to ``n_buckets`` via the first 8 hex
  chars of md5 — engine-portable, no xxhash dependence.
* Both per-bucket log-probabilities are Laplace-smoothed
  ``(cnt+1)/(tot+B)`` and quantized int64 BEFORE the subtraction:
  ``w_fp(b) = fp(ln p_t(b)) − fp(ln p_r(b))`` with
  ``fp(x) = floor(x·1e6 + 0.5)`` (classify.py's grid — floor(+0.5), not
  round(), because engines disagree on half-ties, never on floor).
  Per-document scores are then exact integer sums: shuffle order cannot
  move a bit.  A libm ulp flips a grid cell only within ~1e-15 of a
  boundary (~1e-9 per distinct parameter — the accepted repo-wide risk).
* Gumbel noise for the resample is derived from the row key, not an
  RNG: ``u = (md5_32(doc_id:dsir:seed) + 0.5) / 2^32`` (never 0 or 1),
  ``g = −ln(−ln(u))``, quantized to the same grid, so the selection key
  ``key_fp = score_fp + fp(g)`` is an int64 and top-k with a doc_id
  tie-break is run/partitioning/engine-invariant.  The hash domain is
  operator-scoped (``:dsir:``) per sampling.py's composition rule.

Shape at 10^12 documents:

* model fit = one tokenize scan per corpus (target is usually a small
  curated set), a ×~2·len explode, and a map-side-combined groupBy
  collapsing to ≤ n_buckets rows — the weight table is bucket-bounded
  (10k–1M rows) and broadcastable; totals stay in-plan as 1-row
  aggregates (no driver collect, the model composes lazily);
* scoring = one scan + explode + broadcast-hash join + one doc-keyed
  map-side-combined sum — the corpus never shuffles on anything wider
  than (doc_id, bucket) partial counts;
* selection = TakeOrdered(k) (driver holds k rows — the DSIR regime is
  k ≪ n).  For budget-sized k where driver memory matters, compute the
  key with :func:`gumbel_key_fp` and filter on a threshold from
  ``approxQuantile`` instead (documented scale path; the top-k contract
  stays the verified tier).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from schemasaurus_spark.operators.tokenize import tokenized

DSIR_FP_SCALE = 1_000_000.0
_U32 = 4294967296.0  # 2^32


def _fp(col: Column) -> Column:
    """int64 fixed-point: floor(x·1e6 + 0.5) — engine-portable rounding."""
    return F.floor(col * F.lit(DSIR_FP_SCALE) + F.lit(0.5)).cast("long")


def feature_bucket(feat: Column, n_buckets: int) -> Column:
    """Hashed-n-gram bucket in [0, n_buckets): first 32 md5 bits mod B."""
    return F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("long") % F.lit(
        n_buckets
    )


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """One row per (doc, feature occurrence) with its hashed bucket.

    Features are the document's unigrams plus space-joined adjacent
    bigrams over THE corpus tokenization.  NULL/whitespace-only docs are
    excluded (no features — mirrored by the oracle)."""
    toks = tokenized(df, text_col, id_col)
    c = F.col("_toks")
    n = F.size(c)
    bigrams = F.zip_with(
        F.slice(c, 1, n - 1),
        F.slice(c, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return toks.select(
        F.col(id_col),
        F.explode(F.concat(c, bigrams)).alias("_feat"),
    ).select(F.col(id_col), feature_bucket(F.col("_feat"), n_buckets).alias("bucket"))


@dataclass
class DsirModel:
    """weights: (bucket, w_fp) — bucket-bounded, broadcastable; lazy
    (no action runs until scoring).  default_fp: 1-row frame with the
    unseen-in-both-corpora weight (only reachable when scoring documents
    outside the raw fit corpus)."""

    weights: DataFrame
    default_fp: DataFrame
    n_buckets: int


def _log_prob_fp(cnt: Column, tot: Column, n_buckets: int) -> Column:
    """fp(ln((cnt+1)/(tot+B))) — the Laplace-smoothed quantized term,
    written with the exact parenthesization the oracle replays."""
    return _fp(
        F.log(
            (cnt.cast("double") + F.lit(1.0))
            / (tot.cast("double") + F.lit(float(n_buckets)))
        )
    )


def dsir_fit(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DsirModel:
    """Fit the importance model: per-bucket quantized log-ratio weights
    from the target and raw hashed-n-gram counts."""
    tcnt = (
        hashed_features(target, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_tc"))
    )
    rcnt = (
        hashed_features(raw, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_rc"))
    )
    ttot = tcnt.agg(F.sum("_tc").alias("_tt"))
    rtot = rcnt.agg(F.sum("_rc").alias("_rt"))
    weights = (
        tcnt.join(rcnt, on="bucket", how="full_outer")
        .crossJoin(broadcast(ttot))
        .crossJoin(broadcast(rtot))
        .select(
            "bucket",
            (
                _log_prob_fp(F.coalesce(F.col("_tc"), F.lit(0)), F.col("_tt"), n_buckets)
                - _log_prob_fp(
                    F.coalesce(F.col("_rc"), F.lit(0)), F.col("_rt"), n_buckets
                )
            ).alias("w_fp"),
        )
    )
    default_fp = (
        ttot.crossJoin(rtot)
        .select(
            (
                _log_prob_fp(F.lit(0), F.col("_tt"), n_buckets)
                - _log_prob_fp(F.lit(0), F.col("_rt"), n_buckets)
            ).alias("_default_fp")
        )
    )
    return DsirModel(weights=weights, default_fp=default_fp, n_buckets=n_buckets)


def dsir_scores(
    model: DsirModel,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "score_fp",
) -> DataFrame:
    """Per-document integer importance score: Σ occ·w_fp over the doc's
    hashed features.  Docs with NULL/whitespace-only text carry no
    features and are excluded (the fit excluded them too)."""
    occ = (
        hashed_features(df, text_col, id_col, model.n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("_occ"))
    )
    return (
        occ.join(broadcast(model.weights), on="bucket", how="left")
        .crossJoin(broadcast(model.default_fp))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("_occ") * F.coalesce(F.col("w_fp"), F.col("_default_fp"))).alias(
                score_col
            )
        )
    )


def gumbel_key_fp(
    score_col: str, id_col: str = "doc_id", seed: int = 0
) -> Column:
    """int64 Gumbel-top-k selection key: score_fp + fp(−ln(−ln(u))) with
    u a deterministic md5 uniform of the row key — run/partitioning/
    engine-invariant (operator-scoped ``:dsir:`` hash domain)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col), F.lit("dsir"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(_U32)
    return F.col(score_col) + _fp(-F.log(-F.log(u)))


def dsir_resample(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "score_fp",
    seed: int = 0,
    key_col: str = "key_fp",
) -> DataFrame:
    """Gumbel top-k importance resample of a scored corpus: the k rows
    with the largest ``score_fp + Gumbel(doc_id)`` keys (doc_id-asc
    tie-break).  Sort+limit compiles to TakeOrdered — no global sort, the
    driver holds only k rows."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    keyed = scored.withColumn(key_col, gumbel_key_fp(score_col, id_col, seed))
    return keyed.orderBy(F.col(key_col).desc(), F.col(id_col).asc()).limit(k)
