"""Binary-score evaluation harness: threshold sweep (precision/recall/F1
per achieved score) and exact tie-corrected ROC AUC.

Every curation filter is a scorer + a threshold (quality gates, the NB
classifier, LM perplexity, near-dup similarity); this module answers
"how good is the scorer and where should the threshold sit" against any
ground-truth boolean — the model-evaluation stage of the training-data
pipeline (no reference counterpart; the formulas are the textbook
PR/ROC definitions, AUC via the Mann-Whitney rank statistic with the
standard average-rank tie correction).

Exactness: both operators reduce the corpus to ONE per-distinct-score
aggregate (score, n_pos, n_tot) — all counting, map-side combined.  From
there the sweep is integer window cumsums (tp/fp/fn are exact int64) and
the only floats are the output ratios, computed as one identically-
parenthesized division chain and rounded to 6 in-engine (house
discipline).  AUC works on DOUBLED average ranks so ties stay integer:
2·R_pos = Σ_s n_pos(s)·(2·below(s) + n_tot(s) + 1), and
AUC = (2·R_pos − P·(P+1)) / (2·P·N) — exact int64 numerator/denominator,
one IEEE division, round-6.

Scale shape: the per-score aggregate is the only corpus-sized pass; the
sweep then runs over DISTINCT scores via the exact two-phase
range-bucketed cumsum of operators/prefix.py (per-bucket partitioned
windows + broadcast bucket offsets — NO partition-less WindowExec), so a
CONTINUOUS double scorer whose distinct table approaches corpus size
hash-distributes across the cluster instead of serializing through one
task.  Int64 bounds: P·(P+1) and 2·P·N overflow past ~2·10^9 positives —
at that scale evaluate on a deterministic sample (operators/sampling.py),
which is statistically what a curve is for anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from schemasaurus_spark.operators.prefix import exclusive_prefix


def _per_score(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """(score, n_pos, n_tot) per distinct score — the one corpus pass.
    NULL scores/labels are excluded (no ground truth, no rank)."""
    return (
        df.where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(F.col(score_col).alias("score"))
        .agg(
            F.sum(F.col(label_col).cast("long")).alias("n_pos"),
            F.count(F.lit(1)).alias("n_tot"),
        )
    )


def pr_curve(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Threshold sweep: one row per distinct achieved score t with the
    confusion counts and ratios of the rule ``predict positive iff
    score >= t`` — (threshold, tp, fp, fn, precision, recall, f1),
    ratios round-6, F1 NULL when precision+recall is 0, recall NULL when
    there are no positives."""
    per = _per_score(df, score_col, label_col)
    totals = per.agg(
        F.sum("n_pos").alias("_p"), F.sum("n_tot").alias("_n_all")
    )
    pre = exclusive_prefix(per, "score", ["n_pos", "n_tot"], ascending=False)
    cum = pre.select(
        F.col("score").alias("threshold"),
        (F.col("_cum_n_pos") + F.col("n_pos")).alias("tp"),
        (
            (F.col("_cum_n_tot") + F.col("n_tot"))
            - (F.col("_cum_n_pos") + F.col("n_pos"))
        ).alias("fp"),
    ).crossJoin(broadcast(totals))
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
    rec = F.when(
        F.col("_p") > 0, F.col("tp").cast("double") / F.col("_p").cast("double")
    )
    f1 = F.when(
        prec + rec > 0, (2.0 * prec * rec) / (prec + rec)
    )
    return cum.select(
        "threshold",
        "tp",
        "fp",
        (F.col("_p") - F.col("tp")).alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One row: (auc, n_pos, n_neg) — exact tie-corrected Mann-Whitney
    AUC (probability a random positive outscores a random negative, ties
    counting half).  NULL auc when either class is empty."""
    per = _per_score(df, score_col, label_col)
    ranked = exclusive_prefix(per, "score", ["n_tot"], ascending=True).select(
        "n_pos",
        "n_tot",
        F.col("_cum_n_tot").alias("below"),
    )
    agg = ranked.agg(
        F.sum(
            F.col("n_pos") * (2 * F.col("below") + F.col("n_tot") + 1)
        ).alias("two_r_pos"),
        F.sum("n_pos").alias("p"),
        (F.sum("n_tot") - F.sum("n_pos")).alias("n"),
    )
    auc = F.when(
        (F.col("p") > 0) & (F.col("n") > 0),
        (F.col("two_r_pos") - F.col("p") * (F.col("p") + 1)).cast("double")
        / (2 * F.col("p") * F.col("n")).cast("double"),
    )
    return agg.select(
        F.round(auc, 6).alias("auc"),
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
    )


def calibration_table(
    df: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Equal-mass reliability (calibration) table: ``n_bins`` rows of
    ``(bin, n, n_pos, score_min, score_max, pos_rate_bp)`` — the curve a
    reliability diagram plots, and the evaluation PR/AUC cannot give:
    AUC says the scorer RANKS well, the calibration table says whether
    the score LEVEL means what a threshold-picker assumes (a gate at
    "score >= t keeps ~90% positives" is only as real as pos_rate in
    t's bin).

    Bins are equal-MASS (by rank, lowest scores = bin 0), not
    equal-width: fixed-width bins over heavy-tailed scores put almost
    everything in one bin.  The bin of a distinct-score group is
    ``(rows_below * n_bins) DIV n_all`` — assigned at distinct-score
    granularity, so a tie group never splits across bins (bins wobble
    slightly from n/n_bins; deterministic and engine-exact, unlike
    per-row ranks over ties).  ``pos_rate_bp`` is basis points,
    ``n_pos * 10000 DIV n`` — everything int64, zero float math.

    Scale shape: same as the PR sweep — ONE map-side-combined
    per-distinct-score aggregate over the corpus, then the range-bucketed
    exact cumsum of operators/prefix.py on the distinct-score table (no
    partition-less window); output is <= n_bins rows."""
    if n_bins < 1:
        raise ValueError(f"calibration_table: n_bins must be >= 1, got {n_bins}")
    per = _per_score(df, score_col, label_col)
    totals = per.agg(F.sum("n_tot").alias("_n_all"))
    binned = exclusive_prefix(per, "score", ["n_tot"], ascending=True).select(
        "score",
        "n_pos",
        "n_tot",
        F.col("_cum_n_tot").alias("_below"),
    ).crossJoin(broadcast(totals))
    agg = (
        binned.select(
            F.expr(f"(_below * {int(n_bins)}) DIV _n_all").alias("bin"),
            "score",
            "n_pos",
            "n_tot",
        )
        .groupBy("bin")
        .agg(
            F.sum("n_tot").alias("n"),
            F.sum("n_pos").alias("n_pos"),
            F.min("score").alias("score_min"),
            F.max("score").alias("score_max"),
        )
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        "score_min",
        "score_max",
        F.expr("(n_pos * 10000) DIV n").alias("pos_rate_bp"),
    )


def agreement_report(
    df: DataFrame, col_a: str = "label", col_b: str = "predicted"
) -> DataFrame:
    """Inter-rater agreement of two categorical judgment columns — Cohen's
    kappa with its ingredients: one row ``(n, n_agree, po_bp, kappa)``.

    Where two labelings of the same corpus meet (model vs heuristic, two
    annotation runs, old vs new classifier version), raw accuracy flatters
    whenever the class distribution is skewed; kappa discounts the
    agreement two independent raters with these exact marginals would
    reach by chance:  kappa = (po − pe) / (1 − pe) with
    pe = Σ_c margA_c·margB_c / n².  Computed over common denominators so
    everything before the single output division is exact int64:
    kappa = (n·n_agree − Σ_c margA_c·margB_c) / (n² − Σ_c margA_c·margB_c),
    round-6; NULL when the denominator is 0 (both raters constant — chance
    explains everything, kappa undefined).  ``po_bp`` is exact basis
    points, ``n_agree·10000 DIV n``.  Rows where either judgment is NULL
    carry no verdict and are excluded.  Int64 bounds: n² overflows past
    ~3·10^9 rows — evaluate agreement on a deterministic sample
    (operators/sampling.py) beyond that, as with the AUC harness.

    Scale shape: ONE map-side-combined groupBy over the corpus to the
    (a, b) contingency cells (C² domain-bounded rows); marginals, the
    pe cross product and the final fold all run on that metadata-sized
    cell table."""
    cells = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = cells.agg(
        F.sum("n").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))), F.lit(0)
        ).alias("n_agree"),
    )
    marg_a = cells.groupBy("a").agg(F.sum("n").alias("na"))
    marg_b = cells.groupBy(F.col("b").alias("a")).agg(F.sum("n").alias("nb"))
    pe = (
        marg_a.join(marg_b, "a")
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("pe_num"))
    )
    return (
        totals.crossJoin(broadcast(pe))
        .select(
            "n",
            "n_agree",
            F.expr("n_agree * 10000 DIV n").alias("po_bp"),
            F.round(
                (F.col("n") * F.col("n_agree") - F.col("pe_num")).cast("double")
                / F.nullif(
                    F.col("n") * F.col("n") - F.col("pe_num"), F.lit(0)
                ).cast("double"),
                6,
            ).alias("kappa"),
        )
    )
