"""Multinomial Naive Bayes text classification, trained and scored
in-plan — the engine's supervised-classification stage.

Curation pipelines routinely run a cheap linear text classifier
(fastText-style quality/domain scoring in the LLaMA / RedPajama / CCNet
recipes) to label documents by source, language, or quality before
filtering and mixing.  The reference engine has no analog (its scope is
the JSON-Schema walk — SURVEY.md §2E); the formulation here is the
textbook multinomial NB with Laplace add-one smoothing (public
formulation; no library code consulted).

Exactness discipline (what makes the DuckDB oracle hash-match):

* All model parameters are **vocabulary-sized, computed once**, and
  immediately quantized to an int64 fixed-point grid:
  ``w_fp = floor(ln(p) · 1e6 + 0.5)`` — floor(+0.5) rather than round()
  because engines disagree on round-half ties, never on floor.  After
  quantization, every per-document score is an exact INTEGER sum
  (Σ occ·w_fp + prior_fp), so shuffle order cannot change a single bit
  and the argmax is exact (PageRank's int64 fixed-point precedent).
  A libm ulp difference in ``ln`` flips the grid cell only when the
  true value sits within ~1e-15 of a grid boundary (~1e-9 per distinct
  parameter — the collocation-PMI precedent, here applied BEFORE the
  aggregation instead of after).
* Laplace smoothing: ``p(t|c) = (cnt(t,c)+1) / (total_c + V)`` over the
  TRAIN vocabulary V; a vocabulary token unseen in class c contributes
  the class default ``w0_c = ln(1/(total_c+V))``; tokens outside V are
  dropped (standard closed-vocabulary NB — the oracle mirrors all
  three cases).
* Ties in the argmax break to the smallest class label (min over
  struct(-score, label)).

Scale shape at 10^12 documents: training is one tokenize scan feeding
two map-side-combined aggregates (per-(token,class) counts — vocabulary
× classes rows — and per-class totals); the class table is
domain-bounded and collected driver-side; the weight table is
vocabulary-sized, capped to ``max_vocab`` by (train count desc, token
asc) TakeOrdered-style so it stays broadcastable (the cap is the
standard hashing-trick/fastText vocabulary bound — applied
deterministically so any engine reproduces it).  Scoring is two scans
of the input (per-(doc, vocab-token) occurrence counts + the
tokenized-doc spine that keeps zero-vocab docs alive with prior-only
scores — persist the input once to collapse them), a ×C label expansion
of the thin occurrence rows, a broadcast join against the weights, and
two doc-keyed map-side-combined aggregates.  Nothing corpus-sized is
ever collected or globally sorted.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from schemasaurus_spark.operators.tokenize import tokenized

NB_FP_SCALE = 1_000_000.0


def _fp(col: Column) -> Column:
    """int64 fixed-point: floor(x·1e6 + 0.5) — engine-portable rounding."""
    return F.floor(col * F.lit(NB_FP_SCALE) + F.lit(0.5)).cast("long")


def nb_bucket(key_col: str, seed: int = 0) -> Column:
    """Deterministic 16-bit bucket for the train/test split (hash domain
    ``key:nb:seed`` per the sampling module's composition discipline)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(key_col), F.lit("nb"), F.lit(str(seed)))),
            1,
            4,
        ),
        16,
        10,
    ).cast("int")


@dataclass
class NbModel:
    """classes: driver-side [(label, prior_fp, w0_fp, total, n_docs)] in
    label order (domain-bounded by construction); weights: vocabulary-
    sized DataFrame (token, label, w_fp); vocab: DataFrame (token)."""

    classes: list
    weights: DataFrame
    vocab: DataFrame
    vocab_size: int


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 100_000,
) -> NbModel:
    """Fit multinomial NB with add-one smoothing on ``docs`` (typically
    the train split).  Rows with NULL label or NULL/whitespace-only text
    are excluded (they carry no training signal; the oracle mirrors)."""
    base = docs.where(F.col(label_col).isNotNull())
    toks = tokenized(base, text_col, id_col).join(
        base.select(F.col(id_col), F.col(label_col).alias("_label")), on=id_col
    )
    tok_rows = toks.select(
        "_label", F.explode(F.col("_toks")).alias("token")
    )
    # vocabulary: top max_vocab train tokens by (count desc, token asc) —
    # deterministic cap so the weight table stays broadcastable
    vocab = (
        tok_rows.groupBy("token")
        .agg(F.count(F.lit(1)).alias("_tcnt"))
        .orderBy(F.col("_tcnt").desc(), F.col("token").asc())
        .limit(max_vocab)
        .select("token")
    )
    counts = (
        tok_rows.join(broadcast(vocab), on="token")
        .groupBy("token", "_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = {
        r["_label"]: r["total"]
        for r in counts.groupBy("_label").agg(F.sum("cnt").alias("total")).collect()
    }
    doc_counts = {
        r["_label"]: r["n"]
        for r in toks.groupBy("_label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    v = vocab.count()
    n_train = sum(doc_counts.values())
    if n_train == 0 or v == 0:
        raise ValueError(
            "nb_train: no labeled, tokenized training documents "
            f"(docs={n_train}, vocab={v})"
        )
    classes = []
    for label in sorted(doc_counts):
        total = int(totals.get(label, 0))
        prior = F.log(
            F.lit(float(doc_counts[label])) / F.lit(float(n_train))
        )
        w0 = F.log(F.lit(1.0) / (F.lit(float(total)) + F.lit(float(v))))
        classes.append((label, prior, w0, total, int(doc_counts[label])))
    # evaluate the two per-class scalars through the SAME engine (Spark)
    # expressions the oracle replays in SQL — one metadata-sized select
    scalar_row = (
        counts.sparkSession.range(1)
        .select(
            *[_fp(prior).alias(f"p{i}") for i, (_, prior, _, _, _) in enumerate(classes)],
            *[_fp(w0).alias(f"z{i}") for i, (_, _, w0, _, _) in enumerate(classes)],
        )
        .collect()[0]
    )
    class_rows = [
        (label, int(scalar_row[f"p{i}"]), int(scalar_row[f"z{i}"]), total, nd)
        for i, (label, _, _, total, nd) in enumerate(classes)
    ]
    total_map = {label: total for label, _, _, total, _ in class_rows}
    total_expr = F.create_map(
        *[x for label in sorted(total_map) for x in (F.lit(label), F.lit(float(total_map[label])))]
    )
    weights = counts.select(
        "token",
        F.col("_label").alias("label"),
        _fp(
            F.log(
                (F.col("cnt").cast("double") + F.lit(1.0))
                / (total_expr[F.col("_label")] + F.lit(float(v)))
            )
        ).alias("w_fp"),
    )
    return NbModel(classes=class_rows, weights=weights, vocab=vocab, vocab_size=v)


def nb_scores(
    model: NbModel,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, class) exact int64 log-posterior scores
    (prior_fp + Σ occ·w_fp): (id_col, label, score) — ``nb_classify`` is
    the argmax over this frame; evaluation harnesses (PR curve, AUC)
    consume one class's score column directly.  Documents with
    NULL/whitespace-only text are excluded (no tokens to score);
    documents whose tokens all fall outside the vocabulary get
    prior-only scores."""
    spark = docs.sparkSession
    occ = (
        tokenized(docs, text_col, id_col)
        .select(F.col(id_col), F.explode(F.col("_toks")).alias("token"))
        .join(broadcast(model.vocab), on="token")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    labels = spark.createDataFrame(
        [(label, prior_fp, w0_fp) for label, prior_fp, w0_fp, _, _ in model.classes],
        schema="label string, prior_fp long, w0_fp long",
    )
    contrib = (
        occ.crossJoin(broadcast(labels.select("label", "w0_fp")))
        .join(broadcast(model.weights), on=["token", "label"], how="left")
        .groupBy(id_col, "label")
        .agg(
            F.sum(
                F.col("occ") * F.coalesce(F.col("w_fp"), F.col("w0_fp"))
            ).alias("_tok_fp")
        )
    )
    # every tokenized doc × every class, so zero-vocab docs keep priors
    doc_ids = tokenized(docs, text_col, id_col).select(id_col)
    return (
        doc_ids.crossJoin(broadcast(labels.select("label", "prior_fp")))
        .join(contrib, on=[id_col, "label"], how="left")
        .select(
            F.col(id_col),
            "label",
            (F.col("prior_fp") + F.coalesce(F.col("_tok_fp"), F.lit(0))).alias(
                "score"
            ),
        )
    )


def nb_classify(
    model: NbModel,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Argmax over ``nb_scores``: (id_col, predicted, score), ties to the
    smallest class label."""
    scored = nb_scores(model, docs, text_col, id_col).withColumnRenamed(
        "score", "_score"
    )
    best = (
        scored.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("_score")).alias("n"), F.col("label"))).alias("b"))
        .select(
            F.col(id_col),
            F.col("b.label").alias("predicted"),
            (-F.col("b.n")).alias("score"),
        )
    )
    return best


def confusion_matrix(
    preds: DataFrame, label_col: str = "label", pred_col: str = "predicted"
) -> DataFrame:
    """(label, predicted, n) cell counts plus per-TRUE-class round-6
    recall share — the C²-row summary of any classifier output (one
    map-side-combined groupBy over prediction rows; C² is domain-
    bounded, so everything after the aggregate is metadata-sized)."""
    cells = preds.groupBy(label_col, pred_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w_tot = F.sum("n").over(Window.partitionBy(label_col))
    return cells.select(
        F.col(label_col).alias("label"),
        F.col(pred_col).alias("predicted"),
        "n",
        F.round(F.col("n").cast("double") / w_tot.cast("double"), 6).alias(
            "share_of_label"
        ),
    )


def nb_train_classify(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_fraction: float = 0.7,
    seed: int = 0,
    max_vocab: int = 100_000,
) -> DataFrame:
    """End-to-end held-out evaluation: md5-split ``docs`` into
    train/test, fit on train, score test — (id_col, label, predicted,
    score), one row per tokenized, labeled test document."""
    thr = int(round(train_fraction * 65536))
    b = nb_bucket(id_col, seed)
    train = docs.where(b < F.lit(thr))
    test = docs.where(b >= F.lit(thr)).where(F.col(label_col).isNotNull())
    model = nb_train(train, label_col, text_col, id_col, max_vocab)
    preds = nb_classify(model, test, text_col, id_col)
    return preds.join(
        test.select(F.col(id_col), F.col(label_col).alias("label")), on=id_col
    ).select(id_col, "label", "predicted", "score")
