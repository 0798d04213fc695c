"""Blocked record linkage (entity resolution): match records across two
tables that share no key — the canonicalization step de-duplicating
authors, sources, suppliers or user accounts before training-data
attribution.

Model (public: Fellegi-Sunter '69, reduced to integer agreement
weights): candidate pairs come ONLY from blocking-key equi-joins (never
a cross join — a pair that agrees on no blocking key is invisible, the
standard recall/cost trade); each field comparator then adds
``w_agree`` when the pair agrees (exact, or Levenshtein distance <=
``max_edit`` for fuzzy fields — JVM ``levenshtein`` both engines
implement identically on ASCII), adds ``w_disagree`` when it disagrees,
and adds 0 when either side is NULL (absence is evidence of nothing).
Pairs scoring >= ``threshold`` match.  All weights and scores are exact
int64 — rank/threshold behavior cannot drift on float noise.

Scale shape: one hash equi-join per blocking key (AQE-skewed), a
``distinct`` over the union of candidate id-pairs BEFORE any comparator
runs (a pair found by 3 blocks is scored once — and the distinct keys
are two ids, metadata-thin), then one semi-join back to each side to
fetch comparator fields for candidates only, and a zero-shuffle scoring
projection.  Output is candidate-sized, corpus text is never compared
outside candidate pairs.

No reference counterpart (training-pipeline surface, like dedup.py /
editdist.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldComparator", "record_linkage"]


@dataclass(frozen=True)
class FieldComparator:
    name: str
    left_col: str
    right_col: str
    w_agree: int
    w_disagree: int
    max_edit: int = 0  # 0 = exact equality; >0 = levenshtein <= max_edit


def record_linkage(
    left: DataFrame,
    right: DataFrame,
    *,
    left_id: str,
    right_id: str,
    blocks: list[tuple[Column, Column]],
    fields: list[FieldComparator],
    threshold: int,
) -> DataFrame:
    """Matched pairs ``(left_id, right_id, score)`` with score >=
    ``threshold``; ``blocks`` is a list of (left_expr, right_expr)
    blocking-key column pairs, ``fields`` the comparator spec."""
    if not blocks:
        raise ValueError("record_linkage: at least one blocking key required")
    if not fields:
        raise ValueError("record_linkage: at least one field comparator required")
    seen = set()
    for fc in fields:
        if fc.name in seen:
            raise ValueError(f"duplicate comparator name {fc.name!r}")
        seen.add(fc.name)

    cand = None
    for lb, rb in blocks:
        lk = left.select(F.col(left_id).alias("_lid"), lb.alias("_bk")).where(
            F.col("_bk").isNotNull()
        )
        rk = right.select(F.col(right_id).alias("_rid"), rb.alias("_bk")).where(
            F.col("_bk").isNotNull()
        )
        pairs = lk.join(rk, "_bk").select("_lid", "_rid")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.distinct()

    lcols = [F.col(left_id).alias("_lid")] + [
        F.col(fc.left_col).alias(f"_l_{fc.name}") for fc in fields
    ]
    rcols = [F.col(right_id).alias("_rid")] + [
        F.col(fc.right_col).alias(f"_r_{fc.name}") for fc in fields
    ]
    scored = cand.join(left.select(*lcols), "_lid").join(right.select(*rcols), "_rid")

    score = F.lit(0).cast("long")
    for fc in fields:
        l, r = F.col(f"_l_{fc.name}"), F.col(f"_r_{fc.name}")
        if fc.max_edit > 0:
            agree = F.levenshtein(l.cast("string"), r.cast("string")) <= fc.max_edit
        else:
            agree = l == r
        score = score + (
            F.when(l.isNull() | r.isNull(), F.lit(0))
            .when(agree, F.lit(int(fc.w_agree)))
            .otherwise(F.lit(int(fc.w_disagree)))
            .cast("long")
        )
    return (
        scored.withColumn("score", score)
        .where(F.col("score") >= threshold)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            "score",
        )
    )
