"""SemDeDup — cluster-based semantic deduplication over an embedding
column (Abbas et al. 2023, arXiv:2303.09540): k-means the corpus into
coarse cells, call two members semantic duplicates when their cosine
similarity clears a threshold WITHIN a cell, group duplicates into
connected components, and keep exactly one member per component — the
paper's rule: the member LEAST similar to its cluster centroid (the
"outlier" carries the most marginal information; the ones hugging the
centroid are the redundant middle).

This is the third member of the embedding-dedup family and fills a
different niche than the other two:

* ``similarity.embedding_near_duplicates`` (hyperplane LSH) finds pairs
  ANYWHERE in the corpus — recall-oriented, randomized buckets;
* ``semdedup`` partitions the corpus by MEANING first (k-means cells)
  and only compares within a cell — the published recipe for pruning
  web-scale training sets (LAION / C4 in the paper), whose win is that
  the keep-rule is semantic (keep the outlier), not arbitrary.

No reference counterpart: /root/reference is a JSON-Schema walker; this
extends the SURVEY §2E training-data family it cannot express.

Determinism / oracle portability:
- The coarse quantizer is ``similarity.build_ivf_index`` — an
  md5-ordered sample, zero float math in selection, so a SQL engine
  rebuilds the identical index (same trick the IVF-flat oracle uses).
- Assignment argmax and the keep-rule ranking both order floats that
  the two engines compute with the same operation order; the keep rank
  additionally rounds to 6 decimals first (the repo-wide "round-6
  absorbs libm ulps" convention) and tie-breaks on id, so a boundary
  ulp cannot flip which member survives.
- ``comp_id`` is the minimum member id of the component (same contract
  as ``dedup.connected_components``).

Scale shape (10^12 docs):
- Cell count defaults to ``ceil(n / SEMDEDUP_TARGET_LIST)`` so expected
  cell size is CONSTANT in n -> within-cell candidate pairs are O(n),
  not the O(n^1.5) a sqrt(n)-cell IVF sizing would give.  Driver-side
  centroids cap at 2^16 (IvfIndex is a broadcast list); past ~10^9
  vectors cells grow linearly again and ``list_cap`` excludes oversized
  cells from pairing with a REPORTED truncation (never silent) — the
  production answer at that scale is hierarchical semdedup (re-run
  within oversized cells with a sub-index), which composes from these
  same pieces.
- Assignment is the IVF zero-shuffle broadcast-data map pass; the
  within-cell self-join shuffles ids+vectors once on ``list_id``; the
  component step is dedup.connected_components (log-round star
  contraction over the pair set, which is dup-sized, not corpus-sized).
- Run AFTER exact dedup (the composed pipeline's stage 1): identical
  vectors are still grouped correctly here (cosine exactly 1), but each
  exact-dup family costs quadratic pairs within its cell — the exact
  pass removes them for one linear scan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schemasaurus_spark.operators.dedup import (
    _cap_buckets_reported,
    _pin,
    connected_components,
)
from schemasaurus_spark.operators.similarity import (
    IVF_MAX_LIST,
    IvfIndex,
    _dot,
    _norm,
    _scored_centroids,
    _with_centroid_array,
    _CENTS_COL,
    build_ivf_index,
)

SEMDEDUP_TARGET_LIST = 64


def derive_semdedup_n_list(corpus_size: int | None, target: int = SEMDEDUP_TARGET_LIST) -> int:
    """Cell count that keeps expected cell size ~``target`` regardless of
    n (pairs stay linear), capped by the driver-side centroid budget."""
    if corpus_size is None or corpus_size <= 0:
        return 1
    return max(1, min(IVF_MAX_LIST, math.ceil(corpus_size / target)))


def _assigned_with_sim(
    df: DataFrame, index: IvfIndex, id_col: str, vec_col: str
) -> DataFrame:
    """(id, vec, list_id, centroid_sim): nearest-centroid assignment that
    KEEPS the winning cosine (assign_ivf_lists discards it, and the
    keep-rule needs it).  Same zero-shuffle broadcast-data array_max
    fold; ties break to the smallest list id via the (sim, -list_id)
    struct max."""
    best = F.array_max(_scored_centroids(F.col(vec_col), F.col(_CENTS_COL)))
    return (
        _with_centroid_array(df, index)
        .withColumn("_best", best)
        .select(
            F.col(id_col),
            F.col(vec_col),
            (-F.col("_best.neg_list_id")).alias("list_id"),
            F.col("_best.sim").alias("centroid_sim"),
        )
    )


def semantic_dup_members(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    index: IvfIndex | None = None,
    n_list: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    list_cap: int | None = 5000,
    corpus_size: int | None = None,
    kmeans_iters: int = 0,
    report_out: dict | None = None,
) -> DataFrame:
    """(id, comp_id, centroid_sim, keep) for every member of a semantic
    duplicate component.

    ``keep`` marks the component's survivor: rank 1 by
    (round(centroid_sim, 6) ASC, id ASC) — the SemDeDup low-centroid-
    similarity rule with a deterministic tie-break.  Cells over
    ``list_cap`` members are excluded from pairing entirely, counted
    into ``report_out`` / logged via the Observation rider (never
    silent).  ``centroid_sim`` is rounded to 6 decimals in the output."""
    base = df.select(F.col(id_col), F.col(vec_col)).where(_norm(F.col(vec_col)) > 0)
    if index is None:
        if corpus_size is None:
            corpus_size = base.count()
        if n_list is None:
            n_list = derive_semdedup_n_list(corpus_size)
        index = build_ivf_index(
            base,
            dim,
            n_list=n_list,
            id_col=id_col,
            vec_col=vec_col,
            corpus_size=corpus_size,
            kmeans_iters=kmeans_iters,
        )
    assigned = _pin(_assigned_with_sim(base, index, id_col, vec_col))
    paired = _cap_buckets_reported(
        assigned, ["list_id"], list_cap, report_out, "semdedup"
    )
    left = paired.select(
        F.col("list_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        _norm(F.col(vec_col)).alias("norm_a"),
    )
    right = paired.select(
        F.col("list_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        _norm(F.col(vec_col)).alias("norm_b"),
    )
    pairs = (
        left.join(right, "list_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("similarity"),
        )
        .where(F.col("similarity") >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )
    comps = connected_components(pairs)
    w = Window.partitionBy("comp_id").orderBy(
        F.round(F.col("centroid_sim"), 6).asc(), F.col(id_col).asc()
    )
    return (
        comps.withColumnRenamed("id", id_col)
        .join(assigned.select(id_col, "centroid_sim"), id_col)
        .withColumn("keep", F.row_number().over(w) == 1)
        .select(
            id_col,
            "comp_id",
            F.round("centroid_sim", 6).alias("centroid_sim"),
            "keep",
        )
    )


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """The applied filter: the input minus every non-surviving duplicate
    (left-anti join on the dropped id set, which is dup-sized — tiny
    relative to the corpus — so AQE broadcasts it).  Zero-norm rows are
    NOT dropped (they never entered the comparison; upstream validation
    owns that verdict)."""
    members = semantic_dup_members(
        df, dim, threshold=threshold, id_col=id_col, vec_col=vec_col, **kwargs
    )
    dropped = members.where(~F.col("keep")).select(id_col)
    return df.join(dropped, id_col, "left_anti")
