"""k-core decomposition (given k): the maximal subgraph in which every
node keeps degree >= k — the graph family's robust-density primitive.

Where triangles/clustering measure LOCAL cohesion and PageRank measures
global authority, the k-core answers "which part of the graph survives
when the fringe is stripped": link-spam farms engineer high degree and
even triangles, but a k-core membership cannot be faked by adding
pendant edges — every member needs k neighbors that THEMSELVES survive.
(Standard peeling semantics: Seidman '83, the parallel peel used by
every distributed graph library.)

Algorithm: iterated peeling to the fixed point.  Each round is two
map-side-combined keyed aggregates + two semi-joins, all keyed on node
id — no neighbor lists are ever collected onto one reducer, so a
power-law hub costs its degree in shuffle rows, never a hot task.
Rounds are data-bounded (the peel cascade depth, O(graph diameter) in
the worst case — a dangling path peels one node per round); each round
``localCheckpoint``s to truncate the exponentially-referencing lineage
(the connected_components discipline, dedup.py) and convergence is
detected by an edge-count + order-independent checksum pair, one tiny
aggregate per round.

Input: directed/multi edge list — canonicalized here to an undirected
simple graph (self-loops dropped, duplicates and reversals collapsed),
so callers may feed raw link tables.  Output: ``(id, degree)`` of the
surviving core, degree measured inside the core.

No reference counterpart (engine-original graph machinery, like
rank.py / triangles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_core"]


def _und(edges: DataFrame) -> DataFrame:
    return edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    id_a: str = "src",
    id_b: str = "dst",
    max_iter: int = 1000,
    report_out: dict | None = None,
) -> DataFrame:
    """Nodes of the k-core with their in-core degrees: ``(id, degree)``.

    ``report_out['kcore_rounds']`` records the peel depth.  ``max_iter``
    is a runaway bound far above any real cascade; hitting it raises
    rather than returning a half-peeled graph."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = _sig(e)
    rounds = 0
    for rounds in range(0, max_iter + 1):
        deg = _und(e).groupBy("u").agg(F.count(F.lit(1)).alias("_d"))
        keep = deg.where(F.col("_d") >= k).select("u")
        nxt = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        sig = _sig(nxt)
        e = nxt
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"k_core did not converge in {max_iter} rounds")
    if report_out is not None:
        report_out["kcore_rounds"] = rounds
    return (
        _und(e)
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("u").alias("id"), "degree")
    )
