"""Exact triangle counting + local clustering coefficients on the host
link graph — the graph family's cohesion measure next to PageRank
(authority), connected components (reachability) and label propagation
(communities).

Why curation cares: link farms and mirror rings show up as abnormally
DENSE neighborhoods (clustering coefficient near 1 at high degree),
while legitimate hubs are sparse (high degree, low clustering); the
coefficient separates the two where raw degree and PageRank cannot.

Algorithm — compact-forward / degree-ordered orientation (Schank &
Wagner '05; Latapy TCS'08), entirely as joins:

1. canonicalize to an undirected SIMPLE graph (self-loops dropped,
   (least, greatest) distinct);
2. orient every edge from its (degree, node)-lexicographically smaller
   endpoint to the larger (ties impossible across distinct nodes — the
   node id breaks them), comparing (degree, node) STRUCTS directly —
   no global row_number window, which would funnel the node table
   through one task;
3. wedges: self-join the oriented edges on the source, keeping one
   direction of each out-neighbor pair by the same struct order;
4. a wedge (v, w) closes iff the oriented edge v->w exists (it can
   only be oriented that way) — one more join.  Every triangle is
   counted EXACTLY once, at its lowest-ranked vertex.

Scale shape: the orientation bounds every node's out-degree by
O(sqrt(m)) amortized (the classic compact-forward bound), so the wedge
join materializes O(m^1.5) rows worst-case instead of sum(d^2) — hub
nodes (the web's power law) never explode, because hubs rank HIGHEST
and therefore receive edges instead of emitting wedge pairs.  All
joins are keyed equi-joins (AQE handles residual skew); all arithmetic
integer; clustering is exact basis points 2*T*10000 DIV (d*(d-1)).

No reference counterpart (engine-original graph machinery,
SURVEY §2E graph family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_stats"]


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node ``(host, degree, n_triangles, clustering_bp)`` over the
    undirected simple graph induced by the edge list (direction and
    multiplicity ignored; self-loops dropped).  Nodes of degree < 2
    report clustering 0."""
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("deg_b")
    )
    with_deg = canon.join(da, "a").join(db, "b")
    ra = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n"))
    oriented = with_deg.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ra < rb, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "deg_v"
        ),
    )
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("deg_v").alias("d1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("deg_v").alias("d2"))
    wedges = e1.join(e2, "u").where(
        F.struct(F.col("d1").alias("d"), F.col("v1").alias("n"))
        < F.struct(F.col("d2").alias("d"), F.col("v2").alias("n"))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    per_node = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    d = F.col("degree")
    num = F.col("n_triangles") * 2 * 10000
    denom = d * (d - 1)
    return (
        deg.join(per_node, "node", "left")
        .select(
            F.col("node").alias("host"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
        )
        .select(
            "host",
            "degree",
            "n_triangles",
            F.when(d < 2, F.lit(0).cast("long"))
            .otherwise(
                (
                    (
                        (F.col("n_triangles") * 2 * 10000)
                        - ((F.col("n_triangles") * 2 * 10000) % (d * (d - 1)))
                    )
                    / (d * (d - 1))
                ).cast("long")
            )
            .alias("clustering_bp"),
        )
    )
