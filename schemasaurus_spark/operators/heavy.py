"""Heavy hitters over an unbounded key domain: every item with frequency
strictly above ``n/k``, with its EXACT count — Misra-Gries candidate
sketching plus an exact verify pass.

Why not a plain ``groupBy(col).count()``: partial aggregation keeps that
cheap only while the per-partition distinct-key state fits memory.  Over
an unbounded domain (URLs, n-grams, user agents, join keys being probed
for skew) the partial-agg hash map is itself corpus-sized.  Misra-Gries
(Misra & Gries '82; merge analysis Agarwal et al. PODS'12) bounds the
per-partition state at ``k - 1`` counters REGARDLESS of the domain, at
the cost of undercounting — which the verify pass then repairs exactly.

Exactness argument:
* MG invariant per partition p: any item with local frequency
  ``f_p > n_p / k`` still holds a positive counter when the partition
  ends (total decrement mass is <= n_p / k per item).
* Pigeonhole across partitions: a GLOBAL heavy hitter
  (``f > n/k = sum(n_p)/k``) must satisfy ``f_p > n_p/k`` in at least
  one partition — otherwise summing the per-partition bounds caps f at
  n/k.  So the union of per-partition candidate sets is a SUPERSET of
  the true heavy hitters.
* The verify pass semi-joins the corpus against the (metadata-sized,
  broadcast) candidate set and counts exactly; false candidates fall to
  the threshold filter.  Output = exactly the true heavy hitters.

Scale shape: two scans.  Scan 1 runs the MG kernel in ``mapInPandas``
(Arrow batches, per-batch ``value_counts`` merged into the bounded
state — no per-row Python) and emits ``<= partitions * (k-1)``
candidate rows plus one per-partition total row (the corpus count rides
the same pass; no third scan).  Scan 2 is a broadcast semi-join plus a
map-side-combined count: the exchange carries at most
``partitions * |candidates|`` partial rows, never raw occurrences.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _pin

__all__ = ["heavy_hitters"]


def _mg_kernel(k: int):
    cap = k - 1

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        state: dict[str, int] = {}
        total = 0
        for pdf in batches:
            vc = pdf["tok"].value_counts()
            total += int(vc.sum())
            for tok, c in vc.items():
                state[tok] = state.get(tok, 0) + int(c)
            if len(state) > cap:
                # batched MG trim: subtract the k-th largest counter from
                # everything; survivors (strictly greater) number <= k-1,
                # and the removed mass is >= m*k, so the per-item
                # undercount stays bounded by n_p/k
                m = sorted(state.values(), reverse=True)[cap]
                state = {t: c - m for t, c in state.items() if c > m}
        rows = [(t, c) for t, c in state.items()]
        rows.append((None, total))  # per-partition total rides along
        yield pd.DataFrame(rows, columns=["tok", "n"])

    return kernel


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """``(item, cnt)`` for every value of ``col`` occurring strictly more
    than ``count(*) / k`` times — exact counts, exact membership (see
    module doc).  NULLs are excluded (NULL is a missing value, not an
    item).  ``k >= 2``."""
    if k < 2:
        raise ValueError("heavy_hitters: k must be >= 2")
    toks = df.where(F.col(col).isNotNull()).select(
        F.col(col).cast("string").alias("tok")
    )
    # candidates and the corpus total come out of the same single pass;
    # pinned (metadata-sized: <= partitions * k rows) because both the
    # candidate set and the total read it — unpinned via pin_scope
    sketch = _pin(toks.mapInPandas(_mg_kernel(k), schema="tok string, n long"))
    cands = sketch.where(F.col("tok").isNotNull()).select("tok").distinct()
    totals = sketch.where(F.col("tok").isNull()).select(
        F.sum("n").alias("_n_total")
    )
    counts = (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .where(F.col("cnt") * k > F.col("_n_total"))
        .select(F.col("tok").alias("item"), F.col("cnt").cast("long").alias("cnt"))
    )
