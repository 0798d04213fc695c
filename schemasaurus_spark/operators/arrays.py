"""Shared exact in-array algorithms for broadcast-set membership.

``sorted_array_contains`` is the engine's answer to "probe a broadcast
set from inside an array lambda without a shuffle": Spark's
``array_contains`` is a linear scan, which silently turns any
corpus-scale pass probing a corpus-DERIVED set (boilerplate profiles,
vocabularies) into O(rows x set).  See the function docstring for the
fixed-depth-fold construction; span_boilerplate.py documents the
measured blowup that motivated it.

No reference counterpart (engine-internal utility).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["sorted_array_contains"]

# fixed binary-search depth: 2^40 elements is far beyond any broadcastable
# array, so 40 halvings always converge
_BSEARCH_STEPS = 40


def sorted_array_contains(arr: Column, key: Column) -> Column:
    """EXACT membership in a SORTED array in O(log n) per probe.

    ``array_contains`` scans linearly — fine for a fixed catalog, a
    scale-killer when the array grows with the corpus (measured here:
    the boilerplate profile grows super-linearly on repetitive corpora,
    turning removal into O(spans x profile); the x2->x4 ladder rung ran
    at exponent 1.58 before this fix).  Spark has no binary-search
    expression, but ``element_at`` is O(1) on ArrayData, so a
    FIXED-DEPTH fold over 40 halving steps (data-independent — loops
    cannot be value-dependent in expressions; 2^40 exceeds any
    broadcast) IS an exact binary search, whole-stage-codegen'd, still
    zero-shuffle.  NULL key or NULL/empty array -> false.
    """
    n = F.size(arr)

    def step(acc: Column, _i: Column) -> Column:
        lo, hi, found = acc["lo"], acc["hi"], acc["found"]
        live = ~found & (lo <= hi)
        mid = F.floor((lo + hi) / 2).cast("int")
        v = F.element_at(arr, mid)
        return F.when(~live, acc).otherwise(
            F.struct(
                F.when(v < key, mid + 1).otherwise(lo).alias("lo"),
                F.when(v > key, mid - 1).otherwise(hi).alias("hi"),
                (v == key).alias("found"),
            )
        )

    init = F.struct(
        F.lit(1).cast("int").alias("lo"),
        n.cast("int").alias("hi"),
        F.lit(False).alias("found"),
    )
    result = F.aggregate(
        F.sequence(F.lit(1), F.lit(_BSEARCH_STEPS)),
        init,
        step,
        lambda acc: acc["found"],
    )
    return F.when(key.isNull() | n.isNull() | (n <= 0), F.lit(False)).otherwise(
        result
    )
