"""Edit-distance similarity join: all pairs within Levenshtein distance
``max_dist``, exactly — the typo/OCR-level near-dup family the set-based
dedup operators (MinHash/SimHash/Jaccard: operators/dedup.py) cannot
express.  Two titles differing by one substituted character have char-
shingle Jaccard well below any useful threshold, yet are the same record
for curation purposes; conversely edit distance is meaningless on long
free text.  The operator therefore targets SHORT string keys — titles,
names, URLs, normalized identifiers — and pairs with the set-based
family rather than replacing it.

No reference counterpart (schemasaurus validates single values; string
similarity joins come from the north-rule engine's curation mandate).
Algorithm is the public Ed-Join / AllPairs adaptation (Gravano et al.
VLDB'01 q-gram filters; Xiao et al. VLDB'08 prefix filtering; Bayardo et
al. WWW'07 Lemma 1).

Exactness argument (the output provably equals the brute-force join):

* One edit destroys at most ``q`` of a string's positional q-grams, so
  ``ed(a, b) <= k`` implies the q-gram MULTISETS share at least
  ``max(n_a, n_b) - k*q`` occurrences.  Multiset elements are made
  set-like by occurrence numbering: the element universe is
  ``(gram, occ#-within-string)``, under which multiset intersection is
  plain set intersection and Bayardo's Lemma 1 applies verbatim.
* Under ANY global total order of that universe, two sets with overlap
  ``>= n_x - k*q`` must collide within their first ``k*q + 1`` elements
  (prefix filtering) — we order by global occurrence frequency
  ascending (rarest first), so hot grams ("e ", "th") sort LAST and
  never become join keys: the quadratic-in-document-frequency blowup of
  a naive shared-gram self-join never happens.
* The pigeonhole needs each side to own MORE than ``k*q`` grams to be
  forced into a prefix collision.  Strings with ``len <= q*(k+1) - 1``
  (i.e. ``n_grams <= k*q``) can lose every gram to k edits; only
  SHORT x SHORT pairs can evade the gram join (a short-vs-long pair is
  still caught: the long side keeps ``n_long - k*q >= 1`` grams, and the
  short side's prefix is its ENTIRE gram set, so Lemma 1 still bites).
  Those go through an explicit broadcast short-panel cross join —
  strings shorter than ``q*(k+1)`` characters are a metadata-sized
  sliver of any real corpus, and zero-gram strings (``len < q``) can
  only ever pair inside the panel (their partners are within ``k`` of
  their length, hence also short).
* Every candidate is verified with Spark's THRESHOLDED ``levenshtein``
  (JVM codegen, early-abandon O(k * len) banded DP — never the full
  O(len^2) table), so false candidates cost little and the result is
  exact by construction.

Scale shape: two map-side-combined aggregates (global gram frequency) +
two per-id windows sharing one id-keyed shuffle (rank and occurrence
numbering), a sparse prefix-prefix equi-join on ``(gram, occ)`` with the
length filter ``|len_a - len_b| <= k`` applied inside the join, and a
candidates-only verify join.  No step is quadratic in a gram's corpus
frequency; the verify ships two short strings per candidate row, not
gram arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["edit_distance_pairs"]


def _positional_grams(text_col: str, q: int):
    """Ordered positional q-grams of the RAW string (no normalization —
    edit distance is about the exact characters) as an array column;
    empty array when the string is shorter than q."""
    return F.expr(
        f"CASE WHEN length({text_col}) < {q} THEN array() "
        f"ELSE transform(sequence(1, length({text_col}) - {q} + 1), "
        f"i -> substring({text_col}, i, {q})) END"
    )


def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with ``id_a < id_b`` and
    ``levenshtein(text_a, text_b) <= max_dist`` — exact (see module doc
    for the no-false-negatives argument).  NULL strings are excluded
    (edit distance to NULL is undefined, not 0)."""
    if max_dist < 0:
        raise ValueError("edit_distance_pairs: max_dist must be >= 0")
    if q < 1:
        raise ValueError("edit_distance_pairs: q must be >= 1")
    k = int(max_dist)
    prefix_len = k * q + 1
    short_len = q * (k + 1) - 1

    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_s"),
        F.length(text_col).alias("_len"),
    )

    # ---- gram path: every string with at least one q-gram
    grams = base.where(F.col("_len") >= q).select(
        "_id",
        "_len",
        F.posexplode(_positional_grams("_s", q)).alias("_pos", "_g"),
    )
    # occurrence numbering makes the multiset a set over (_g, _occ):
    # the j-th "ab" of one string can only match the j-th "ab" of another
    # (ordered by string position, so the numbering is deterministic)
    occ_w = Window.partitionBy("_id", "_g").orderBy("_pos")
    occd = grams.withColumn("_occ", F.row_number().over(occ_w))
    # global rarity of each (gram, occ) element — ANY total order is
    # correct; rarest-first minimizes candidates (hot grams sort last and
    # fall outside every prefix)
    freq = occd.groupBy("_g", "_occ").agg(F.count(F.lit(1)).alias("_f"))
    rank_w = Window.partitionBy("_id").orderBy("_f", "_g", "_occ")
    prefix = (
        occd.join(freq, ["_g", "_occ"])
        .withColumn("_rk", F.row_number().over(rank_w))
        .where(F.col("_rk") <= prefix_len)
        .select("_id", "_len", "_g", "_occ")
    )
    pa = prefix.select(
        F.col("_id").alias("id_a"), F.col("_len").alias("_la"), "_g", "_occ"
    )
    pb = prefix.select(
        F.col("_id").alias("id_b"), F.col("_len").alias("_lb"), "_g", "_occ"
    )
    gram_cands = (
        pa.join(pb, ["_g", "_occ"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
        )
        .select("id_a", "id_b")
    )

    # ---- short panel: only SHORT x SHORT pairs can evade the gram join
    short = base.where(F.col("_len") <= short_len)
    sa = short.select(F.col("_id").alias("id_a"), F.col("_len").alias("_la"))
    sb = short.select(F.col("_id").alias("id_b"), F.col("_len").alias("_lb"))
    short_cands = sa.join(
        F.broadcast(sb),
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("_la") - F.col("_lb")) <= k),
    ).select("id_a", "id_b")

    cands = gram_cands.unionByName(short_cands).distinct()

    # ---- exact verify: thresholded levenshtein (early-abandon banded DP)
    strs_a = base.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    strs_b = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    dist = F.levenshtein("_sa", "_sb", k)
    return (
        cands.join(strs_a, "id_a")
        .join(strs_b, "id_b")
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
        .where(F.col("dist") >= 0)  # thresholded form returns -1 above k
    )
