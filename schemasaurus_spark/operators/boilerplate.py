"""Inter-document boilerplate line removal — the CCNet / RefinedWeb
curation step that drops lines repeated across many documents of the
same SOURCE (navigation menus, cookie banners, footers, "subscribe"
prompts): a line whose normalized form appears in at least ``min_docs``
documents and in at least ``min_pct`` percent of the source's documents
is boilerplate and is removed from every document; unique content stays.

This is the *inter-document* complement of the two existing repetition
operators: operators/repetition.py scores n-gram repetition WITHIN one
document (Gopher rules) and operators/substring_dedup.py removes
verbatim token windows repeated anywhere in the corpus (Lee et al.
2022).  Boilerplate is different: a nav line is short (often below the
substring window), appears once per document, and is only meaningful
relative to the document's SOURCE — exactly the per-shard repeated-
paragraph filter of CCNet (Wenzek et al. 2020, §4.1) and RefinedWeb
(Penedo et al. 2023, line-wise filtering).

No reference counterpart: /root/reference is a JSON-Schema walker; this
module extends the §2E training-data family it cannot express.

Semantics (all deterministic, engine-portable):
- Lines = ``split(text, '\\n')``; a line's identity is its NORMALIZED
  form: ``lower(regexp_replace(trim(line), '\\s+', ' '))``.  Lines that
  normalize to '' are ignored entirely (never counted, never emitted).
- Document frequency is per (source, normalized line), counted as
  DISTINCT documents — a doc repeating its own footer 10x contributes 1.
- The share threshold is exact integer arithmetic:
  ``n_docs * 100 >= min_pct * n_source_docs`` — no float division, so
  any SQL engine replays the verdict bit-for-bit.
- ``n_source_docs`` counts the source's documents that contributed at
  least one non-empty line (self-contained: derived from the same line
  frame, no second scan of the input).
- Removal keeps the RAW line text (only matching is normalized) and
  reassembles surviving lines in original order joined by '\\n'.

Scale shape (10^12 docs): the line frame is a single posexplode
projection, linear in corpus lines and thin (id, source, pos, line,
norm).  Document frequency is one ``groupBy(source, norm)`` with
``countDistinct(id)`` — Catalyst expands it to the two-phase
partial-distinct plan, so the shuffle carries one row per distinct
(source, norm, id), map-side combined.  The per-source doc count is a
source-keyed aggregate whose output is |sources| rows.  The boilerplate
set is bounded by lines that clear the min_docs/min_pct bar — tiny
relative to the corpus (that is what makes them boilerplate), so AQE
converts the tag join to a broadcast at runtime; the final reassembly
is ONE groupBy on the document id (documents are bounded-size, so
partitions stay balanced).  No Python runs anywhere.

Requires unique document ids (the engine's uniqueness operator is the
upstream gate); duplicate ids would merge their lines at reassembly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.dedup import _pin


def _raw_line_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(id, source, pos, line, norm) for every split line, INCLUDING
    empty-normalizing ones (every non-NULL text yields >= 1 row, so the
    frame also carries the document universe).

    ``pos`` is the 0-based line index in the ORIGINAL split, so
    surviving-line order is the document's true line order."""
    lines = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    norm = F.lower(F.regexp_replace(F.trim(F.col("line")), r"\s+", " "))
    return lines.withColumn("norm", norm)


def _line_frame(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Non-empty normalized lines only (the comparison universe)."""
    return _raw_line_frame(df, text_col, id_col, source_col).where(
        F.col("norm") != ""
    )


def _profile_from_lines(
    lines: DataFrame, id_col: str, min_docs: int, min_pct: int
) -> DataFrame:
    """Boilerplate profile from a prebuilt non-empty line frame — shared
    by the audit view and the removal pass so the removal can feed both
    consumers from ONE pinned scan."""
    src_docs = lines.groupBy("source").agg(
        F.countDistinct(id_col).alias("n_source_docs")
    )
    freq = lines.groupBy("source", "norm").agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    return (
        freq.join(src_docs, "source")
        .where(
            (F.col("n_docs") >= F.lit(int(min_docs)))
            & (F.col("n_docs") * 100 >= F.lit(int(min_pct)) * F.col("n_source_docs"))
        )
        .select(
            "source",
            F.col("norm").alias("line_norm"),
            "n_docs",
            "n_source_docs",
        )
    )


def boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_docs: int = 2,
    min_pct: int = 50,
) -> DataFrame:
    """Per-source boilerplate line profile.

    Returns ``(source, line_norm, n_docs, n_source_docs)`` for every
    normalized line present in >= ``min_docs`` distinct documents AND in
    >= ``min_pct`` percent of the source's line-contributing documents
    (exact integer compare, see module doc).  This is the audit view —
    what WOULD be removed and how widespread it is."""
    return _profile_from_lines(
        _line_frame(df, text_col, id_col, source_col), id_col, min_docs, min_pct
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_docs: int = 2,
    min_pct: int = 50,
) -> DataFrame:
    """Apply the profile: drop every boilerplate line, keep the rest.

    Output: ``(id, n_lines, n_kept, clean_text)`` for every document
    with non-NULL text — ``n_lines`` counts its non-empty normalized
    lines, ``clean_text`` is the '\\n'-join of surviving RAW lines in
    original order ('' when everything was boilerplate or the document
    had no non-empty line, so the caller decides whether to drop it).

    One extra shuffle beyond the profile: the line frame left-joins the
    (small, AQE-broadcast) boilerplate set on (source, norm), then a
    single groupBy on the document id rebuilds the text — the
    conditional ``collect_list(when(keep, struct(pos, line)))`` skips
    NULLs, so kept lines and counts come out of the same aggregate.

    The raw line frame is pinned (dedup._pin LRU) and feeds all four
    consumers — profile frequency, per-source doc counts, the tag join,
    and the document universe — so the corpus is scanned ONCE, not 4x
    (plan audit: 4 FileScans -> 1 before/after)."""
    raw = _pin(_raw_line_frame(df, text_col, id_col, source_col))
    lines = raw.where(F.col("norm") != "")
    bp = _profile_from_lines(lines, id_col, min_docs, min_pct).select(
        "source", F.col("line_norm").alias("norm"), F.lit(True).alias("_bp")
    )
    tagged = lines.join(bp, ["source", "norm"], "left").withColumn(
        "_keep", F.col("_bp").isNull()
    )
    kept_struct = F.when(
        F.col("_keep"), F.struct(F.col("pos").alias("p"), F.col("line").alias("l"))
    )
    agg = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.array_sort(F.collect_list(kept_struct)).alias("_kept"),
    )
    out = agg.select(
        id_col,
        "n_lines",
        F.size("_kept").alias("n_kept"),
        F.concat_ws(
            "\n", F.transform("_kept", lambda s: s["l"])
        ).alias("clean_text"),
    )
    # every non-NULL text yields >= 1 raw line row, so the pinned frame
    # already carries the full document universe — no second corpus scan
    base = raw.select(F.col(id_col)).distinct()
    return base.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
