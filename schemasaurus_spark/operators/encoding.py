"""Unicode script + encoding-corruption (mojibake) profile.

Web-scale text corpora arrive with wrong charset declarations, double
UTF-8 encodes and lossy transcodes; a training pipeline needs to (a)
know which SCRIPT a document is actually written in (the lang column
lies exactly when the encoding broke) and (b) flag the three classic
corruption artifacts before they poison the tokenizer:

* U+FFFD replacement characters (a decoder already gave up),
* C1 control chars U+0080-U+009F (latin-1/cp1252 confusion — these are
  unassigned in cp1252 text and never legitimate in prose),
* UTF-8-read-as-latin-1 lead/continuation pairs ("Ã©" for é, "â€™" for
  ’): a char in {Â Ã â} immediately followed by a char in
  U+0080-U+00BF.

Counting discipline: every count is the length delta of a
``regexp_replace`` with an explicit-codepoint character class (no
``\\p{Script=...}`` — Java and RE2 disagree on property names; literal
BMP ranges behave identically in both engines), so a DuckDB oracle
replays every number bit-for-bit (remember the ``'g'`` flag).  The
dominant script is an exact integer argmax with a FIXED precedence
order for ties (latin, cyrillic, greek, arabic, hebrew, cjk, hangul,
devanagari); purity is basis points by integer division.

Scale shape: ZERO shuffles — the whole profile is one
embarrassingly-parallel projection scan of scalar JVM regex
expressions; at 10^12 docs it is gated only by scan bandwidth.
Duplicate doc_ids stay separate physical rows (everything is
row-local).  NULL text profiles as empty: zero counts, dominant
'none'.

No reference counterpart: schemasaurus validates schema keywords over
parsed JSON; script/encoding forensics on the text payload is
engine-original curation machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["SCRIPT_RANGES", "script_profile"]

# (name, regex char-class of literal BMP codepoints) — order IS the
# deterministic tie-break precedence for dominant_script.
SCRIPT_RANGES: list[tuple[str, str]] = [
    ("latin", "[A-Za-zÀ-ÿ]"),
    ("cyrillic", "[Ѐ-ӿ]"),
    ("greek", "[Ͱ-Ͽ]"),
    ("arabic", "[؀-ۿ]"),
    ("hebrew", "[֐-׿]"),
    ("cjk", "[一-鿿]"),
    ("hangul", "[가-힯]"),
    ("devanagari", "[ऀ-ॿ]"),
]

_REPLACEMENT = "[�]"
_C1 = "[-]"
_MOJIBAKE_PAIR = "[ÂÃâ][-¿]"


def _removed(t: Column, pattern: str) -> Column:
    """Characters matched (and removed) by the class — exact, engine-
    portable: length(t) - length(regexp_replace(t, pattern, ''))."""
    return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))).cast(
        "long"
    )


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per PHYSICAL input row:

    ``(doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_arabic,
    n_hebrew, n_cjk, n_hangul, n_devanagari, n_replacement, n_c1,
    n_mojibake_pairs, dominant_script, script_purity_bp)``

    * ``n_chars``: total characters (NULL text -> 0).
    * per-script counts: characters inside each literal BMP range.
    * ``n_mojibake_pairs``: non-overlapping UTF-8-as-latin-1 artifact
      pairs (2 chars each; count = removed_chars / 2).
    * ``dominant_script``: argmax of the script counts, ties broken by
      SCRIPT_RANGES order; 'none' when every count is zero.
    * ``script_purity_bp``: dominant / sum-of-script-counts in basis
      points (exact integer division), 0 when 'none'.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {name: _removed(t, pat) for name, pat in SCRIPT_RANGES}
    g = F.greatest(*counts.values())
    total = None
    for c in counts.values():
        total = c if total is None else total + c

    dominant = F.when(g <= 0, F.lit("none"))
    for name, _ in SCRIPT_RANGES:
        dominant = dominant.when(counts[name] == g, F.lit(name))

    # exact integer floor division: (a - a % b) is divisible by b, so the
    # double division is exact far past any real text length (< 2^53).
    a = g * 10000
    purity = (
        F.when(g <= 0, F.lit(0).cast("long"))
        .otherwise(((a - (a % total)) / total).cast("long"))
        .alias("script_purity_bp")
    )

    cols = [
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
    ]
    cols += [counts[name].alias(f"n_{name}") for name, _ in SCRIPT_RANGES]
    cols += [
        _removed(t, _REPLACEMENT).alias("n_replacement"),
        _removed(t, _C1).alias("n_c1"),
        (_removed(t, _MOJIBAKE_PAIR) / 2).cast("long").alias(
            "n_mojibake_pairs"
        ),
        dominant.alias("dominant_script"),
        purity,
    ]
    return df.select(*cols)
