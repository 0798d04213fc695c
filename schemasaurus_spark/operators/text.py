"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, n-gram/stopword language ID, document fingerprinting.

All pure ``pyspark.sql.functions`` Column builders (JVM-side, codegen'd) so
they compose into the same single-scan projection as the validator, and are
expressible 1:1 in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword lists per language (heuristic language ID)
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "en", "por", "que"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (empty/null-safe)."""
    t = F.trim(text)
    return F.when(
        text.isNull() | (t == ""), F.lit(0)
    ).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word chunks + digits + punctuation each
    count, long words count once per 6 chars (a cheap BPE proxy)."""
    words = F.split(F.trim(text), r"\s+")
    per_word = F.transform(
        words, lambda w: F.greatest(F.ceil(F.length(w) / 6.0), F.lit(1))
    )
    return F.when(text.isNull() | (F.trim(text) == ""), F.lit(0)).otherwise(
        F.aggregate(per_word, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9 \t\n\x0B\f\r]", "")
    return F.when(text.isNull() | (F.length(text) == 0), F.lit(0.0)).otherwise(
        F.length(stripped) / F.length(text)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    hits = F.size(
        F.filter(
            F.split(F.lower(text), r"\s+"),
            lambda w: w.isin(*words),
        )
    )
    return F.when(text.isNull() | (F.trim(text) == ""), F.lit(0.0)).otherwise(
        hits / token_count(text)
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, not punct-heavy,
    contains stopwords (natural language signal)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    score = (length_term + punct_term + stop_term) / 3.0
    return F.when(text.isNull(), F.lit(0.0)).otherwise(F.round(score, 4))


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over STOPWORDS; 'und' when no votes.

    Ties break by language code order (deterministic)."""
    lowered = F.split(F.lower(text), r"\s+")

    def votes(words: list[str]):
        # single-arity lambda on purpose: PySpark passes the element index to
        # 2-arity HOF lambdas, shadowing default args
        return F.size(F.filter(lowered, lambda w: w.isin(*words)))

    scores = [(code, votes(words)) for code, words in sorted(STOPWORDS.items())]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    for code, s in reversed(scores):  # earlier codes win ties
        out = F.when(s == best, F.lit(code)).otherwise(out)
    return F.when(text.isNull() | (best <= 0), F.lit("und")).otherwise(out)


def with_lang_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_guess") -> DataFrame:
    """DataFrame-level language ID: materializes the lowered word array and
    the per-language vote vector as intermediate columns, so the split runs
    once per row instead of once per (language x tie-break) expression copy
    — same verdicts as ``lang_id``, a fraction of the expression tree."""
    codes = sorted(STOPWORDS)
    step = df.withColumn("_words", F.split(F.lower(F.col(text_col)), r"\s+")).withColumn(
        "_votes",
        F.array(
            *[
                F.size(F.filter(F.col("_words"), lambda w: w.isin(*STOPWORDS[c])))
                for c in codes
            ]
        ),
    )
    best = F.array_max("_votes")
    out = F.lit("und")
    for idx, code in reversed(list(enumerate(codes))):  # earlier codes win ties
        out = F.when(F.col("_votes")[idx] == best, F.lit(code)).otherwise(out)
    out = F.when(F.col(text_col).isNull() | (best <= 0), F.lit("und")).otherwise(out)
    return step.withColumn(out_col, out).drop("_words", "_votes")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace/case-normalized
    text — the exact-dedup key (md5 so any SQL engine reproduces it)."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(norm)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-scan text-analysis projection over a documents table.

    Shared subtrees — the lowered word array, the punctuation strip, the
    token count — are materialized once as intermediate columns and every
    consumer expression references them, instead of each metric re-planning
    its own copy (the lang-ID vote/tie-break chain alone would duplicate
    the ``split(lower(text))`` subtree ~9x).  Outputs are identical to the
    standalone Column builders above."""
    t = F.col(text_col)
    codes = sorted(STOPWORDS)
    step = df.select(
        F.col(id_col),
        t.alias("_t"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subword_tokens"),
        F.length(F.regexp_replace(t, r"[A-Za-z0-9 \t\n\x0B\f\r]", "")).alias("_punct"),
        F.split(F.lower(t), r"\s+").alias("_words"),
        fingerprint(t).alias("fingerprint"),
    ).withColumn(
        "_votes",
        F.array(
            *[
                F.size(F.filter(F.col("_words"), lambda w: w.isin(*STOPWORDS[c])))
                for c in codes
            ]
        ),
    )
    t2 = F.col("_t")
    punct = F.when(t2.isNull() | (F.length(t2) == 0), F.lit(0.0)).otherwise(
        F.col("_punct") / F.length(t2)
    )
    stop_ratio = F.when(t2.isNull() | (F.trim(t2) == ""), F.lit(0.0)).otherwise(
        F.col("_votes")[codes.index("en")] / F.col("n_tokens")
    )
    length_term = F.least(F.length(t2) / F.lit(500.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct * 4, F.lit(1.0))
    stop_term = F.least(stop_ratio * 5, F.lit(1.0))
    quality = F.when(t2.isNull(), F.lit(0.0)).otherwise(
        F.round((length_term + punct_term + stop_term) / 3.0, 4)
    )
    best = F.array_max("_votes")
    lang = F.lit("und")
    for idx, code in reversed(list(enumerate(codes))):  # earlier codes win ties
        lang = F.when(F.col("_votes")[idx] == best, F.lit(code)).otherwise(lang)
    lang = F.when(t2.isNull() | (best <= 0), F.lit("und")).otherwise(lang)
    return step.select(
        id_col,
        "n_tokens",
        "n_subword_tokens",
        F.round(punct, 4).alias("punct_ratio"),
        quality.alias("quality"),
        lang.alias("lang_guess"),
        "fingerprint",
    )


def strip_markup(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """Web-corpus boilerplate cleaning: remove script/style blocks whole
    (their CONTENT is code, not text), drop remaining tags, decode the
    five core HTML entities, collapse the whitespace the removals leave
    behind — the minimal deterministic scrub a crawled corpus needs
    before tokenization (trafilatura-grade extraction is model/heuristic
    territory; this is the exact, replayable tier).

    Adds ``out_col`` plus ``n_tags`` (tags removed) so hollowed-out
    documents are filterable.  Pure ``regexp_replace``/``regexp_count``
    projection — map-only, codegen'd, zero shuffles, zero UDFs; patterns
    avoid lookarounds so Java regex and RE2-family engines agree
    byte-for-byte (the pii.py discipline).  Order matters and is fixed:
    blocks -> tags -> entities -> whitespace (entity decode LAST so a
    literal ``&lt;b&gt;`` in text cannot become a strippable tag)."""
    script_block = r"(?is)<script[^>]*>.*?</script\s*>"
    style_block = r"(?is)<style[^>]*>.*?</style\s*>"
    tags = r"(?s)<[^>]+>"
    t = F.col(text_col)
    n_tags = (
        F.coalesce(F.regexp_count(t, F.lit(tags)), F.lit(0)).cast("long")
    )
    cleaned = F.regexp_replace(t, script_block, " ")
    cleaned = F.regexp_replace(cleaned, style_block, " ")
    cleaned = F.regexp_replace(cleaned, tags, " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(ch))
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.withColumn("n_tags", n_tags).withColumn(out_col, cleaned)


def span_lang_profile(
    df: DataFrame, spans_col: str = "spans", id_col: str = "doc_id"
) -> DataFrame:
    """Code-switching profile over interleaved documents: run the
    stopword-vote language ID on EVERY text span and report, per
    document row, the majority language and how uniform the document is
    — ``(id, majority_lang, n_text_spans, n_und, n_minority)`` where
    ``n_minority`` counts identified spans disagreeing with the
    majority.  Doc-level language ID (``lang_id``) blends all spans into
    one vote and hides mixed-language documents; curation wants them
    FLAGGED (code-switched web pages are a known quality hazard, and a
    span-majority disagreement is also how a wrong doc-level ``lang``
    column gets caught).

    Majority = the most frequent per-span verdict EXCLUDING 'und'
    (unidentifiable spans shouldn't outvote identified ones), ties to
    the earliest language code — same tie discipline as ``lang_id``;
    'und' when no span identifies.  All counting + deterministic argmax.

    Scale shape: fully IN-ARRAY (transform over the spans array — one
    projection scan, ZERO shuffles, correct under duplicate doc_ids);
    the per-span vote vector is materialized once per span inside the
    lambda, so the expression tree stays linear in languages (the
    with_lang_id lesson)."""
    codes = sorted(STOPWORDS)
    spans = F.col(spans_col)

    def span_lang(s):
        words = F.split(F.lower(s["text"]), r"\s+")
        votes = F.array(
            *[
                F.size(F.filter(words, lambda w: w.isin(*STOPWORDS[c])))
                for c in codes
            ]
        )
        best = F.array_max(votes)
        out = F.lit("und")
        for idx, code in reversed(list(enumerate(codes))):
            out = F.when(votes[idx] == best, F.lit(code)).otherwise(out)
        return F.when(s["text"].isNull() | (best <= 0), F.lit("und")).otherwise(out)

    langs = F.transform(
        F.filter(spans, lambda s: s["kind"] == "text"), span_lang
    )
    # closure factory, NOT a default-arg lambda: a 2-arity HOF lambda
    # would receive the element INDEX as its second argument (the
    # with_lang_id / lang_id gotcha above)
    def _eq(code):
        return lambda x: x == code

    counts = [(c, F.size(F.filter(langs, _eq(c)))) for c in codes]
    best_n = F.greatest(*[n for _, n in counts])
    majority = F.lit("und")
    for c, n in reversed(counts):
        majority = F.when(n == best_n, F.lit(c)).otherwise(majority)
    majority = F.when(langs.isNull() | (best_n <= 0), F.lit("und")).otherwise(
        majority
    )
    out = df.select(
        F.col(id_col),
        majority.alias("majority_lang"),
        F.coalesce(F.size(langs), F.lit(0)).alias("n_text_spans"),
        F.coalesce(
            F.size(F.filter(langs, lambda x: x == "und")), F.lit(0)
        ).alias("n_und"),
        F.coalesce(
            F.size(
                F.filter(
                    langs,
                    lambda x: (x != "und") & (x != majority),
                )
            ),
            F.lit(0),
        ).alias("n_minority"),
    )
    return out


def readability_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Flesch reading-ease profile — the classic prose-difficulty signal
    quality filters stack next to stopword/punctuation ratios (very low
    scores flag legalese/gibberish, impossibly high ones flag
    word-salad).  One row per PHYSICAL row:

    ``(doc_id, n_words, n_sentences, n_syllables, flesch_x100)``

    * words: whitespace tokens of lower(trim(text));
    * syllables: maximal ``[aeiouy]`` runs per word, minimum 1 (the
      standard heuristic — exact counting needs a dictionary), counted
      by the two-regexp_replace length-delta trick (runs collapsed to
      one char vs removed entirely);
    * sentences: maximal ``[.!?]`` runs in the text, minimum 1 when any
      words exist;
    * ``flesch_x100``: the Flesch formula 206.835 - 1.015*(W/S) -
      84.6*(SYL/W) quantized to ``floor(x*100 + 0.5)`` int64.  The
      float expression is written ONCE with fixed parenthesization, so
      DuckDB replays it bit-for-bit (IEEE doubles, identical op order);
      NULL for wordless docs.

    Scale shape: ZERO shuffles — in-array transform + aggregate over
    one projection scan; duplicate doc_ids stay separate rows.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    empty = F.trim(t) == ""
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = F.when(empty, F.lit(0)).otherwise(F.size(words)).cast("long")

    def runs(col: Column, klass: str) -> Column:
        collapsed = F.regexp_replace(col, klass, "V")
        removed = F.regexp_replace(col, klass, "")
        return F.length(collapsed) - F.length(removed)

    syl = F.when(empty, F.lit(0)).otherwise(
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.greatest(runs(w, "[aeiouy]+"), F.lit(1)).cast("long"),
        )
    ).cast("long")
    sent = F.when(
        n_words <= 0, F.lit(0)
    ).otherwise(F.greatest(runs(t, "[.!?]+"), F.lit(1))).cast("long")

    w_d = n_words.cast("double")
    s_d = sent.cast("double")
    syl_d = syl.cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * (w_d / s_d) - F.lit(84.6) * (
        syl_d / w_d
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        sent.alias("n_sentences"),
        syl.alias("n_syllables"),
        F.when(n_words <= 0, F.lit(None).cast("long"))
        .otherwise(F.floor(flesch * F.lit(100.0) + F.lit(0.5)).cast("long"))
        .alias("flesch_x100"),
    )
