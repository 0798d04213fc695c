"""BM25 keyword retrieval over the corpus tokenization.

The retrieval question a curation pipeline asks ("which documents match
this probe query" — targeted inspection, contamination triage, eval-set
mining) answered corpus-side with classic Okapi BM25 (Robertson &
Spärck Jones lineage; the formula is the public SPECIFICATION — this is
not a port of any engine):

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d, t) = idf(t) · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Shape at 10^12 docs (no inverted index required — one corpus pass):

* the token explode is FILTERED to the query terms *before* anything
  shuffles, so the exchange carries only query-term occurrences
  (O(matches), not O(tokens)); the per-(doc, term) ``tf`` groupBy
  map-side-combines within partitions;
* corpus stats (N, avgdl) ride a 1-row aggregate joined back via
  broadcast — metadata, never a driver round-trip inside the plan;
* per-term document frequencies are a term-count aggregate over the
  already-tiny tf frame, broadcast back (|terms| rows);
* top-k per term is a rank window partitioned by term — Spark rewrites
  the ``rank <= k`` filter into WindowGroupLimit, so partitions carry
  k-row heads, never full per-term score lists.

Cross-engine determinism: tf/dl/df/N are integers, avgdl is an exact
integer-sum division, and the score arithmetic is written with the SAME
literal constants and operation order the oracle SQL uses — the one
function whose last-ulp behavior is libm-dependent (``ln``) is a
per-term CONSTANT, so it can never reorder documents within a term.
Ties break on doc_id.  The multi-term SUMMED ranking
(``bm25_topk``) adds cross-term float summation whose order is
engine-private, so it is pytest-verified against a brute-force
reference instead of carrying a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from schemasaurus_spark.operators.tokenize import tokenized

__all__ = ["bm25_term_scores", "bm25_topk_per_term", "bm25_topk", "bm25_oracle_sql"]


def _score_expr(k1: float, b: float):
    """score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with the
    constants pre-folded in Python so the oracle can embed their exact
    ``repr`` — both engines then evaluate bit-identical arithmetic."""
    c_k1p1 = k1 + 1.0
    c_1mb = 1.0 - b
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_docs") + F.lit(0.5))
        / (F.col("df_docs") + F.lit(0.5))
    )
    return idf * (
        (F.col("tf") * F.lit(c_k1p1))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(c_1mb) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )


def bm25_term_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(doc, term) BM25 contributions for ``query_terms``:
    ``(term, doc_id, tf, dl, df_docs, score)`` — docs with tf=0 for a
    term are absent (they contribute nothing and would be 10^12 rows)."""
    if not query_terms:
        raise ValueError("bm25: empty query_terms")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError(f"bm25: duplicate query terms in {query_terms}")
    toks = tokenized(df, text_col, id_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks"), F.size("_toks").alias("dl")
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        toks.select(
            "doc_id",
            "dl",
            # prune to query-term occurrences BEFORE the explode/shuffle
            F.explode(
                F.filter("_toks", lambda t: F.array_contains(terms, t))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(F.broadcast(stats))
        .withColumn("score", _score_expr(k1, b))
    )
    return scored.select("term", "doc_id", "tf", "dl", "df_docs", "score")


def bm25_topk_per_term(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k docs per query term by BM25, rank + rounded score; ordering
    uses the raw double (bit-identical across engines — module doc) with
    doc_id tie-break."""
    scored = bm25_term_scores(df, query_terms, k1, b, text_col, id_col)
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "term",
            "doc_id",
            "tf",
            "dl",
            "df_docs",
            F.round("score", round_digits).alias("score"),
            "rank",
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multi-term ranking: per-doc SUM of term scores (docs matching no
    term absent), top-k overall.  TakeOrdered path — no global sort."""
    scored = bm25_term_scores(df, query_terms, k1, b, text_col, id_col)
    agg = scored.groupBy("doc_id").agg(
        F.sum("score").alias("score"), F.count(F.lit(1)).alias("n_terms_matched")
    )
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    source: str = "documents",
) -> str:
    """DuckDB replay of ``bm25_topk_per_term`` — same literal constants
    (exact ``repr`` of the Python-folded doubles), same operation order."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    c_k1p1, c_1mb = repr(k1 + 1.0), repr(1.0 - b)
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM {source} WHERE text IS NOT NULL AND trim(text) <> ''
),
stats AS (SELECT count(*) AS n_docs, avg(len(t)) AS avgdl FROM toks),
tf AS (
  SELECT doc_id, len(t) AS dl, u.tok AS term, count(*) AS tf
  FROM toks, unnest(t) AS u(tok)
  WHERE u.tok IN ({terms})
  GROUP BY 1, 2, 3
),
dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
scored AS (
  SELECT tf.term, tf.doc_id, tf.tf, tf.dl, dfq.df_docs,
         ln(1.0 + (stats.n_docs - dfq.df_docs + 0.5) / (dfq.df_docs + 0.5))
           * ((tf.tf * {c_k1p1})
              / (tf.tf + {repr(k1)} * ({c_1mb} + {repr(b)} * tf.dl / stats.avgdl))) AS score
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT term, doc_id, tf, dl, df_docs, round(score, 6) AS score, rank
FROM ranked WHERE rank <= {int(k)}
"""
