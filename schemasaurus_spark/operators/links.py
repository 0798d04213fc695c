"""Hyperlink extraction + host-level link-graph construction — the step
that turns a raw web corpus into the graph ``rank.pagerank_fixed_point``
scores (the quality-prior input of curation recipes: Common-Crawl-style
pipelines rank hosts by link authority before per-document filtering).

No reference counterpart (SURVEY.md §2E training-data mandate); the URL
grammar is RFC 3986, shared with operators/urls.py.

* ``extract_links``: absolute http(s) URLs pulled from document text
  with ONE lookaround/backreference-free regex, so Java regex and RE2
  (the DuckDB oracle) agree byte-for-byte — map-only projection +
  explode, zero UDFs.
* ``host_link_graph``: (src, dst_host, n_links) edges — source keyed by
  any per-document column (its own host, or the corpus ``source``
  label), destination the canonical host (``urls.url_host``: lowercase,
  www./default-port stripped).  One scan, one map-side-combined groupBy;
  the edge table is host-domain-sized, never corpus-sized, and feeds
  ``pagerank_fixed_point`` directly.

Scale shape at 10^12 documents: extraction is a scan-stage projection;
the only shuffle carries (src, host) pairs already combined map-side, so
the exchange is bounded by |hosts|² per partition in the worst case and
in practice by the Zipf head of the link graph.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schemasaurus_spark.operators.urls import url_host

# one absolute-URL token: scheme, then everything up to whitespace or a
# character that ends an href/markup context
URL_RE = r'[Hh][Tt][Tt][Pp][Ss]?://[^\s"<>]+'


def extract_links(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, url) — one row per absolute http(s) URL occurrence in the
    text, in-document order lost (set semantics come from the caller's
    aggregation).  NULL texts yield no rows."""
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
        ).alias("url"),
    )


def host_link_graph(
    df: DataFrame,
    src_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(src, dst, n_links) host-level edge list: every URL occurrence in
    a document adds one link from the document's ``src_col`` to the
    URL's canonical host.  Self-loops are kept (``pagerank_fixed_point``
    drops them itself); URLs without a parseable host are dropped."""
    links = df.where(
        F.col(text_col).isNotNull() & F.col(src_col).isNotNull()
    ).select(
        F.col(src_col).alias("src"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), 0)
        ).alias("url"),
    )
    return (
        links.select("src", url_host(F.col("url")).alias("dst"))
        .where(F.col("dst") != "")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


# one well-formed anchor tag; both Java regex and RE2 run it identically
# (no lookarounds, no backreferences)
ANCHOR_RE = r'<a href="[^"]+"[^>]*>[^<]*</a>'


def extract_anchors(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, url, anchor) — one row per well-formed ``<a href>`` tag in
    the text.  Map-only projection + explode, zero UDFs: the tag list
    comes from one regexp_extract_all pass, href/anchor from two group
    extractions over the (short) tag string, never the document."""
    tags = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(ANCHOR_RE), 0)
        ).alias("tag"),
    )
    return tags.select(
        id_col,
        F.regexp_extract("tag", r'href="([^"]+)"', 1).alias("url"),
        F.regexp_extract("tag", r">([^<]*)<", 1).alias("anchor"),
    )


def anchor_text_summary(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k anchor-text tokens per target host: (host, token, n, rnk).

    Inlink anchor text is the classic external description of a page —
    web-scale curation uses it both as a retrieval field (anchors often
    describe the target better than its own boilerplate) and as a spam
    signal (one token dominating a host's inlinks).  Scale shape: the
    corpus is touched once (extract + explode projections); the single
    exchange carries (host, token) partial counts already combined
    map-side, so it is anchor-vocabulary-sized; the top-k window runs on
    that aggregated table and Catalyst plans it as WindowGroupLimit —
    per-partition heaps of k, no full per-host sort materialization.
    Tokens are lowercased and split on single spaces (anchor text is
    short and already display-formatted); empty anchors contribute
    nothing.  Ties break lexicographically so results are total-ordered
    and engine-invariant."""
    from pyspark.sql import Window

    anchors = extract_anchors(df, text_col=text_col, id_col=id_col)
    toks = anchors.select(
        url_host(F.col("url")).alias("host"),
        F.explode(F.split(F.lower("anchor"), " ")).alias("token"),
    ).where((F.col("host") != "") & (F.col("token") != ""))
    counts = toks.groupBy("host", "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("host").orderBy(F.desc("n"), F.asc("token"))
    return counts.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
