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
