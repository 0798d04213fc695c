"""URL canonicalization + URL-level dedup — the web-corpus PRE-FETCH
dedup stage: the same page arrives under thousands of raw spellings
(tracking parameters, host case, www., default ports, trailing slashes,
fragments, parameter order), and collapsing them BEFORE fetch/text-dedup
is the cheapest dedup the pipeline has (no content needed at all).

Canonical form, applied in order:

1. drop the fragment (``#...`` — client-side only);
2. split base/query at the first ``?``;
3. scheme lowercased; host lowercased, leading ``www.`` and default
   ``:80``/``:443`` dropped; trailing ``/`` runs of the path dropped;
4. query split on ``&``, tracking params removed (``utm_*``, ``gclid``,
   ``fbclid``, ``ref``), the REST SORTED (parameter order never changes
   the resource) and rejoined.

Everything is a lookaround/backreference-free regex + array projection —
map-only, whole-stage codegen, zero UDFs, zero shuffles — and therefore
byte-reproducible in any RE2-compatible engine (the same discipline as
``text.strip_markup``).  Non-absolute inputs (no ``scheme://``) pass
through unchanged rather than being guessed at.

Honest scope: semantic-equivalence beyond spelling (http vs https, host
aliases, mobile subdomains, path case-insensitivity on some servers) is
site-specific policy, not canonicalization — those stay distinct here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"


def canonical_url(col) -> Column:
    """Canonical spelling of an absolute URL (see module doc); non-URLs
    pass through unchanged."""
    u = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(u, "#.*$", "")
    base = F.regexp_extract(no_frag, "^([^?]*)", 1)
    query = F.when(
        no_frag.contains("?"), F.regexp_extract(no_frag, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(rest, "^([^/]*)", 1)), r"^www\.", ""
        ),
        ":(80|443)$",
        "",
    )
    path = F.regexp_replace(F.regexp_replace(rest, "^[^/]*", ""), "/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE),
    )
    q2 = F.array_join(F.sort_array(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def url_host(col) -> Column:
    """Canonical HOST of an absolute URL (the grouping key of the link
    graph): lowercased authority with leading ``www.`` and default
    ``:80``/``:443`` dropped — the same rules ``canonical_url`` applies,
    exposed standalone.  Empty string for non-absolute inputs."""
    u = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(
            F.lower(
                F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
            ),
            r"^www\.",
            "",
        ),
        ":(80|443)$",
        "",
    )


def url_dup_groups(df: DataFrame, url_col: str) -> DataFrame:
    """Canonical-URL groups covering more than one raw spelling:
    ``(canonical_url, n_urls, n_raw)`` — n_urls rows collapse into this
    group, under n_raw distinct raw spellings.

    Scale shape: canonicalization is a map-only codegen projection; the
    groupBy is one map-side-combined shuffle on the canonical key (URL
    keys are near-unique — no skew cliff; a genuinely hot canonical URL
    is itself the answer)."""
    return (
        df.select(canonical_url(url_col).alias("canonical_url"), F.col(url_col))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(url_col).alias("n_raw"),
        )
        .where(F.col("n_urls") > 1)
    )
