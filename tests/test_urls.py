"""URL canonicalization: every normalization rule hand-pinned, non-URL
passthrough, and the dup-group aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from schemasaurus_spark.operators.urls import canonical_url, url_dup_groups


def _canon(spark, raw):
    return (
        spark.createDataFrame([(u,) for u in raw], "u string")
        .select(canonical_url("u").alias("c"))
        .collect()
    )


def test_canonicalization_rules(spark):
    cases = {
        # host case + www + default port + trailing slash + fragment
        "HTTPS://WWW.Example.COM:443/a/b/#top": "https://example.com/a/b",
        # tracking params dropped, remainder sorted
        "https://example.com/p?utm_source=x&b=2&a=1": "https://example.com/p?a=1&b=2",
        "https://example.com/p?a=1&b=2&gclid=Z": "https://example.com/p?a=1&b=2",
        "https://example.com/p?ref=home": "https://example.com/p",
        # utm-only query vanishes entirely; bare '?' too
        "https://example.com/p?utm_campaign=a&utm_medium=b": "https://example.com/p",
        "https://example.com/p?": "https://example.com/p",
        # non-default port kept; path case kept; ref-prefixed param kept
        "https://example.com:8080/Path?refresh=1":
            "https://example.com:8080/Path?refresh=1",
        # scheme lowercased
        "HTTP://example.com/x": "http://example.com/x",
        # non-absolute input passes through unchanged
        "not a url": "not a url",
        "/relative/path?utm_source=x": "/relative/path?utm_source=x",
    }
    got = [r["c"] for r in _canon(spark, list(cases))]
    assert got == list(cases.values())


def test_url_dup_groups(spark):
    raw = [
        "https://www.example.com/p/1?utm_source=a",
        "https://example.com/p/1/",
        "HTTPS://EXAMPLE.COM/p/1#frag",
        "https://example.com/p/2",
        "https://example.com/p/2",  # same raw twice: n_urls 2, n_raw 1
        "https://example.com/solo",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "u string")
    out = {r["canonical_url"]: r for r in url_dup_groups(df, "u").collect()}
    assert set(out) == {"https://example.com/p/1", "https://example.com/p/2"}
    g1 = out["https://example.com/p/1"]
    assert g1["n_urls"] == 3 and g1["n_raw"] == 3
    g2 = out["https://example.com/p/2"]
    assert g2["n_urls"] == 2 and g2["n_raw"] == 1
