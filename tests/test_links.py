"""Link extraction + host graph (operators/links.py, urls.url_host):
closed-form planted edges, canonical-host rules, NULL handling, and the
composition into pagerank_fixed_point."""

from pyspark.sql import functions as F

from schemasaurus_spark.operators.links import extract_links, host_link_graph
from schemasaurus_spark.operators.urls import url_host


def test_extract_links_closed_form(spark):
    df = spark.createDataFrame(
        [
            (1, 'see http://a.example/x and <a href="https://b.example/y?z=1">l</a>'),
            (2, "no links here"),
            (3, None),
            (4, "HTTP://UPPER.example/p twice http://a.example/x"),
        ],
        "doc_id bigint, text string",
    )
    got = sorted((r.doc_id, r.url) for r in extract_links(df).collect())
    assert got == [
        (1, "http://a.example/x"),
        (1, 'https://b.example/y?z=1'),
        (4, "HTTP://UPPER.example/p"),
        (4, "http://a.example/x"),
    ]


def test_url_host_rules(spark):
    cases = {
        "http://WWW.Foo.Example:80/a/b": "foo.example",
        "https://foo.example:443/x": "foo.example",
        "https://foo.example:8443/x": "foo.example:8443",
        "http://www.example/": "example",
        "not a url": "",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r.u: r.h for r in df.select("u", url_host(F.col("u")).alias("h")).collect()}
    assert got == cases


def test_host_link_graph_closed_form(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "http://a.example/x http://a.example/y http://b.example/"),
            (2, "s1", "http://a.example/z"),
            (3, "s2", "https://WWW.A.example:443/q"),
            (4, "s2", "plain text"),
            (5, None, "http://a.example/ignored"),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {
        (r.src, r.dst): r.n_links for r in host_link_graph(df).collect()
    }
    assert got == {
        ("s1", "a.example"): 3,
        ("s1", "b.example"): 1,
        ("s2", "a.example"): 1,
    }


def test_link_graph_feeds_pagerank(spark):
    from schemasaurus_spark.operators.rank import pagerank_fixed_point

    df = spark.createDataFrame(
        [
            (1, "a.example", "http://b.example/ http://c.example/"),
            (2, "b.example", "http://c.example/"),
            (3, "c.example", "http://a.example/"),
        ],
        "doc_id bigint, source string, text string",
    )
    edges = host_link_graph(df)
    ranks = pagerank_fixed_point(edges, n_iter=5)
    got = {r.node for r in ranks.collect()}
    assert got == {"a.example", "b.example", "c.example"}
