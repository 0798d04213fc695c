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


def test_extract_anchors_closed_form(spark):
    from schemasaurus_spark.operators.links import extract_anchors

    df = spark.createDataFrame(
        [
            (1, 'x <a href="http://a.example/p">Click Here</a> y'
                ' <a href="https://WWW.B.example:443/q" rel="nofollow">b page</a>'),
            (2, '<a href="http://a.example/p"></a> empty anchor'),
            (3, 'malformed <a href=http://no.quotes>t</a> and <a>bare</a>'),
            (4, None),
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.url, r.anchor) for r in extract_anchors(df).collect()
    )
    assert got == [
        (1, "http://a.example/p", "Click Here"),
        (1, "https://WWW.B.example:443/q", "b page"),
        (2, "http://a.example/p", ""),
    ]


def test_anchor_text_summary_topk_ties_and_host_folding(spark):
    from schemasaurus_spark.operators.links import anchor_text_summary

    def a(url, txt):
        return f'<a href="{url}">{txt}</a>'

    rows = [
        # host a.example referenced under three spellings -> one key
        (1, a("http://a.example/1", "Best Docs") + a("https://www.A.example/2", "docs")),
        (2, a("http://A.EXAMPLE:80/3", "best")),
        # host b.example: one dominating token (spam shape)
        (3, a("http://b.example/x", "buy buy buy cheap")),
        (4, "no anchors"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.host, r.rnk): (r.token, r.n)
        for r in anchor_text_summary(df, k=2).collect()
    }
    # a.example tokens: best x2, docs x2 -> tie broken lexicographically
    assert got[("a.example", 1)] == ("best", 2)
    assert got[("a.example", 2)] == ("docs", 2)
    # b.example: buy x3 then cheap x1; k=2 cuts nothing further
    assert got[("b.example", 1)] == ("buy", 3)
    assert got[("b.example", 2)] == ("cheap", 1)
    assert len(got) == 4


def test_anchor_summary_plans_window_group_limit(spark):
    from schemasaurus_spark.operators.links import anchor_text_summary

    df = spark.createDataFrame(
        [(1, '<a href="http://h.example/p">t u v</a>')],
        "doc_id bigint, text string",
    )
    plan = (
        anchor_text_summary(df, k=3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "WindowGroupLimit" in plan  # top-k heap, not full per-host sort
