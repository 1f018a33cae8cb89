"""Link extraction (llmops/web.py extract_links) — the edge extractor
for crawl link graphs, composing into pagerank."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.web import extract_links


def _df(spark, html, base=None):
    if base is None:
        return spark.createDataFrame([(1, html)], "id long, html string")
    return spark.createDataFrame(
        [(1, html, base)], "id long, html string, base string"
    )


def test_quote_styles_and_pseudo_links(spark):
    html = (
        '<a href="https://a.example/x">x</a>'
        "<a href='https://b.example/y'>y</a>"
        "<a href=https://c.example/z>z</a>"
        '<A HREF="https://d.example/w">case</A>'
        '<a class="nav" href = "https://e.example/s">spaced attr</a>'
        '<a href="javascript:void(0)">no</a>'
        '<a href="mailto:x@y.z">no</a>'
        '<a href="tel:+441234">no</a>'
        '<a href="">empty</a>'
    )
    got = {
        r["href"] for r in extract_links(_df(spark, html), "html").collect()
    }
    assert got == {
        "https://a.example/x",
        "https://b.example/y",
        "https://c.example/z",
        "https://d.example/w",
        "https://e.example/s",
    }


def test_entity_decode_and_fragment_strip(spark):
    html = (
        '<a href="https://a.example/p?x=1&amp;y=2#frag">q</a>'
        '<a href="https://a.example/p#only-fragment-differs">q</a>'
    )
    got = [
        r["href"] for r in extract_links(_df(spark, html), "html").collect()
    ]
    assert "https://a.example/p?x=1&y=2" in got
    assert "https://a.example/p" in got


def test_relative_resolution(spark):
    html = (
        '<a href="//cdn.example/lib.js">scheme-rel</a>'
        '<a href="/root.html">root-rel</a>'
        '<a href="sibling.html">path-rel</a>'
        '<a href="https://abs.example/">abs</a>'
    )
    got = {
        r["href"]
        for r in extract_links(
            _df(spark, html, base="https://site.example/dir/page.html"),
            "html",
            base_url_col="base",
        ).collect()
    }
    assert got == {
        "https://cdn.example/lib.js",
        "https://site.example/root.html",
        "https://site.example/dir/sibling.html",
        "https://abs.example/",
    }


def test_unique_dedups_within_page(spark):
    html = '<a href="/nav">n</a>' * 5 + '<a href="/other">o</a>'
    out = extract_links(_df(spark, html), "html")
    assert out.count() == 2
    dup = extract_links(_df(spark, html), "html", unique=False)
    assert dup.count() == 6


def test_null_and_linkless_html_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "<p>no links</p>")], "id long, html string"
    )
    assert extract_links(df, "html").count() == 0


def test_feeds_pagerank(spark):
    from data_validation_engine_spark.llmops.graph import pagerank

    pages = spark.createDataFrame(
        [
            ("https://a.ex/", '<a href="https://b.ex/">b</a>'),
            ("https://b.ex/", '<a href="https://a.ex/">a</a>'
                              '<a href="https://c.ex/">c</a>'),
            ("https://c.ex/", '<a href="https://a.ex/">a</a>'),
        ],
        "url string, html string",
    )
    edges = extract_links(pages, "html").selectExpr(
        "url AS src", "href AS dst"
    )
    ranks = pagerank(edges, iterations=10)
    by = {r["node"]: r["pagerank"] for r in ranks.collect()}
    # a receives links from both b and c: highest rank
    assert by["https://a.ex/"] == max(by.values())


def test_plan_is_shuffle_free(spark):
    df = _df(spark, '<a href="https://a.ex/">a</a>')
    plan = (
        extract_links(df, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_declared_step(spark):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    eng = StepEngine(spark, register_functions=False)
    ents = {"pages": _df(spark, '<a href="/x">x</a>',
                         base="https://s.ex/a/b.html")}
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "extract_links",
                "entity_name": "pages",
                "base_url_column": "base",
                "new_entity_name": "links",
            }
        ),
    )
    [r] = ents["links"].collect()
    assert r["href"] == "https://s.ex/x"


def test_anchor_texts(spark):
    from data_validation_engine_spark.llmops.web import extract_anchor_texts

    html = (
        '<a href="https://a.ex/page">Visit <b>the</b>\n  page &amp; more</a>'
        '<a href="https://img.ex/"><img src="x.png"/></a>'
        '<a href="javascript:void(0)">skip</a>'
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    got = {
        r["href"]: r["anchor_text"]
        for r in extract_anchor_texts(df, "html").collect()
    }
    assert got == {
        "https://a.ex/page": "Visit the page & more",
        "https://img.ex/": "",  # image link kept, text empty
    }
    plan = (
        extract_anchor_texts(df, "html")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_canonicalize_url(spark):
    from data_validation_engine_spark.llmops.web import canonicalize_url

    cases = [
        # (input, expected)
        ("HTTP://Site.EX:80/a?utm_source=x&b=2&a=1",
         "http://site.ex/a?a=1&b=2"),
        ("http://site.ex/a?a=1&b=2", "http://site.ex/a?a=1&b=2"),
        ("https://Site.EX:443/", "https://site.ex/"),
        ("https://site.ex:8443/x", "https://site.ex:8443/x"),
        ("http://site.ex", "http://site.ex/"),
        ("https://s.ex/p?gclid=abc&fbclid=z", "https://s.ex/p"),
        ("https://s.ex/p#section", "https://s.ex/p"),
        ("https://s.ex/CaseSensitive/Path", "https://s.ex/CaseSensitive/Path"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i], got[i])
    # the dedup property: the first two collapse to one md5 key
    keys = df.where(F.col("i") < 2).select(
        F.md5(canonicalize_url(F.col("url"))).alias("k")
    ).distinct()
    assert keys.count() == 1
    # keep_fragment escape
    [r] = df.where("i = 6").select(
        canonicalize_url(F.col("url"), keep_fragment=True).alias("c")
    ).collect()
    assert r["c"] == "https://s.ex/p#section"
    # extra_drop_params
    [r] = spark.createDataFrame(
        [("https://s.ex/p?sid=1&keep=2",)], "url string"
    ).select(
        canonicalize_url(
            F.col("url"), extra_drop_params=("sid",)
        ).alias("c")
    ).collect()
    assert r["c"] == "https://s.ex/p?keep=2"
