"""Regression pins for the round-10 self-review findings: NULL
semantics in the sampling/interleaving family, URL parsing edges, and
the loud-failure contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import SparkRuntimeException


def test_interleave_null_source_fails_loudly(spark):
    from data_validation_engine_spark.llmops.split import interleave_sources

    df = spark.createDataFrame(
        [("d1", "a"), ("d2", None)], "doc string, src string"
    )
    with pytest.raises(SparkRuntimeException, match="not in weights"):
        interleave_sources(df, "src", {"a": 1.0}, "doc").collect()


def test_negative_samples_null_pool_values_excluded(spark):
    from data_validation_engine_spark.llmops.split import negative_samples

    pool = spark.createDataFrame(
        [(f"d{i}",) for i in range(20)] + [(None,)] * 5, "doc string"
    )
    anchors = spark.createDataFrame(
        [(f"a{i}",) for i in range(40)], "aid string"
    )
    out = negative_samples(
        anchors, pool, "aid", "doc", k=2, exclude_self=False
    )
    rows = out.collect()
    # NULLs neither drawable nor rank holes: every draw resolves
    assert len(rows) == 80
    assert all(r["neg_doc"] is not None for r in rows)


def test_token_budget_null_group_rows_kept(spark):
    from data_validation_engine_spark.llmops.split import select_token_budget

    df = spark.createDataFrame(
        [(1, "en", 10, 100), (2, "en", 5, 100), (3, None, 7, 100)],
        "doc_id long, lang string, score int, toks int",
    )
    out = select_token_budget(
        df, "score", "toks", group_cols=["lang"], budget_frac=0.5,
        keep_col="keep",
    )
    # the NULL-lang group must survive the totals join (audit mode
    # returns every row)
    assert out.count() == 3
    assert out.where(F.col("lang").isNull()).count() == 1


def test_token_budget_null_tokens_raise_even_on_last_row(spark):
    from data_validation_engine_spark.llmops.split import select_token_budget

    # the NULL-token row sorts LAST (lowest score): the window-frame
    # guard alone would never evaluate it
    df = spark.createDataFrame(
        [(1, 9, 100), (2, 5, None)],
        "doc_id long, score int, toks int",
    )
    with pytest.raises(SparkRuntimeException, match="NULL in column"):
        select_token_budget(
            df, "score", "toks", budget_tokens=50, keep_col="keep"
        ).collect()


def test_hash_bucket_xxhash64_null_key_matches_md5_semantics(spark):
    from data_validation_engine_spark.llmops.split import hash_bucket

    df = spark.createDataFrame([("k1",), (None,)], "k string")
    out = df.select(
        hash_bucket(F.col("k"), algo="md5").alias("b_md5"),
        hash_bucket(F.col("k"), algo="xxhash64").alias("b_xx"),
    ).collect()
    by_null = {r["b_md5"] is None: r for r in out}
    # NULL key -> NULL bucket under BOTH algorithms
    assert by_null[True]["b_xx"] is None
    assert by_null[False]["b_xx"] is not None


def test_canonicalize_url_question_mark_inside_fragment(spark):
    from data_validation_engine_spark.llmops.web import canonicalize_url

    df = spark.createDataFrame(
        [("http://host/p#sec?x=1",), ("http://host/p",)], "url string"
    )
    got = {
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    }
    # the fragment's '?' is not a query: both canonicalize identically
    assert got == {"http://host/p"}


def test_extract_links_query_only_relative_href(spark):
    from data_validation_engine_spark.llmops.web import extract_links

    df = spark.createDataFrame(
        [(1, '<a href="?page=2">next</a>', "http://ex.com/a/index.html?page=1")],
        "id long, html string, base string",
    )
    [r] = extract_links(df, "html", base_url_col="base").collect()
    # RFC 3986 5.3: query-only refs keep the base filename
    assert r["href"] == "http://ex.com/a/index.html?page=2"


# --- round-11 ADVICE fix pins ---


def test_negative_samples_null_anchor_fails_loudly(spark):
    """r10 ADVICE: a NULL anchor key used to md5 to NULL and silently
    vanish at the rank equi-join — now it raises, matching the
    module's loud-failure discipline."""
    from data_validation_engine_spark.llmops.split import negative_samples

    pool = spark.createDataFrame(
        [(f"d{i}",) for i in range(10)], "doc string"
    )
    anchors = spark.createDataFrame(
        [("a1",), (None,)], "aid string"
    )
    with pytest.raises(SparkRuntimeException, match="NULL in anchor"):
        negative_samples(anchors, pool, "aid", "doc", k=2).collect()


def test_canonicalize_url_question_mark_inside_query(spark):
    """r10 ADVICE: '?' is legal INSIDE a query (RFC 3986); the query
    must start at the FIRST '?', not the last — otherwise distinct
    URLs collapse to one canonical dedup key."""
    from data_validation_engine_spark.llmops.web import canonicalize_url

    cases = [
        # the param value contains a literal '?': everything after the
        # FIRST '?' is the query
        ("https://s.ex/p?q=what?&b=2", "https://s.ex/p?b=2&q=what?"),
        # greedy last-'?' anchoring would have collapsed these two
        ("https://s.ex/p?a=x?y", "https://s.ex/p?a=x?y"),
        ("https://s.ex/p?y", "https://s.ex/p?y"),
        # fragment containing '?' still fabricates no query
        ("https://s.ex/p#sec?x=1", "https://s.ex/p"),
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
    # the two distinct URLs stay distinct dedup keys
    assert (
        df.where(F.col("i").isin(1, 2))
        .select(F.md5(canonicalize_url(F.col("url"))).alias("k"))
        .distinct()
        .count()
        == 2
    )


def test_parse_robots_mixed_case_host_joins(spark):
    """r10 ADVICE: rule hosts are lowercased at parse time so a
    mixed-case host column still joins robots_allowed's lowercased
    URL-derived host — disallowed URLs must NOT come back allowed."""
    from data_validation_engine_spark.llmops.robots import (
        parse_robots,
        robots_allowed,
    )

    robots = spark.createDataFrame(
        [("Example.COM", "User-agent: *\nDisallow: /private/")],
        "host string, body string",
    )
    rules = parse_robots(robots, "host", "body")
    assert {r["host"] for r in rules.collect()} == {"example.com"}
    urls = spark.createDataFrame(
        [(1, "http://example.com/private/x"),
         (2, "http://EXAMPLE.com/public/y")],
        "id long, url string",
    )
    got = {
        r["id"]: r["robots_allowed"]
        for r in robots_allowed(urls, rules, "url", agent="bot").collect()
    }
    assert got == {1: False, 2: True}
