"""Paragraph-level corpus dedup (llmops/paragraphs.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.paragraphs import (
    paragraph_frequency,
    remove_repeated_paragraphs,
    split_paragraphs,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "alpha beta\ncookie notice\ngamma"),
        (2, "cookie notice\ndelta\nCOOKIE   notice"),
        (3, "epsilon\n\n  \ncookie notice"),
        (4, ""),
        (5, "unique only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_paragraphs_positions_and_normalization(corpus):
    got = {
        (r["doc_id"], r["pos"]): (r["para"], r["h"])
        for r in split_paragraphs(corpus, "doc_id", "text").collect()
    }
    # blanks dropped, positions original
    assert (3, 1) not in got and (3, 2) not in got
    assert got[(3, 3)][0] == "cookie notice"
    assert (4, 0) not in got  # empty doc has no qualifying paragraphs
    # normalization: casefold + whitespace collapse -> same hash
    assert got[(2, 0)][1] == got[(2, 2)][1]
    # without normalization the variants hash apart
    raw = {
        (r["doc_id"], r["pos"]): r["h"]
        for r in split_paragraphs(
            corpus, "doc_id", "text", normalize=False
        ).collect()
    }
    assert raw[(2, 0)] != raw[(2, 2)]


def test_paragraph_frequency_counts(corpus):
    freq = {
        r["para"]: (r["n_docs"], r["n_occ"])
        for r in paragraph_frequency(corpus, "doc_id", "text").collect()
    }
    # 'cookie notice' appears in docs 1,2,3 — 4 occurrences (2 in doc 2)
    assert freq["COOKIE   notice"] == (3, 4) or freq["cookie notice"] == (3, 4)
    assert freq["unique only"] == (1, 1)


def test_remove_repeated_none_drops_every_copy(corpus):
    out = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in remove_repeated_paragraphs(
            corpus, "doc_id", "text", max_docs=2, keep="none"
        ).collect()
    }
    assert out[1] == ("alpha beta\ngamma", 3, 2)
    assert out[2] == ("delta", 3, 1)
    assert out[3] == ("epsilon", 2, 1)
    assert out[4] == ("", 0, 0)  # empty doc passes through
    assert out[5] == ("unique only", 1, 1)


def test_remove_repeated_first_keeps_canonical_copy(corpus):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_paragraphs(
            corpus, "doc_id", "text", max_docs=2, keep="first"
        ).collect()
    }
    # canonical first occurrence is (doc 1, pos 1); all later copies drop
    assert out[1] == "alpha beta\ncookie notice\ngamma"
    assert out[2] == "delta"
    assert out[3] == "epsilon"


def test_remove_repeated_rejects_bad_keep(corpus):
    with pytest.raises(ValueError, match="keep"):
        remove_repeated_paragraphs(corpus, "doc_id", "text", keep="last")


def test_out_col_preserves_original(corpus):
    out = remove_repeated_paragraphs(
        corpus, "doc_id", "text", max_docs=2, keep="none", out_col="clean"
    )
    assert {"text", "clean", "n_paras", "n_kept"} <= set(out.columns)
    row = {r["doc_id"]: r for r in out.collect()}[1]
    assert row["text"] == "alpha beta\ncookie notice\ngamma"
    assert row["clean"] == "alpha beta\ngamma"


def test_matches_duckdb_on_testdata(spark, sf_dir):
    """Engine parity on real testdata: documents have no newlines, so
    split on single spaces — every 'paragraph' is a word and cross-doc
    repetition is ubiquitous, exercising the frequency join hard."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"])
        for r in remove_repeated_paragraphs(
            docs.select("doc_id", "text"),
            "doc_id",
            "text",
            sep=" ",
            max_docs=3,
            keep="first",
        ).collect()
    }
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            f"""
            WITH split AS (
              SELECT doc_id,
                     generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
                     unnest(string_split(text, ' ')) AS para
              FROM read_parquet('{sf_dir}/documents.parquet')
            ), paras AS (
              SELECT doc_id, pos, para,
                     md5(lower(regexp_replace(trim(para), '\\s+', ' ', 'g'))) AS h
              FROM split WHERE length(trim(para)) >= 1
            ), stats AS (
              -- lexicographic min (doc_id, pos) via arithmetic encoding:
              -- pos is bounded far below 1e6 per document here
              SELECT h, count(DISTINCT doc_id) AS n_docs,
                     min(doc_id * 1000000 + pos) AS f_key
              FROM paras GROUP BY h
            ), tagged AS (
              SELECT p.*, s.n_docs,
                     (s.n_docs <= 3 OR p.doc_id * 1000000 + p.pos = s.f_key)
                       AS survives
              FROM paras p JOIN stats s USING (h)
            ), rebuilt AS (
              SELECT doc_id, count(*) AS n_paras,
                     sum(CASE WHEN survives THEN 1 ELSE 0 END) AS n_kept,
                     coalesce(string_agg(CASE WHEN survives THEN para END,
                                         ' ' ORDER BY pos), '') AS text
              FROM tagged GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.text, '') AS text,
                   coalesce(r.n_paras, 0), coalesce(r.n_kept, 0)
            FROM read_parquet('{sf_dir}/documents.parquet') d
            LEFT JOIN rebuilt r USING (doc_id)
            """
        ).fetchall()
    }
    assert got == want


def test_plan_shape(spark, sf_dir):
    """No corpus-wide sort or window: the only exchanges are the hash
    frequency agg and the doc reassembly agg."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = remove_repeated_paragraphs(
        docs.select("doc_id", "text"), "doc_id", "text", sep=" "
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "GlobalSort" not in plan and "TakeOrdered" not in plan


def test_paragraph_dedup_declared_step(spark):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    rows = [
        (1, "alpha\ncookie notice"),
        (2, "cookie notice\nbeta"),
        (3, "cookie notice"),
    ]
    ents = {"docs": spark.createDataFrame(rows, "doc_id long, text string")}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "paragraph_dedup",
                "entity_name": "docs",
                "new_entity_name": "clean",
                "key_column": "doc_id",
                "max_docs": 2,
                "keep": "none",
            }
        ),
    )
    got = {r["doc_id"]: r["text"] for r in ents["clean"].collect()}
    assert got == {1: "alpha", 2: "beta", 3: ""}
