"""Char n-gram LM perplexity scoring (llmops/lm.py), pinned against a
pure-Python reference implementation."""

from __future__ import annotations

import math
import re

import pytest

from data_validation_engine_spark.llmops.lm import (
    char_ngram_counts,
    perplexity_score,
    train_char_lm,
)

N = 3
ALPHA = 1.0


def _norm(t):
    return re.sub(r"\s+", " ", t.lower())


def _py_grams(t, n=N):
    t = _norm(t)
    return [t[i : i + n] for i in range(len(t) - n + 1)] if len(t) >= n else []


def _py_model(texts, n=N):
    counts = {}
    for t in texts:
        for g in _py_grams(t, n):
            counts[g] = counts.get(g, 0) + 1
    return counts, sum(counts.values()), len(counts)


def _py_score(text, counts, total, vocab, alpha=ALPHA, n=N):
    grams = _py_grams(text, n)
    if not grams:
        return 0, None, None
    denom = total + alpha * (vocab + 1)
    lps = [math.log((counts.get(g, 0) + alpha) / denom) for g in grams]
    avg = sum(lps) / len(lps)
    return len(grams), round(avg, 6), round(math.exp(-avg), 6)


@pytest.fixture(scope="module")
def ref_texts(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where("doc_id % 2 = 0")
        .select("doc_id", "text")
        .collect()
    )
    return [(r["doc_id"], r["text"]) for r in rows]


def test_counts_match_python(spark, sf_dir, ref_texts):
    ref = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        "doc_id % 2 = 0"
    )
    got = {
        r["gram"]: r["cnt"]
        for r in char_ngram_counts(ref, "text", n=N).collect()
    }
    want, _, _ = _py_model([t for _, t in ref_texts])
    assert got == want


def test_perplexity_matches_python(spark, sf_dir, ref_texts):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ref = docs.where("doc_id % 2 = 0")
    model, total, vocab = train_char_lm(ref, "text", n=N)
    counts, py_total, py_vocab = _py_model([t for _, t in ref_texts])
    assert (total, vocab) == (py_total, py_vocab)

    got = {
        r["doc_id"]: (r["n_grams"], r["logprob_avg"], r["perplexity"])
        for r in perplexity_score(
            docs, model, total, vocab, "doc_id", "text", n=N
        ).collect()
    }
    all_texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(all_texts)
    for did, text in all_texts.items():
        n_g, lp, ppl = _py_score(text, counts, total, vocab)
        assert got[did][0] == n_g
        if lp is None:
            assert got[did][1] is None
        else:
            # JVM StrictMath log/exp vs libm may differ in the last ulp;
            # the 6-decimal rounding absorbs it except ON a boundary
            assert got[did][1] == pytest.approx(lp, abs=2e-6)
            assert got[did][2] == pytest.approx(ppl, rel=2e-6)


def test_reference_scores_below_gibberish(spark, sf_dir):
    """The filter property that matters: in-distribution text scores
    lower perplexity than out-of-distribution gibberish."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model, total, vocab = train_char_lm(docs, "text", n=N)
    probe = spark.createDataFrame(
        [
            (1, "the fast table scan joins the sort order"),
            (2, "zqxj wvkp qzzx jjwq xvzk pqqw zzjx"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["perplexity"]
        for r in perplexity_score(
            probe, model, total, vocab, "doc_id", "text", n=N
        ).collect()
    }
    assert got[1] < got[2]


def test_short_doc_gets_null_score(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    model, total, vocab = train_char_lm(docs, "text", n=N)
    probe = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = perplexity_score(
        probe, model, total, vocab, "doc_id", "text", n=N
    ).first()
    assert r["n_grams"] == 0
    assert r["logprob_avg"] is None and r["perplexity"] is None


def test_empty_reference_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no n-grams"):
        train_char_lm(empty, "text", n=N)


def test_lm_perplexity_declared_step(spark, sf_dir):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ents = {"docs": docs, "clean_ref": docs.where("doc_id % 2 = 0")}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "lm_perplexity",
                "entity_name": "docs",
                "new_entity_name": "scored",
                "reference_name": "clean_ref",
                "key_column": "doc_id",
            }
        ),
    )
    out = ents["scored"]
    assert out.count() == docs.count()
    assert {"n_grams", "logprob_avg", "perplexity"} <= set(out.columns)
    assert out.where("perplexity IS NOT NULL").count() > 0
