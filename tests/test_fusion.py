"""Reciprocal Rank Fusion (llmops/fusion.py; Cormack et al. 2009).

Pins the RRF math (integer contributions, scale DIV (k+rank)), the
absent-document convention, rank guarding, determinism of the ranking
helper, the WindowGroupLimit cut, and an end-to-end hybrid
BM25 + embedding fusion over toy corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.fusion import (
    rank_by_score,
    rrf_fuse,
)

S = 10**12


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "q string, doc_id long, rank int")


def test_rrf_math_exact(spark):
    a = _ranked(spark, [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)])
    b = _ranked(spark, [("q1", 2, 1), ("q1", 1, 2), ("q1", 4, 3)])
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"], r["best_rank"])
        for r in rrf_fuse(
            [a, b], query_cols=["q"], k=60
        ).collect()
    }
    assert out[1] == (S // 61 + S // 62, 2, 1)
    assert out[2] == (S // 62 + S // 61, 2, 1)
    assert out[3] == (S // 63, 1, 3)  # absent from b: contributes nothing
    assert out[4] == (S // 63, 1, 3)
    # both-lists docs tie exactly (1+2 vs 2+1) and beat single-list docs
    assert out[1][0] == out[2][0] > out[3][0]


def test_rrf_top_n_cut_deterministic(spark):
    a = _ranked(spark, [("q1", d, d) for d in range(1, 11)])
    b = _ranked(spark, [("q1", d, 11 - d) for d in range(1, 11)])
    # mirrored ranks: doc d ties doc 11-d, and 1/(k+r) convexity makes
    # the extreme pair (1,10) the winner — so top-3 is {1,10} then the
    # id tie-break inside pair (2,9)
    top = rrf_fuse([a, b], query_cols=["q"], top_n=3)
    assert sorted(r["doc_id"] for r in top.collect()) == [1, 2, 10]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_rank_by_score_ties_on_doc_id(spark):
    scored = spark.createDataFrame(
        [("q1", 10, 0.5), ("q1", 3, 0.9), ("q1", 7, 0.5)],
        "q string, doc_id long, score double",
    )
    ranked = {
        r["doc_id"]: r["rank"]
        for r in rank_by_score(
            scored, "score", query_cols=["q"]
        ).collect()
    }
    assert ranked == {3: 1, 7: 2, 10: 3}


def test_rejects_bad_ranks_and_params(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = _ranked(spark, [("q1", 1, 0)])
    with pytest.raises(SparkRuntimeException, match="1-based"):
        rrf_fuse([bad], query_cols=["q"]).collect()
    with pytest.raises(ValueError):
        rrf_fuse([], query_cols=["q"])
    with pytest.raises(ValueError):
        rrf_fuse([bad], query_cols=["q"], k=-1)
    with pytest.raises(ValueError):
        rrf_fuse([bad], query_cols=["q"], top_n=0)


def test_hybrid_bm25_plus_embedding_end_to_end(spark):
    """The real use: lexical and vector retrieval disagree; fusion
    surfaces the doc both of them like."""
    from data_validation_engine_spark.llmops.similarity import cosine_topk
    from data_validation_engine_spark.llmops.text import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "spark shuffle partitions tuning guide"),
            (2, "cooking pasta with garlic"),
            (3, "spark partitions and shuffle internals deep dive"),
            (4, "gardening in spring"),
        ],
        "doc_id long, text string",
    )
    lex = rank_by_score(
        bm25_search(docs, "doc_id", "text", "spark shuffle partitions"),
        "score",
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.2]),
            (3, [0.9, 0.2, 0.1]),
            (4, [0.1, 0.9, 0.3]),
        ],
        "vec_id long, embedding array<double>",
    )
    query = spark.createDataFrame(
        [(99, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    sem = rank_by_score(
        cosine_topk(vecs, query, 4, exclude_self=False).selectExpr(
            "vec_id AS doc_id", "cosine AS score"
        ),
        "score",
    )
    fused = rrf_fuse([lex, sem], top_n=2).orderBy(
        F.col("rrf_score").desc()
    )
    top = [r["doc_id"] for r in fused.collect()]
    # docs 1 and 3 are the only ones ranked well by BOTH retrievers
    assert set(top) == {1, 3}


def test_declared_step(spark):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    eng = StepEngine(spark, register_functions=False)
    a = _ranked(spark, [("q1", 1, 1), ("q1", 2, 2)])
    b = _ranked(spark, [("q1", 2, 1), ("q1", 3, 2)])
    ents = {"lex": a, "sem": b}
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "rrf_fuse",
                "entity_name": "lex",
                "more_entities": ["sem"],
                "query_columns": ["q"],
                "top_n": 2,
                "new_entity_name": "fused",
            }
        ),
    )
    rows = {r["doc_id"]: r["n_lists"] for r in ents["fused"].collect()}
    assert rows[2] == 2  # the doc both lists like survives the cut
    assert len(rows) == 2
