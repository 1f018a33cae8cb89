"""DSIR importance resampling (llmops/dsir.py; Xie et al. 2023).

Pins: feature extraction shape, count mergeability, smoothing math,
score monotonicity (target-like docs outrank off-target docs), the
Gumbel-top-k determinism + temperature limits, and the scale-shape
plan assertions (broadcast ratio join, TakeOrderedAndProject)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.dsir import (
    dsir_bucket_counts,
    dsir_log_ratio,
    dsir_score,
    gumbel_topk,
    ngram_buckets,
)

B = 64  # tiny feature space so collisions are exercised


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpora(spark):
    target = _docs(
        spark,
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)],
    )
    raw = _docs(
        spark,
        [(i, "the quick brown fox jumps high") for i in range(10)]
        + [(100 + i, "stock market futures fell sharply today") for i in range(10)],
    )
    return target, raw


def test_ngram_buckets_shape(spark):
    df = _docs(spark, [(1, "a b c"), (2, ""), (3, None), (4, "solo")])
    out = df.select(
        "doc_id", ngram_buckets(F.col("text"), n_max=2, buckets=B).alias("f")
    ).collect()
    got = {r["doc_id"]: r["f"] for r in out}
    # "a b c": 3 unigrams + 2 bigrams; blanks/NULL -> empty, never NULL
    assert len(got[1]) == 5
    assert got[2] == [] and got[3] == []
    assert len(got[4]) == 1  # one unigram, no bigram
    assert all(0 <= b < B for b in got[1])


def test_ngram_buckets_deterministic_and_seeded(spark):
    df = _docs(spark, [(1, "alpha beta gamma")])
    a = df.select(ngram_buckets(F.col("text"), buckets=B).alias("f")).first()["f"]
    b = df.select(ngram_buckets(F.col("text"), buckets=B).alias("f")).first()["f"]
    c = df.select(
        ngram_buckets(F.col("text"), buckets=B, seed="other").alias("f")
    ).first()["f"]
    assert a == b
    assert a != c  # independent family under a different seed


def test_bucket_counts_mergeable(spark):
    a = _docs(spark, [(1, "x y"), (2, "y z")])
    b = _docs(spark, [(3, "x y z")])
    merged = (
        dsir_bucket_counts(a, "text", buckets=B)
        .unionByName(dsir_bucket_counts(b, "text", buckets=B))
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct = dsir_bucket_counts(a.unionByName(b), "text", buckets=B)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_log_ratio_table_math(spark, corpora):
    target, raw = corpora
    tc = dsir_bucket_counts(target, "text", buckets=B)
    rc = dsir_bucket_counts(raw, "text", buckets=B)
    table = dsir_log_ratio(tc, rc, buckets=B, alpha=1.0).collect()
    assert len(table) == B  # full spine, zero-count buckets included
    T = sum(r["n_target"] for r in table)
    R = sum(r["n_raw"] for r in table)
    for r in table[:10]:
        expect = (
            math.log((r["n_target"] + 1.0) / (T + B))
            - math.log((r["n_raw"] + 1.0) / (R + B))
        )
        assert abs(r["log_ratio"] - expect) < 1e-12


def test_score_ranks_target_like_docs_higher(spark, corpora):
    target, raw = corpora
    tc = dsir_bucket_counts(target, "text", buckets=B)
    rc = dsir_bucket_counts(raw, "text", buckets=B)
    table = dsir_log_ratio(tc, rc, buckets=B)
    scored = dsir_score(
        raw, "text", table, key_cols=["doc_id"], buckets=B
    ).collect()
    logw = {r["doc_id"]: r["dsir_logw"] for r in scored}
    foxish = [logw[i] for i in range(10)]
    stockish = [logw[100 + i] for i in range(10)]
    assert min(foxish) > max(stockish)
    n_feats = {r["doc_id"]: r["n_feats"] for r in scored}
    assert n_feats[1] == 6 + 5  # 6 unigrams + 5 bigrams


def test_score_zero_feature_doc_kept(spark, corpora):
    target, raw = corpora
    tc = dsir_bucket_counts(target, "text", buckets=B)
    rc = dsir_bucket_counts(raw, "text", buckets=B)
    table = dsir_log_ratio(tc, rc, buckets=B)
    degenerate = _docs(spark, [(7, ""), (8, None), (9, "the fox")])
    out = {
        r["doc_id"]: (r["n_feats"], r["dsir_logw"])
        for r in dsir_score(
            degenerate, "text", table, key_cols=["doc_id"], buckets=B
        ).collect()
    }
    assert out[7] == (0, 0.0) and out[8] == (0, 0.0)
    assert out[9][0] == 3 and out[9][1] != 0.0


def test_score_normalized_is_mean(spark, corpora):
    target, raw = corpora
    tc = dsir_bucket_counts(target, "text", buckets=B)
    rc = dsir_bucket_counts(raw, "text", buckets=B)
    table = dsir_log_ratio(tc, rc, buckets=B)
    doc = _docs(spark, [(1, "the quick fox")])
    [s] = dsir_score(doc, "text", table, key_cols=["doc_id"], buckets=B).collect()
    [m] = dsir_score(
        doc, "text", table, key_cols=["doc_id"], buckets=B, normalize=True
    ).collect()
    assert abs(m["dsir_logw"] - s["dsir_logw"] / s["n_feats"]) < 1e-12


def test_gumbel_topk_deterministic_and_temperature_limits(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, logw double"
    )
    a = sorted(r["k"] for r in gumbel_topk(df, "logw", 10, key_col="k").collect())
    b = sorted(r["k"] for r in gumbel_topk(df, "logw", 10, key_col="k").collect())
    assert a == b  # rerun-stable
    # T -> 0: greedy top-n by weight
    greedy = sorted(
        r["k"]
        for r in gumbel_topk(
            df, "logw", 10, key_col="k", temperature=1e-9
        ).collect()
    )
    assert greedy == list(range(90, 100))
    # different seed -> (almost surely) different draw at T=1
    c = sorted(
        r["k"]
        for r in gumbel_topk(df, "logw", 10, key_col="k", seed="s2").collect()
    )
    assert a != c
    # helper column dropped, schema unchanged
    assert gumbel_topk(df, "logw", 3, key_col="k").columns == ["k", "logw"]


def test_gumbel_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(1000)], "k long, logw double"
    )
    plan = (
        gumbel_topk(df, "logw", 5, key_col="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_score_plan_broadcasts_ratio_table(spark, corpora):
    target, raw = corpora
    tc = dsir_bucket_counts(target, "text", buckets=B)
    rc = dsir_bucket_counts(raw, "text", buckets=B)
    table = dsir_log_ratio(tc, rc, buckets=B)
    plan = (
        dsir_score(raw, "text", table, key_cols=["doc_id"], buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # escape hatch: one fewer hint when disabled (the remaining hint is
    # dsir_log_ratio's internal 1-row totals broadcast, always present)
    def hints(broadcast):
        return (
            dsir_score(
                raw, "text", table, key_cols=["doc_id"], buckets=B,
                broadcast_ratios=broadcast,
            )
            ._jdf.queryExecution()
            .logical()
            .toString()
            .count("ResolvedHint")
        )

    assert hints(False) == hints(True) - 1


def test_param_validation(spark, corpora):
    target, raw = corpora
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        df.select(ngram_buckets(F.col("text"), n_max=0))
    with pytest.raises(ValueError):
        df.select(ngram_buckets(F.col("text"), buckets=1))
    tc = dsir_bucket_counts(target, "text", buckets=B)
    with pytest.raises(ValueError):
        dsir_log_ratio(tc, tc, buckets=B, alpha=0.0)
    with pytest.raises(ValueError):
        gumbel_topk(df.withColumn("w", F.lit(0.0)), "w", 0, key_col="doc_id")
    with pytest.raises(ValueError):
        gumbel_topk(
            df.withColumn("w", F.lit(0.0)), "w", 1, key_col="doc_id",
            temperature=0.0,
        )


def test_dsir_declared_step_pipeline(spark, corpora):
    """counts -> ratio -> score -> select as a JSON rule program: the
    full DSIR selection loop with no Python between steps."""
    from data_validation_engine_spark.steps import StepEngine, parse_step

    target, raw = corpora
    eng = StepEngine(spark, register_functions=False)
    ents = {"target": target, "raw": raw}
    steps = [
        {"operation": "dsir_resample", "mode": "counts",
         "entity_name": "target", "buckets": B,
         "new_entity_name": "target_counts"},
        {"operation": "dsir_resample", "mode": "counts",
         "entity_name": "raw", "buckets": B,
         "new_entity_name": "raw_counts"},
        {"operation": "dsir_resample", "mode": "ratio",
         "entity_name": "raw_counts", "target_name": "target_counts",
         "buckets": B, "new_entity_name": "ratios"},
        {"operation": "dsir_resample", "mode": "score",
         "entity_name": "raw", "ratio_name": "ratios",
         "key_columns": ["doc_id"], "buckets": B,
         "new_entity_name": "scored"},
        {"operation": "dsir_resample", "mode": "select",
         "entity_name": "scored", "key_columns": ["doc_id"],
         "n_select": 5, "temperature": 1e-9,
         "new_entity_name": "selected"},
    ]
    for s in steps:
        eng.evaluate(ents, config=parse_step(s))
    picked = {r["doc_id"] for r in ents["selected"].collect()}
    # greedy temperature: all 5 selections are fox-corpus docs
    assert picked <= set(range(10)) and len(picked) == 5

    import pytest as _pytest

    for bad in (
        {"operation": "dsir_resample", "mode": "ratio",
         "entity_name": "raw_counts"},
        {"operation": "dsir_resample", "mode": "score",
         "entity_name": "raw"},
        {"operation": "dsir_resample", "mode": "select",
         "entity_name": "scored", "n_select": 5},
    ):
        with _pytest.raises(ValueError):
            eng.evaluate(ents, config=parse_step(bad))


def test_gumbel_topk_grouped(spark):
    from data_validation_engine_spark.llmops.dsir import gumbel_topk_grouped

    df = spark.createDataFrame(
        [(g, i, float(i)) for g in ("a", "b") for i in range(50)],
        "grp string, k long, logw double",
    )
    out = gumbel_topk_grouped(
        df, "logw", 5, group_cols=["grp"], key_col="k", temperature=1e-9
    )
    by = {}
    for r in out.collect():
        by.setdefault(r["grp"], []).append(r["k"])
    # greedy limit: top-5 weights per group, both groups served
    assert sorted(by["a"]) == sorted(by["b"]) == list(range(45, 50))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # deterministic re-draw at T=1
    d1 = sorted(map(tuple, gumbel_topk_grouped(
        df, "logw", 5, group_cols=["grp"], key_col="k").collect()))
    d2 = sorted(map(tuple, gumbel_topk_grouped(
        df, "logw", 5, group_cols=["grp"], key_col="k").collect()))
    assert d1 == d2
    with pytest.raises(ValueError):
        gumbel_topk_grouped(df, "logw", 5, group_cols=[], key_col="k")
