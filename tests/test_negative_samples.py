"""Deterministic negative sampling (llmops/split.py negative_samples).

Pins: k draws per anchor, rerun/seed determinism, uniformity over the
pool, exclude_self semantics (gaps not redraws), payload column
carriage, equivalence of the two-phase bucketed rank with a global
md5 sort, and the no-cross-join plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_validation_engine_spark.llmops.split import negative_samples


def _pool(spark, n, prefix="d"):
    return spark.createDataFrame(
        [(f"{prefix}{i}", i) for i in range(n)], "doc string, payload int"
    )


def test_k_draws_per_anchor_and_determinism(spark):
    anchors = spark.createDataFrame(
        [(f"a{i}",) for i in range(20)], "aid string"
    )
    pool = _pool(spark, 50)
    out = negative_samples(
        anchors, pool, "aid", "doc", k=3, exclude_self=False
    )
    rows = out.collect()
    assert len(rows) == 60
    per = {}
    for r in rows:
        per.setdefault(r["aid"], set()).add(r["neg_idx"])
    assert all(v == {0, 1, 2} for v in per.values())
    again = negative_samples(
        anchors, pool, "aid", "doc", k=3, exclude_self=False
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    other = negative_samples(
        anchors, pool, "aid", "doc", k=3, seed="s2", exclude_self=False
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_draws_roughly_uniform(spark):
    anchors = spark.createDataFrame(
        [(f"a{i}",) for i in range(300)], "aid string"
    )
    pool = _pool(spark, 10)
    out = negative_samples(
        anchors, pool, "aid", "doc", k=2, exclude_self=False
    )
    counts = {
        r["neg_doc"]: r["n"]
        for r in out.groupBy("neg_doc").agg(F.count("*").alias("n")).collect()
    }
    assert len(counts) == 10  # every pool doc drawn at least once
    assert all(25 <= c <= 100 for c in counts.values()), counts


def test_exclude_self_leaves_gaps_not_redraws(spark):
    # anchors ARE the pool: some draws hit themselves and must vanish
    pool = _pool(spark, 30)
    anchors = pool.select(F.col("doc").alias("aid"))
    kept = negative_samples(anchors, pool, "aid", "doc", k=4)
    all_draws = negative_samples(
        anchors, pool, "aid", "doc", k=4, exclude_self=False
    )
    n_kept, n_all = kept.count(), all_draws.count()
    assert n_all == 120
    assert n_kept < n_all  # 30 anchors * 4 draws over 30 docs: hits exist
    assert kept.where(F.col("aid") == F.col("neg_doc")).count() == 0
    # the surviving draws are exactly the non-self subset — same values
    a = {(r["aid"], r["neg_idx"], r["neg_doc"]) for r in kept.collect()}
    b = {
        (r["aid"], r["neg_idx"], r["neg_doc"])
        for r in all_draws.collect()
        if r["aid"] != r["neg_doc"]
    }
    assert a == b


def test_payload_columns_carried(spark):
    anchors = spark.createDataFrame([("a1",)], "aid string")
    pool = _pool(spark, 10)
    [r] = negative_samples(
        anchors, pool, "aid", "doc", k=1, pool_cols=["payload"],
        exclude_self=False,
    ).collect()
    assert r["payload"] == int(r["neg_doc"][1:])


def test_two_phase_rank_equals_global_sort(spark):
    # the bucketed offset rank must equal a plain global-window rank
    pool = _pool(spark, 200).repartition(7)
    hashed = pool.select(
        "doc",
        F.md5(F.concat(F.lit("|negpool|"), F.col("doc"))).alias("h"),
    )
    global_rank = {
        r["doc"]: r["rk"]
        for r in hashed.withColumn(
            "rk", F.row_number().over(Window.orderBy("h", "doc")) - 1
        ).collect()
    }
    anchors = spark.createDataFrame(
        [(f"a{i}",) for i in range(100)], "aid string"
    )
    out = negative_samples(
        anchors, pool, "aid", "doc", k=1, exclude_self=False
    )
    # recompute each draw's target rank and check it fetched that doc
    import hashlib

    for r in out.collect():
        t = (
            int(
                hashlib.md5(f"|neg|{r['aid']}|0".encode()).hexdigest()[:15],
                16,
            )
            % 200
        )
        assert global_rank[r["neg_doc"]] == t


def test_validates_and_plan(spark):
    anchors = spark.createDataFrame([("a",)], "aid string")
    pool = _pool(spark, 5)
    with pytest.raises(ValueError):
        negative_samples(anchors, pool, "aid", "doc", k=0)
    plan = (
        negative_samples(anchors, pool, "aid", "doc", k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # exactly one BNLJ: the documented 1-row pool-size broadcast; the
    # draw fetch itself must be a hash/merge equi-join on the rank
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_declared_step(spark):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    eng = StepEngine(spark, register_functions=False)
    ents = {
        "anchors": spark.createDataFrame(
            [(f"a{i}",) for i in range(10)], "aid string"
        ),
        "pool": _pool(spark, 40),
    }
    eng.evaluate(
        ents,
        config=parse_step(
            {
                "operation": "negative_samples",
                "entity_name": "anchors",
                "pool_name": "pool",
                "anchor_column": "aid",
                "pool_column": "doc",
                "k": 2,
                "pool_columns": ["payload"],
                "new_entity_name": "negs",
            }
        ),
    )
    rows = ents["negs"].collect()
    assert len(rows) == 20
    assert set(rows[0].asDict()) == {"aid", "neg_idx", "neg_doc", "payload"}
