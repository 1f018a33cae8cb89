"""SemDeDup cluster-then-cosine dedup (llmops/semdedup.py), pinned
against an independent numpy brute-force reference."""

from __future__ import annotations

import numpy as np
import pytest

from data_validation_engine_spark.llmops.semdedup import (
    semantic_dedup,
    semantic_dup_groups,
    semantic_pairs,
)

DIM = 64
THRESH = 0.40  # sf0.001 embeddings are near-random (max organic cosine ~0.48)
CELLS = 4


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    """Real embeddings plus injected duplicates: every 7th vector is
    copied verbatim under id+100000, so cosine-1.0 pairs exist by
    construction (the organic corpus tops out near 0.48)."""
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from pyspark.sql import functions as F

    dups = base.where("vec_id % 7 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return base.unionByName(dups)


def _seq_fold(vals):
    """Left fold in index order — the engine's F.aggregate semantics.
    numpy's pairwise/SIMD summation orders differently in the last bits,
    which matters at a 6-decimal rounding boundary."""
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def _numpy_reference(rows, centroids, threshold):
    """Independent re-derivation: same cell assignment (squared-L2 argmin,
    ties to the lower cell), brute-force within-cell cosine at 6-decimal
    rounding, then min-label union-find. All sums are sequential
    index-order folds to match the engine bit-for-bit."""
    ids = np.array([r[0] for r in rows])
    X = [[float(v) for v in r[1]] for r in rows]
    d2 = [
        [_seq_fold([(x - c) ** 2 for x, c in zip(vec, cen)])
         for cen in centroids]
        for vec in X
    ]
    cell = [row.index(min(row)) for row in d2]  # first min = lowest cell

    pairs = []
    norms = [
        float(np.sqrt(_seq_fold([x * x for x in vec]))) for vec in X
    ]
    for c in range(len(centroids)):
        idx = [i for i, ce in enumerate(cell) if ce == c]
        for i_pos in range(len(idx)):
            for j_pos in range(i_pos + 1, len(idx)):
                i, j = idx[i_pos], idx[j_pos]
                dot = _seq_fold([x * y for x, y in zip(X[i], X[j])])
                cos = round(dot / (norms[i] * norms[j]), 6)
                if cos >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    pairs.append((a, b, cos))

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    groups = {}
    for a, b, _ in pairs:
        for x in (a, b):
            groups[x] = find(x)
    return set((a, b, c) for a, b, c in pairs), groups


def test_pairs_and_groups_match_numpy(spark, embs):
    from data_validation_engine_spark.llmops.vectors import kmeans_fit

    cents = kmeans_fit(embs, CELLS, dim=DIM, n_iters=2)
    got_pairs = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in semantic_pairs(
            embs, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
        ).collect()
    }
    got_groups = {
        r["vec_id"]: r["group"]
        for r in semantic_dup_groups(
            embs, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
        ).collect()
    }
    rows = [(r["vec_id"], list(r["embedding"])) for r in embs.collect()]
    want_pairs, want_groups = _numpy_reference(rows, cents, THRESH)
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0, "threshold too high — test exercises nothing"
    assert got_groups == want_groups


def test_dedup_keeps_exactly_representatives(spark, embs):
    from data_validation_engine_spark.llmops.vectors import kmeans_fit

    cents = kmeans_fit(embs, CELLS, dim=DIM, n_iters=2)
    groups = {
        r["vec_id"]: r["group"]
        for r in semantic_dup_groups(
            embs, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
        ).collect()
    }
    kept = {
        r["vec_id"]: r["sem_group"]
        for r in semantic_dedup(
            embs, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
        ).collect()
    }
    all_ids = {r["vec_id"] for r in embs.select("vec_id").collect()}
    losers = {i for i, g in groups.items() if i != g}
    reps = {i for i, g in groups.items() if i == g}
    assert set(kept) == all_ids - losers
    for i, g in kept.items():
        assert g == (i if i in reps else None)
    assert len(losers) > 0


def test_dup_groups_is_fixed_point(spark, embs):
    """Re-running dedup on its own output finds nothing new (the kept set
    has no within-threshold pair left under the SAME clustering)."""
    from data_validation_engine_spark.llmops.vectors import kmeans_fit

    cents = kmeans_fit(embs, CELLS, dim=DIM, n_iters=2)
    first = semantic_dedup(
        embs, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
    ).select("vec_id", "embedding")
    again = semantic_pairs(
        first, dim=DIM, n_cells=CELLS, threshold=THRESH, centroids=cents
    )
    assert again.count() == 0


def test_no_cartesian_in_plan(spark, embs):
    plan = (
        semantic_pairs(embs, dim=DIM, n_cells=CELLS, centroids=[[0.0] * DIM])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_semantic_dedup_declared_step(spark, embs):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    ents = {"embs": embs}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "semantic_dedup",
                "entity_name": "embs",
                "new_entity_name": "kept",
                "dim": DIM,
                "n_cells": CELLS,
                "threshold": 0.99,
            }
        ),
    )
    kept_ids = {r["vec_id"] for r in ents["kept"].select("vec_id").collect()}
    # every injected verbatim copy (id+100000, cosine 1.0 with its source)
    # loses to its lower-id original
    assert all(i < 100000 for i in kept_ids)
    base_ids = {
        r["vec_id"]
        for r in embs.where("vec_id < 100000").select("vec_id").collect()
    }
    assert kept_ids == base_ids
