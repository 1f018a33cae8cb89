"""PCA via mergeable moments (llmops/pca.py), pinned against numpy."""

from __future__ import annotations

import numpy as np
import pytest

from data_validation_engine_spark.llmops.pca import (
    moment_stats,
    pca_fit,
    pca_project,
)

DIM = 64


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_moments_match_numpy(spark, embs):
    n, s1, s2 = moment_stats(embs, dim=DIM)
    rows = sorted(
        (r["vec_id"], [float(v) for v in r["embedding"]])
        for r in embs.collect()
    )
    X = np.array([v for _, v in rows], dtype=np.float64)
    assert n == len(rows)
    np.testing.assert_allclose(np.array(s1), X.sum(axis=0), rtol=1e-12)
    want_outer = (X.T @ X)[np.triu_indices(DIM)]
    np.testing.assert_allclose(np.array(s2), want_outer, rtol=1e-10)


def test_moments_partitioning_invariant(spark, embs):
    a = moment_stats(embs, dim=DIM)
    b = moment_stats(embs.repartition(13), dim=DIM)
    c = moment_stats(embs.repartition(1), dim=DIM)
    assert a == b == c, "ordered folds must be bit-exact under any layout"


def test_fit_matches_numpy_eigh(spark, embs):
    mean, comps, expl = pca_fit(embs, 4, dim=DIM)
    rows = sorted(
        (r["vec_id"], [float(v) for v in r["embedding"]])
        for r in embs.collect()
    )
    X = np.array([v for _, v in rows], dtype=np.float64)
    np.testing.assert_allclose(np.array(mean), X.mean(axis=0), rtol=1e-10)
    cov = np.cov(X, rowvar=False)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(np.array(expl), vals[order], rtol=1e-6)
    for got, idx in zip(comps, order):
        ref = vecs[:, idx]
        pin = int(np.argmax(np.abs(ref)))
        if ref[pin] < 0:
            ref = -ref
        np.testing.assert_allclose(np.array(got), ref, atol=1e-8)
    # variance ordering is descending
    assert expl == sorted(expl, reverse=True)


def test_project_matches_numpy(spark, embs):
    mean, comps, _ = pca_fit(embs, 3, dim=DIM)
    got = {
        r["vec_id"]: [float(v) for v in r["pca"]]
        for r in pca_project(embs, mean, comps).collect()
    }
    W = np.array(comps)
    mu = np.array(mean)
    for r in embs.collect():
        x = np.array([float(v) for v in r["embedding"]])
        want = W @ (x - mu)
        np.testing.assert_allclose(
            np.array(got[r["vec_id"]]), np.round(want, 6), atol=1.5e-6
        )


def test_projection_decorrelates(spark, embs):
    """The projected coordinates are (sample-)uncorrelated with variance
    equal to the explained eigenvalues — PCA's defining property."""
    mean, comps, expl = pca_fit(embs, 3, dim=DIM)
    P = np.array(
        [
            [float(v) for v in r["pca"]]
            for r in pca_project(embs, mean, comps).collect()
        ]
    )
    cov = np.cov(P, rowvar=False)
    np.testing.assert_allclose(np.diag(cov), np.array(expl), rtol=1e-4)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-4


def test_fit_validates_inputs(spark, embs):
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(embs, 0, dim=DIM)
    with pytest.raises(ValueError, match="empty"):
        moment_stats(embs.where("vec_id < 0"), dim=DIM)


def test_projection_plan_is_narrow(spark, embs):
    mean, comps, _ = pca_fit(embs.limit(50), 2, dim=DIM)
    plan = (
        pca_project(embs, mean, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "projection must be shuffle-free"


def test_pca_declared_step(spark, embs):
    from data_validation_engine_spark.steps import StepEngine, parse_step

    ents = {"embs": embs}
    StepEngine(spark).evaluate(
        ents,
        config=parse_step(
            {
                "operation": "pca_project",
                "entity_name": "embs",
                "new_entity_name": "projected",
                "dim": DIM,
                "k": 3,
                "components_entity": "model",
            }
        ),
    )
    assert ents["projected"].count() == embs.count()
    assert len(ents["projected"].first()["pca"]) == 3
    model = ents["model"].collect()
    assert [r["component"] for r in model] == [0, 1, 2]
    assert all(len(r["weights"]) == DIM for r in model)


def test_fast_moments_parity_with_ordered(spark, embs):
    """The vectorized production fold (method='fast') must agree with
    the attestation-path ordered fold to float-accumulation tolerance
    (addition order differs by design — FLOATS.md non-oracle class)."""
    n_o, s1_o, s2_o = moment_stats(embs, dim=DIM)
    n_f, s1_f, s2_f = moment_stats(embs, dim=DIM, method="fast")
    assert n_o == n_f
    np.testing.assert_allclose(np.array(s1_f), np.array(s1_o), rtol=1e-9)
    np.testing.assert_allclose(np.array(s2_f), np.array(s2_o), rtol=1e-9)


def test_fast_fit_parity_with_ordered(spark, embs):
    mean_o, comps_o, expl_o = pca_fit(embs, 2, dim=DIM)
    mean_f, comps_f, expl_f = pca_fit(embs, 2, dim=DIM, method="fast")
    np.testing.assert_allclose(mean_f, mean_o, rtol=1e-9)
    np.testing.assert_allclose(expl_f, expl_o, rtol=1e-6)
    for cf, co in zip(comps_f, comps_o):
        np.testing.assert_allclose(cf, co, atol=1e-6)


def test_fast_moments_empty_and_bad_method(spark, embs):
    with pytest.raises(ValueError, match="empty input"):
        moment_stats(embs.where("vec_id < 0"), dim=DIM, method="fast")
    with pytest.raises(ValueError, match="method"):
        moment_stats(embs, dim=DIM, method="nope")
