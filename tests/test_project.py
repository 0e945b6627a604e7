"""Dimensionality reduction (pipeline/project.py): seeded JL random
projection and distributed exact PCA vs numpy references."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # anisotropic data so PCA has a meaningful ordering: 3 dominant axes
    base = rng.normal(0, 1, (300, 12)) * np.array(
        [10, 6, 3] + [0.5] * 9
    )
    X = base @ rng.normal(0, 1, (12, 12))  # rotate so axes aren't trivial
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(len(X))],
        "vec_id bigint, embedding array<double>",
    )
    return df, X


def test_pca_matches_numpy(spark, emb):
    from tsne_flink_spark.pipeline.project import pca_fit, pca_transform

    df, X = emb
    model = pca_fit(df, k=3)
    assert model["n"] == len(X)
    assert np.allclose(model["mean"], X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    want_ev = evals[::-1][:3]
    assert np.allclose(model["explained_variance"], want_ev, rtol=1e-8)
    # components match up to sign; the sign convention makes them exact
    for j in range(3):
        w = evecs[:, ::-1][:, j]
        w = w * np.sign(w[np.argmax(np.abs(w))])
        assert np.allclose(model["components"][:, j], w, atol=1e-8)

    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in pca_transform(df, model).collect()
    }
    want = (X - X.mean(axis=0)) @ model["components"]
    for i in range(len(X)):
        assert np.allclose(got[i], want[i], atol=1e-9)
    # variance along component j equals its eigenvalue (exact PCA property)
    Y = np.array([got[i] for i in range(len(X))])
    assert np.allclose(Y.var(axis=0), want_ev, rtol=1e-8)


def test_pca_partitioning_invariance(spark, emb):
    from tsne_flink_spark.pipeline.project import pca_fit

    df, _ = emb
    a = pca_fit(df.repartition(2), k=3)
    b = pca_fit(df.repartition(7), k=3)
    assert np.allclose(a["components"], b["components"], atol=1e-9)
    assert np.allclose(a["explained_variance"], b["explained_variance"], rtol=1e-9)


def test_random_projection_seeded_and_norm_preserving(spark, emb):
    from tsne_flink_spark.pipeline.project import random_projection

    df, X = emb
    a = {r["vec_id"]: r["embedding"]
         for r in random_projection(df, k=6, seed=3).collect()}
    b = {r["vec_id"]: r["embedding"]
         for r in random_projection(df, k=6, seed=3).collect()}
    c = {r["vec_id"]: r["embedding"]
         for r in random_projection(df, k=6, seed=4).collect()}
    assert a == b and a != c  # deterministic in the seed
    # E[||Rx||^2] = ||x||^2.  A single draw has high variance when the
    # data is anisotropic (effective dof ~ k x data rank), so average the
    # ratio over seeds — unbiasedness is the property under test.
    ratios = []
    for seed in range(10):
        got = {r["vec_id"]: r["embedding"]
               for r in random_projection(df, k=6, seed=seed).collect()}
        Y = np.array([got[i] for i in range(len(X))])
        ratios.append((Y**2).sum() / (X**2).sum())
    assert 0.7 < float(np.mean(ratios)) < 1.3, ratios
