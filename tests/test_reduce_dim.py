"""Dimensionality reduction (operators/reduce_dim.py): JL signed
projection stays JVM-exact and shuffle-free; one-pass distributed PCA
matches a full-batch numpy reference and is partitioning-invariant."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deltalake_spark.operators.reduce_dim import (
    jl_project,
    jl_signs,
    pca_fit,
    pca_transform,
)
from deltalake_spark.plans import plan_summary


def _vec_df(spark, n=300, dim=16, parts=5):
    rows = []
    rng = np.random.RandomState(11)
    # anisotropic cloud: two dominant directions so PCA has a clear
    # spectrum
    basis = rng.randn(dim, dim)
    scales = np.array([10.0, 6.0] + [0.5] * (dim - 2))
    X = rng.randn(n, dim) * scales @ basis[:dim]
    for i, x in enumerate(X):
        rows.append((i, [float(v) for v in x]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts), X


def test_jl_signs_deterministic():
    a = jl_signs(4, 8, seed=7)
    assert a == jl_signs(4, 8, seed=7)
    assert a != jl_signs(4, 8, seed=8)
    assert all(s in (-1, 1) for row in a for s in row)
    # not degenerate: both signs appear in every plane at dim 64
    for row in jl_signs(8, 64):
        assert {-1, 1} == set(row)


def test_jl_project_matches_numpy_and_is_map_only(spark):
    df, X = _vec_df(spark, n=100, dim=16)
    out = jl_project(df, vec_col="embedding", out_dim=4, dim=16,
                     scale=1000, seed=7)
    assert plan_summary(out).shuffles == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    signs = np.array(jl_signs(4, 16, 7))
    got = {r["vec_id"]: [r[f"proj_{d}"] for d in range(4)]
           for r in out.collect()}
    for i, x in enumerate(X):
        q = np.round(x * 1000).astype(np.int64)
        want = (signs @ q).tolist()
        assert got[i] == want, i


def test_pca_fit_matches_full_batch_numpy(spark):
    df, X = _vec_df(spark, n=300, dim=16)
    model = pca_fit(df, vec_col="embedding", k=4)
    assert model["n"] == 300
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), atol=1e-9)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    np.testing.assert_allclose(model["explained"], evals[order],
                               rtol=1e-9)
    C = np.asarray(model["components"])
    # orthonormal rows
    np.testing.assert_allclose(C @ C.T, np.eye(4), atol=1e-9)
    # spans the same subspace as the numpy eigenvectors (sign-free)
    for i, j in enumerate(order):
        dot = abs(float(C[i] @ evecs[:, j]))
        assert dot == pytest.approx(1.0, abs=1e-8), (i, dot)


def test_pca_fit_partitioning_invariant(spark):
    df, _ = _vec_df(spark, n=200, dim=8, parts=1)
    m1 = pca_fit(df.coalesce(1), vec_col="embedding", k=3)
    m7 = pca_fit(df.repartition(7), vec_col="embedding", k=3)
    np.testing.assert_allclose(m1["explained"], m7["explained"],
                               rtol=1e-9)
    np.testing.assert_allclose(m1["components"], m7["components"],
                               atol=1e-8)


def test_pca_transform_variances_match_spectrum(spark):
    df, X = _vec_df(spark, n=300, dim=16)
    model = pca_fit(df, vec_col="embedding", k=3)
    out = pca_transform(df, model, vec_col="embedding")
    assert plan_summary(out).shuffles == 0
    P = np.array([r["pca"] for r in out.orderBy("vec_id").collect()])
    assert P.shape == (300, 3)
    # projected coordinates are uncorrelated with variance = eigenvalue
    np.testing.assert_allclose(P.mean(axis=0), 0.0, atol=1e-8)
    np.testing.assert_allclose(P.var(axis=0), model["explained"],
                               rtol=1e-8)
    # null vectors pass through as nulls
    df2 = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<double>")
    assert pca_transform(df2, model).collect()[0]["pca"] is None


def test_pca_fit_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(df, vec_col="embedding", k=2)
