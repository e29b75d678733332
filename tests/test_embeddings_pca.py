"""PCA operator (operators/embeddings.py): streaming covariance parity
with direct numpy, projection-path invariance (literal vs GEMM), whitening
variance, and the connected-components round counter the cc_convergence
certification rides on."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from light_etl_windows_container_poc_spark.operators.embeddings import (
    covariance_stats, pca_fit, pca_project)


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(5)
    rows = [(i, [rng.gauss(0.0, 1.0 + 0.5 * (j % 3)) for j in range(6)])
            for i in range(240)]
    return spark.createDataFrame(rows, "id long, v array<double>").persist()


def _np_matrix(df):
    return np.array([r.v for r in df.orderBy("id").collect()])


def test_covariance_matches_numpy(spark, vec_df):
    n, mean, cov = covariance_stats(vec_df, "v")
    m = _np_matrix(vec_df)
    assert n == len(m)
    assert np.allclose(mean, m.mean(axis=0), atol=1e-12)
    assert np.allclose(cov, np.cov(m, rowvar=False, bias=True), atol=1e-10)


def test_fit_spectrum_and_orthonormality(spark, vec_df):
    model = pca_fit(vec_df, "v", k=4)
    lam = np.asarray(model.all_eigvals)
    assert np.all(lam[:-1] >= lam[1:] - 1e-12)
    comps = np.asarray(model.components)
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)
    # sign convention: max-|coordinate| entry of each component positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0


def test_projection_paths_agree(spark, vec_df):
    model = pca_fit(vec_df, "v", k=5)
    lit = {r.id: list(r.pc)
           for r in pca_project(vec_df, "id", "v", model,
                                literal_k_max=100).collect()}
    gemm = {r.id: list(r.pc)
            for r in pca_project(vec_df, "id", "v", model,
                                 literal_k_max=1).collect()}
    assert set(lit) == set(gemm)
    for i in lit:
        assert np.allclose(lit[i], gemm[i], atol=1e-9)


def test_projection_variance_and_whitening(spark, vec_df):
    model = pca_fit(vec_df, "v", k=3)
    proj = pca_project(vec_df, "id", "v", model)
    pv = (proj.select(F.posexplode("pc").alias("j", "s"))
          .groupBy("j").agg(F.var_pop("s").alias("v"))
          .orderBy("j").collect())
    assert np.allclose([r.v for r in pv], model.explained_var, rtol=1e-9)
    wv = (pca_project(vec_df, "id", "v", model, whiten=True)
          .select(F.posexplode("pc").alias("j", "s"))
          .groupBy("j").agg(F.var_pop("s").alias("v")).collect())
    assert all(abs(r.v - 1.0) < 1e-9 for r in wv)


def test_cc_rounds_on_cliques(spark):
    from light_etl_windows_container_poc_spark.operators.dedup import \
        connected_components_stats

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11)], "a_id long, b_id long")
    labels, rounds = connected_components_stats(pairs)
    assert rounds == 2
    got = {(r.node, r.component) for r in labels.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_cc_rounds_on_path_graph(spark):
    from light_etl_windows_container_poc_spark.operators.dedup import \
        connected_components_stats

    # a 5-node path: label propagation needs diameter hops + 1 to prove
    # the fixpoint (min label walks one hop per round)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "a_id long, b_id long")
    labels, rounds = connected_components_stats(pairs)
    assert rounds == 5
    assert {r.component for r in labels.collect()} == {1}
