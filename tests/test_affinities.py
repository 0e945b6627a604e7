"""Affinity + joint-distribution golden tests —
mirrors TsneHelpersTestSuite.scala:76-137."""

import os

import pytest

from tests.fixtures import (
    DENSE_INPUT_CSV,
    DENSE_JOINT_PROBABILITIES,
    DENSE_PAIRWISE_AFFINITIES,
    SPARSE_JOINT_PROBABILITIES,
    SPARSE_PAIRWISE_AFFINITIES,
)
from tsne_flink_spark.operators.affinities import (
    joint_distribution,
    pairwise_affinities,
)
from tsne_flink_spark.operators.knn import k_nearest_neighbors
from tsne_flink_spark.sources.readers import coo_from_rows, read_points


@pytest.mark.skipif(
    not os.path.exists(DENSE_INPUT_CSV), reason="reference fixture not present"
)
def test_pairwise_affinities_dense_goldens(spark):
    points = read_points(spark, DENSE_INPUT_CSV, 28 * 28)
    knn = k_nearest_neighbors(points, 10, "sqeuclidean")
    result = {(r["i"], r["j"]): r["v"] for r in pairwise_affinities(knn, 2.0).collect()}
    assert len(result) == len(DENSE_PAIRWISE_AFFINITIES)
    for i, j, expected in DENSE_PAIRWISE_AFFINITIES:
        assert result[(i, j)] == pytest.approx(expected, abs=1e-12)


def test_joint_distribution_dense_goldens(spark):
    affinities = coo_from_rows(spark, DENSE_PAIRWISE_AFFINITIES)
    result = {(r["i"], r["j"]): r["v"] for r in joint_distribution(affinities).collect()}
    assert len(result) == len(DENSE_JOINT_PROBABILITIES)
    for i, j, expected in DENSE_JOINT_PROBABILITIES:
        assert result[(i, j)] == pytest.approx(expected, abs=1e-12)
    assert sum(result.values()) == pytest.approx(1.0, abs=1e-12)


def test_joint_distribution_sparse_goldens(spark):
    affinities = coo_from_rows(spark, SPARSE_PAIRWISE_AFFINITIES)
    result = {(r["i"], r["j"]): r["v"] for r in joint_distribution(affinities).collect()}
    assert len(result) == len(SPARSE_JOINT_PROBABILITIES)
    for i, j, expected in SPARSE_JOINT_PROBABILITIES:
        assert result[(i, j)] == pytest.approx(expected, abs=1e-6)
    assert sum(result.values()) == pytest.approx(1.0, abs=1e-12)


@pytest.mark.skipif(
    not os.path.exists(DENSE_INPUT_CSV), reason="reference fixture not present"
)
def test_affinity_rows_sum_to_one(spark):
    """Property the reference never asserts: each P(.|i) row sums to 1."""
    points = read_points(spark, DENSE_INPUT_CSV, 28 * 28)
    knn = k_nearest_neighbors(points, 10, "sqeuclidean")
    rows = pairwise_affinities(knn, 2.0).groupBy("i").sum("v").collect()
    for r in rows:
        assert r["sum(v)"] == pytest.approx(1.0, abs=1e-9)
