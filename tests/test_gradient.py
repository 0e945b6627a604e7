"""Gradient / update / centering / iteration golden tests —
mirrors TsneHelpersTestSuite.scala:139-327."""

import pytest
from pyspark.sql import functions as F

from tests.fixtures import (
    CENTERING_INPUT,
    CENTERING_RESULTS,
    DENSE_GRADIENT_RESULTS,
    DENSE_JOINT_PROBABILITIES,
    INITIAL_EMBEDDING,
    UPDATED_AND_CENTERED_EMBEDDING_RESULTS,
    UPDATED_EMBEDDING_RESULTS,
)
from tsne_flink_spark.operators.embedding import (
    center_embedding,
    init_working_set,
    update_embedding,
)
from tsne_flink_spark.operators.gradient import gradient
from tsne_flink_spark.operators.optimize import iteration_computation
from tsne_flink_spark.schemas import EMBEDDING, WORKING_SET
from tsne_flink_spark.sources.readers import coo_from_rows


def _embedding_df(spark, rows):
    return spark.createDataFrame(rows, EMBEDDING)


def _working_set_df(spark, embedding_rows):
    d = len(embedding_rows[0][1])
    return spark.createDataFrame(
        [(i, y, [0.0] * d, [1.0] * d) for i, y in embedding_rows], WORKING_SET
    )


def _assert_vectors(rows, expected, abs_tol):
    got = {r[0]: list(r[1]) for r in rows}
    assert len(got) == len(expected)
    for pid, vec in expected:
        assert pid in got
        for a, b in zip(got[pid], vec):
            assert a == pytest.approx(b, abs=abs_tol)


def test_gradient_theta0_goldens(spark):
    p = coo_from_rows(spark, DENSE_JOINT_PROBABILITIES)
    y = _embedding_df(spark, INITIAL_EMBEDDING)
    grad, loss = gradient(p, y, metric="sqeuclidean", theta=0.0, n_components=2)
    _assert_vectors(
        [(r["id"], r["dy"]) for r in grad.collect()], DENSE_GRADIENT_RESULTS, 1e-12
    )
    assert loss is None


def test_gradient_barnes_hut_theta0_equals_exact(spark):
    """theta=0 through the quadtree path must equal the exact path — the
    reference's own regression trick (TsneHelpersTestSuite.scala:187)."""
    p = coo_from_rows(spark, DENSE_JOINT_PROBABILITIES)
    y = _embedding_df(spark, INITIAL_EMBEDDING)
    grad, _ = gradient(p, y, theta=1e-300, n_components=2)  # BH path, no summarization
    _assert_vectors(
        [(r["id"], r["dy"]) for r in grad.collect()], DENSE_GRADIENT_RESULTS, 1e-12
    )


def test_gradient_barnes_hut_approximation_close(spark):
    p = coo_from_rows(spark, DENSE_JOINT_PROBABILITIES)
    y = _embedding_df(spark, INITIAL_EMBEDDING)
    grad, _ = gradient(p, y, theta=0.25, n_components=2)
    # BH with theta=0.25 should be within a loose tolerance of exact
    _assert_vectors(
        [(r["id"], r["dy"]) for r in grad.collect()], DENSE_GRADIENT_RESULTS, 1e-2
    )


def test_center_embedding(spark):
    ws = _working_set_df(spark, CENTERING_INPUT)
    rows = center_embedding(ws, 2).select("id", "y").collect()
    _assert_vectors([(r["id"], r["y"]) for r in rows], CENTERING_RESULTS, 0.0)


def test_update_embedding_goldens(spark):
    grad = spark.createDataFrame(
        [(i, v) for i, v in DENSE_GRADIENT_RESULTS], "id int, dy array<double>"
    )
    ws = _working_set_df(spark, INITIAL_EMBEDDING)
    out = update_embedding(grad, ws, min_gain=0.01, momentum=0.5, learning_rate=300)
    _assert_vectors(
        [(r["id"], r["y"]) for r in out.collect()], UPDATED_EMBEDDING_RESULTS, 1e-9
    )


def test_iteration_computation_goldens(spark):
    p = coo_from_rows(spark, DENSE_JOINT_PROBABILITIES)
    ws = _working_set_df(spark, INITIAL_EMBEDDING)
    out = iteration_computation(
        1, 0.5, ws, p, metric="sqeuclidean", learning_rate=300,
        theta=0.0, n_components=2, iter_offset=0,
    )
    _assert_vectors(
        [(r["id"], r["y"]) for r in out.select("id", "y").collect()],
        UPDATED_AND_CENTERED_EMBEDDING_RESULTS,
        1e-9,
    )


def test_init_working_set(spark):
    pts = spark.createDataFrame([(i,) for i in range(10)], "id int")
    rows = init_working_set(pts, 2, random_state=0).collect()
    assert len(rows) == 10
    for r in rows:
        assert list(r["grad"]) == [0.0, 0.0]
        assert list(r["gains"]) == [1.0, 1.0]
        assert all(abs(c) < 1e-2 for c in r["y"])  # N(0, 1e-4) scale


def test_loss_decreases(spark):
    """Property test: KL loss non-increasing over late iterations."""
    p = coo_from_rows(spark, DENSE_JOINT_PROBABILITIES)
    ws = _working_set_df(spark, INITIAL_EMBEDDING)
    sink = []
    iteration_computation(
        20, 0.5, ws, p, learning_rate=100, theta=0.0, n_components=2,
        iter_offset=0, loss_sink=sink,
    )
    assert len(sink) == 2  # iterations 10, 20
    losses = [loss for _, loss in sorted(sink)]
    assert losses[-1] <= losses[0]


def test_tree_build_validation(spark):
    """Unknown tree_build strings error instead of silently falling back to
    the distributed build (the CLI is choice-restricted; the API is not)."""
    import pytest

    from tsne_flink_spark.operators.gradient import _repulsive_barnes_hut

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "id int, y array<double>"
    )
    with pytest.raises(ValueError, match="tree_build"):
        _repulsive_barnes_hut(emb, theta=0.5, n_components=2, tree_build="drivers")
