"""kNN operator tests — mirrors TsneHelpersTestSuite.scala:29-74."""

import pytest
from pyspark.sql import functions as F

from tests.fixtures import KNN_INPUT, KNN_RESULTS
from tsne_flink_spark.operators.knn import (
    k_nearest_neighbors,
    partition_knn,
    project_knn,
)
from tsne_flink_spark.sources.readers import points_from_rows


@pytest.fixture(scope="module")
def knn_points(spark):
    return points_from_rows(spark, KNN_INPUT)


def test_k_nearest_neighbors(spark, knn_points):
    result = {
        (r["i"], r["j"], r["v"])
        for r in k_nearest_neighbors(knn_points, 2, "sqeuclidean").collect()
    }
    assert result == set(KNN_RESULTS)


def test_partition_knn_equals_bruteforce(spark, knn_points):
    result = {
        (r["i"], r["j"], r["v"])
        for r in partition_knn(knn_points, 2, "sqeuclidean", blocks=3).collect()
    }
    assert result == set(KNN_RESULTS)


def test_partition_knn_matches_bruteforce_larger(spark):
    import numpy as np

    rng = np.random.default_rng(42)
    pts = [(i, rng.uniform(0, 1, 16).tolist()) for i in range(120)]
    df = points_from_rows(spark, pts)
    brute = {
        (r["i"], r["j"], r["v"])
        for r in k_nearest_neighbors(df, 5).collect()
    }
    blocked = {
        (r["i"], r["j"], r["v"])
        for r in partition_knn(df, 5, blocks=4).collect()
    }
    assert blocked == brute  # bit-for-bit, including distances


def test_project_knn_recall(spark):
    """The reference's own projectKnn test is commented out (nondeterministic);
    we gate on recall vs exact instead."""
    import numpy as np

    rng = np.random.default_rng(7)
    pts = [(i, rng.normal(0, 1, 4).tolist()) for i in range(100)]
    df = points_from_rows(spark, pts)
    k = 5
    exact = {
        (r["i"], r["j"]) for r in k_nearest_neighbors(df, k).collect()
    }
    approx = {
        (r["i"], r["j"])
        for r in project_knn(df, k, iterations=4, seed=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f} too low"


def test_project_knn_recall_pathological_clustering(spark):
    """Clustered-data hardening (VERDICT r4 #5): with ~all mass inside a
    tiny fraction of the coordinate range (a few extreme outliers stretch
    min/max), naive min-max quantization collapses the cluster into a
    handful of curve bins and rank-window recall dies.  The robust
    (mean +- 8 sigma) bounds must keep recall at the normal-data level."""
    import numpy as np

    rng = np.random.default_rng(31)
    n = 2000
    # dense cluster spanning ~1e-5 of the range; 8 outliers at +-50
    X = rng.normal(0.0, 1e-4, (n, 16))
    outliers = rng.choice(n, 8, replace=False)
    X[outliers] = rng.uniform(-50, 50, (8, 16))
    df = points_from_rows(spark, [(i, X[i].tolist()) for i in range(n)])
    k = 10
    exact = {(r["i"], r["j"]) for r in k_nearest_neighbors(df, k).collect()}
    approx = {
        (r["i"], r["j"])
        for r in project_knn(df, k, iterations=4, seed=1).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"pathological-clustering recall {recall:.2f}"


def test_curve_bits_schedule():
    from tsne_flink_spark.operators.knn import _curve_bits

    assert _curve_bits(0) == 16
    assert _curve_bits(100_000) == 19   # ceil(log2 1e5) + 2
    assert _curve_bits(10**12) == 21    # capped
    assert _curve_bits(16_384) == 16    # floor: small N keeps 16-bit keys


def test_robust_bounds_ignore_outliers(spark):
    import numpy as np

    from tsne_flink_spark.operators.knn import _feature_bounds

    rng = np.random.default_rng(5)
    X = rng.normal(0, 1e-3, (500, 3))
    X[0] = [1e6, -1e6, 1e6]
    df = points_from_rows(spark, [(i, X[i].tolist()) for i in range(500)])
    mins, maxs, n = _feature_bounds(df, 3)
    assert n == 500
    # bounds hug the cluster (mean +- 8 sigma of the WHOLE data, outlier
    # included in the moments but not allowed to own the range)
    assert (np.abs(mins) < 1e6 / 2).all() and (np.abs(maxs) < 1e6 / 2).all()
    # without clipping the raw min/max would be +-1e6
    mins_raw, maxs_raw, _ = _feature_bounds(df, 3, robust=False)
    assert (np.abs(mins_raw) == 1e6).any() or (np.abs(maxs_raw) == 1e6).any()


def test_project_knn_shape(spark, knn_points):
    out = project_knn(knn_points, 2, iterations=2, seed=0)
    rows = out.collect()
    # every point appears with <= k neighbors, no self-edges
    by_i = {}
    for r in rows:
        assert r["i"] != r["j"]
        by_i.setdefault(r["i"], []).append(r)
    assert set(by_i) == set(range(9))
    assert all(len(v) <= 2 for v in by_i.values())


def test_global_rank_density_and_determinism(spark):
    """_global_rank_by must produce DENSE 0..N-1 ranks (the silent failure
    mode at N=100k was non-dense ranks from re-sampled range boundaries) and
    must assign IDENTICAL ranks when the result is consumed from two plan
    branches — including for duplicate order keys, which only a total
    (order, tiebreak) sort makes deterministic across shuffle reads."""
    import numpy as np

    from tsne_flink_spark.operators.knn import _global_rank_by

    n = 20_000
    rng = np.random.default_rng(23)
    # heavy duplication: ~1000 distinct keys over 20k rows
    keys = rng.integers(0, 1000, n).astype("int64")
    df = spark.createDataFrame(
        [(int(i), int(k)) for i, k in enumerate(keys)], "id long, key long"
    ).repartition(32)
    ranked = _global_rank_by(df, "key", "id")

    rows = ranked.collect()
    got = sorted(r["__rank"] for r in rows)
    assert got == list(range(n))  # dense, 0-based, no gaps or dupes
    by_rank = {r["__rank"]: (r["key"], r["id"]) for r in rows}
    ordered = [by_rank[i] for i in range(n)]
    assert ordered == sorted(ordered)  # rank order == total (key, id) order

    # two independent consumptions (self-join on id) must agree on ranks
    a = ranked.select(F.col("id").alias("ia"), F.col("__rank").alias("ra"))
    b = ranked.select(F.col("id").alias("ib"), F.col("__rank").alias("rb"))
    mismatches = (
        a.join(b, F.col("ia") == F.col("ib"))
        .where(F.col("ra") != F.col("rb"))
        .count()
    )
    assert mismatches == 0


def test_hilbert_transform_properties():
    """The vectorized Skilling transform must be a bijection whose key order
    walks the grid through ADJACENT cells (the locality property Morton
    lacks and the reason project_knn defaults to curve='hilbert')."""
    import numpy as np

    from tsne_flink_spark.operators.knn import _axes_to_hilbert_transpose

    bits, d = 3, 2
    side = 1 << bits
    coords = np.array([(x, y) for x in range(side) for y in range(side)],
                      dtype=np.uint32)
    T = _axes_to_hilbert_transpose(coords, bits)
    # pack exactly as space_filling_key does: bit-planes msb-first, dim-major
    idx = np.zeros(len(coords), dtype=np.int64)
    for b in range(bits - 1, -1, -1):
        for dim in range(d):
            idx = (idx << 1) | ((T[:, dim] >> b) & 1)
    assert len(set(idx.tolist())) == side * side  # bijection
    order = np.argsort(idx)
    walk = coords[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps == 1).all()  # every step is unit Manhattan: true Hilbert


def test_hilbert_transform_3d_bijection():
    import numpy as np

    from tsne_flink_spark.operators.knn import _axes_to_hilbert_transpose

    bits, d = 2, 3
    side = 1 << bits
    coords = np.array(
        [(x, y, z) for x in range(side) for y in range(side) for z in range(side)],
        dtype=np.uint32,
    )
    T = _axes_to_hilbert_transpose(coords, bits)
    idx = np.zeros(len(coords), dtype=np.int64)
    for b in range(bits - 1, -1, -1):
        for dim in range(d):
            idx = (idx << 1) | ((T[:, dim] >> b) & 1)
    assert len(set(idx.tolist())) == side ** 3
    order = np.argsort(idx)
    walk = coords[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
    assert (steps == 1).all()
