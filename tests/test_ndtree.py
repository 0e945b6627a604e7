"""d-dimensional Barnes-Hut tree (operators/ndtree.py) — the octree path
that serves --nComponents != 2 (beyond reference parity: QuadTree.scala is
2-D only while the reference CLI accepts --nComponents).

Oracles: exact brute-force repulsion in numpy (theta -> 0 must match to
float precision; theta = 0.5 must sit in the same accuracy band as the 2-D
tree), and sequential-vs-merged build equivalence."""

import numpy as np
import pytest

from tsne_flink_spark.operators.ndtree import (
    NDTree,
    build_ndtree,
    merge_ndtrees,
)


def _exact_rep(Y: np.ndarray, q: np.ndarray) -> tuple[np.ndarray, float]:
    d = q - Y
    D2 = (d * d).sum(axis=1)
    w = 1.0 / (1.0 + D2)
    # a bit-equal point contributes nothing (QuadTree.scala:128 semantics)
    mask = D2 > 0.0
    return (w[mask, None] ** 2 * d[mask]).sum(axis=0), float(w[mask].sum())


@pytest.mark.parametrize("dim", [3, 4])
def test_ndtree_theta_zero_matches_exact(dim):
    rng = np.random.default_rng(3)
    Y = rng.normal(0, 5.0, (400, dim))
    Y -= Y.mean(axis=0)
    tree = build_ndtree(Y)
    assert tree.cum[0] == 400
    forces, sumq = tree.repulsive_forces(Y, theta=1e-12, condition="scaled")
    for i in rng.choice(400, 40, replace=False):
        want_f, want_s = _exact_rep(Y, Y[i])
        assert np.allclose(forces[i], want_f, atol=1e-9), i
        assert abs(sumq[i] - want_s) < 1e-9


def test_ndtree_theta_half_accuracy_band_3d():
    """theta=0.5 mean relative force error must be in the same band the 2-D
    tree sits in on comparable data (~0.2 measured, B14): gate <= 0.35."""
    rng = np.random.default_rng(11)
    Y = np.concatenate([
        rng.normal((-10, -5, 8), 3.0, (300, 3)),
        rng.normal((12, 8, -6), 4.0, (300, 3)),
        rng.uniform(-25, 25, (200, 3)),
    ])
    Y -= Y.mean(axis=0)
    tree = build_ndtree(Y)
    forces, sumq = tree.repulsive_forces(Y, theta=0.5, condition="scaled")
    errs = []
    tot_exact = 0.0
    for i in rng.choice(len(Y), 60, replace=False):
        want_f, _ = _exact_rep(Y, Y[i])
        scale = max(np.linalg.norm(want_f), 1e-12)
        errs.append(np.linalg.norm(forces[i] - want_f) / scale)
    assert float(np.mean(errs)) <= 0.35, np.mean(errs)
    # global sum_q (the normalizer) must be tight even when per-point forces
    # cancel: within 5% of exact (measured 1.9% at theta=0.5 on this data —
    # sum_q carries the same COM-approximation error class as the forces)
    exact_total = sum(_exact_rep(Y, Y[i])[1] for i in range(len(Y)))
    assert abs(sumq.sum() - exact_total) / exact_total < 0.05


def test_ndtree_merge_equivalence():
    """Per-chunk trees merged pairwise must produce the same evaluation as
    one sequential build (structure is point-set-determined; sums agree up
    to FP summation order)."""
    rng = np.random.default_rng(7)
    Y = rng.normal(0, 10.0, (600, 3))
    # include coincident points: the weighted re-seat rule must hold in d=3
    Y[50] = Y[10]
    Y[51] = Y[10]
    Y -= Y.mean(axis=0)

    seq = build_ndtree(Y)
    center = np.zeros(3)
    half = float((Y.max(axis=0) - Y.min(axis=0)).max())
    chunks = []
    for part in np.array_split(Y, 4):
        t = NDTree(center, half, capacity_hint=8 * len(part))
        for row in part:
            t.insert(row)
        chunks.append(t.trim())
    merged = chunks[0]
    for t in chunks[1:]:
        merged = merge_ndtrees(merged, t)

    assert merged.cum[0] == seq.cum[0] == 600
    f1, s1 = seq.repulsive_forces(Y, theta=0.5, condition="scaled")
    f2, s2 = merged.repulsive_forces(Y, theta=0.5, condition="scaled")
    assert np.allclose(f1, f2, atol=1e-9)
    assert np.allclose(s1, s2, atol=1e-9)


def test_ndtree_coincident_and_outside_points():
    t = NDTree(np.zeros(3), 1.0)
    assert t.insert([0.1, 0.1, 0.1])
    assert t.insert([0.1, 0.1, 0.1])  # coincident accumulates
    assert t.insert([-0.5, 0.2, 0.3])
    assert not t.insert([5.0, 0.0, 0.0])  # outside root: dropped
    assert t.cum[0] == 3
    f, s = t.repulsive_forces(np.array([[0.1, 0.1, 0.1]]), 1e-12, "scaled")
    # only the one distinct other point repels; the 2 coincident copies don't
    want_f, want_s = _exact_rep(
        np.array([[0.1, 0.1, 0.1], [0.1, 0.1, 0.1], [-0.5, 0.2, 0.3]]),
        np.array([0.1, 0.1, 0.1]),
    )
    assert np.allclose(f[0], want_f, atol=1e-12)
    assert abs(s[0] - want_s) < 1e-12


def test_gradient_3d_barnes_hut_matches_exact(spark):
    """End-to-end through the Spark gradient: n_components=3 with theta>0
    (NDTree path, distributed build) must agree with the exact theta=0
    gradient within the 2-D tolerance band."""
    from tsne_flink_spark.operators.gradient import gradient

    rng = np.random.default_rng(13)
    n = 300
    Y = rng.normal(0, 8.0, (n, 3))
    Y -= Y.mean(axis=0)
    emb = spark.createDataFrame(
        [(int(i), Y[i].tolist()) for i in range(n)], "id int, y array<double>"
    )
    # small ring-sparse P
    p_rows = [(i, (i + 1) % n, 1.0 / n) for i in range(n)]
    p = spark.createDataFrame(p_rows, "i int, j int, v double")

    g_exact, _ = gradient(p, emb, theta=0.0, n_components=3)
    g_bh, _ = gradient(
        p, emb, theta=0.5, n_components=3, bh_condition="scaled",
        tree_build="distributed",
    )
    ge = {r["id"]: np.array(r["dy"]) for r in g_exact.collect()}
    gb = {r["id"]: np.array(r["dy"]) for r in g_bh.collect()}
    errs = [
        np.linalg.norm(gb[i] - ge[i]) / max(np.linalg.norm(ge[i]), 1e-12)
        for i in ge
    ]
    assert float(np.mean(errs)) <= 0.35, np.mean(errs)


def test_optimize_3d_full_loop(spark):
    """The driver loop must run end-to-end at n_components=3, theta>0
    (the CLI surface the 2-D-only BH path used to reject)."""
    from tsne_flink_spark.operators.affinities import (
        joint_distribution,
        pairwise_affinities,
    )
    from tsne_flink_spark.operators.embedding import init_working_set
    from tsne_flink_spark.operators.knn import partition_knn
    from tsne_flink_spark.operators.optimize import optimize

    rng = np.random.default_rng(5)
    n = 200
    X = rng.normal(0, 1.0, (n, 8))
    pts = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)], "id int, features array<double>"
    )
    knn = partition_knn(pts, 6, "sqeuclidean").persist()
    P = joint_distribution(pairwise_affinities(knn, 4.0)).persist()
    ws = init_working_set(pts.select("id"), n_components=3, random_state=0)
    out = optimize(
        P, ws, iterations=4, theta=0.5, n_components=3, bh_condition="scaled"
    )
    rows = out.collect()
    assert len(rows) == n
    Y = np.array([r["y"] for r in rows])
    assert Y.shape == (n, 3)
    assert np.isfinite(Y).all()
    assert np.abs(Y.mean(axis=0)).max() < 1e-6  # ends with center_embedding


def test_bulk_build_equals_sequential_insert():
    """The vectorized level-synchronous build must produce a tree
    structurally identical to per-point insert() on adversarial data:
    exact duplicates, points on split planes, out-of-root drops."""
    from tsne_flink_spark.operators.ndtree import NDTree, _bulk_build

    rng = np.random.default_rng(31)
    for d in (1, 2, 3, 4):
        base = rng.normal(0, 5.0, (300, d))
        dup = np.repeat(base[:20], 3, axis=0)       # coincident clusters
        onplane = base[:15].copy()
        onplane[:, 0] = 0.0                          # on the root split plane
        outside = rng.normal(0, 5.0, (10, d)) + 100  # dropped by containment
        Y = np.concatenate([base, dup, onplane, outside])
        Y = Y[rng.permutation(len(Y))]

        center = np.zeros(d)
        half = float((Y.max(axis=0) - Y.min(axis=0)).max())
        seq = NDTree(center, half)
        for row in Y:
            seq.insert(row)
        seq.trim()
        bulk = _bulk_build(NDTree(center, half), Y).trim()

        assert bulk.cum[0] == seq.cum[0]
        # same mass distribution: compare canonical (path-keyed) node maps
        def node_map(t):
            out = {}
            stack = [(0, ())]
            while stack:
                n, path = stack.pop()
                out[path] = (
                    int(t.cum[n]), tuple(np.round(t.s[n], 9)),
                    bool(t.has_point[n]),
                    tuple(t.p[n]) if t.has_point[n] else None,
                )
                if t.children[n, 0] != -1:
                    for c in range(t.nc):
                        stack.append((int(t.children[n, c]), path + (c,)))
            return out

        ms, mb = node_map(seq), node_map(bulk)
        assert ms == mb, f"d={d}: tree mismatch"

        # query results agree to float-sum reassociation (np.add.at
        # accumulates s in a different order than sequential insert)
        Q = rng.normal(0, 5.0, (64, d))
        fs, ss = seq.repulsive_forces(Q, 0.5, condition="scaled")
        fb, sb = bulk.repulsive_forces(Q, 0.5, condition="scaled")
        assert np.allclose(fs, fb, rtol=1e-12, atol=1e-12)
        assert np.allclose(ss, sb, rtol=1e-12, atol=1e-12)


def test_depth_exhaustion_terminal_leaf():
    """Points separated only below _MAX_DEPTH levels must land in ONE
    terminal accumulate-only leaf (no massless last-level subdivide — that
    shape loses the cluster's mass in force queries, which expand internal
    nodes and drop empty children).  Sequential insert (lex order) and bulk
    build agree, and exact evaluation sees all the mass."""
    from tsne_flink_spark.operators.ndtree import (
        _MAX_DEPTH,
        NDTree,
        _bulk_build,
    )

    d = 2
    # Coordinates chosen exactly representable, strictly interior to every
    # cell through depth 63 (the 2^-80 guard bit keeps them off all split
    # planes, dodging the documented 1-ulp boundary-drop edge), separated
    # by 2^-70 < root_extent * 2^-63 so they share a cell at every level.
    base = 2.0**-34 + 2.0**-80
    p1 = np.array([base, base])
    p2 = np.array([base + 2.0**-70, base])
    far = np.full(d, 0.51)
    Y = np.array([p1, p2, far])

    seq = NDTree(np.zeros(d), 1.0)
    for row in Y:
        assert seq.insert(row)
    seq.trim()
    bulk = _bulk_build(NDTree(np.zeros(d), 1.0), Y).trim()

    for t in (seq, bulk):
        assert t.cum[0] == 3
        assert int(t.depth[: t.n_nodes].max()) <= _MAX_DEPTH - 1
        md = int(t.depth[: t.n_nodes].max())
        occupied = np.flatnonzero(
            (t.depth[: t.n_nodes] == md) & (t.cum[: t.n_nodes] > 0)
        )
        assert len(occupied) == 1  # one terminal leaf holds the pair
        deepest = int(occupied[0])
        assert t.children[deepest, 0] == -1  # terminal LEAF, not internal
        assert t.cum[deepest] == 2           # both near-coincident points
        assert t.has_point[deepest] and np.array_equal(t.p[deepest], p1)

    # exact (theta=0) evaluation accounts for every point's mass
    Q = np.array([far + 0.25])
    brute = sum(1.0 / (1.0 + ((Q[0] - p) ** 2).sum()) for p in Y)
    for t in (seq, bulk):
        _, sq = t.repulsive_forces(Q, 0.0)
        assert np.isclose(sq[0], brute, rtol=1e-9)
