"""Round-14 operator tests: the component-sharded DeepWalk embedding
path (operators/graph.embed_by_component) and the availableNow mode of
the streaming sketch producers."""

import itertools

import numpy as np
from pyspark.sql import functions as F


def _cos(E, a, b):
    va, vb = E[a], E[b]
    return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))


def test_embed_by_component_two_disconnected_components(spark):
    """Two DISCONNECTED components, each itself a pair of 5-cliques
    joined by one weak edge, sharded into separate Word2Vec fits: every
    walked node embedded exactly once at the requested dim, and WITHIN
    each component the same-clique pairs embed far more similar than
    cross-clique pairs — the relative DeepWalk contract (absolute
    cosine is meaningless; only contrast against non-co-walked pairs
    is) that sharding must preserve, since walks never leave a
    component and each per-shard fit sees the identical co-occurrence
    signal the monolithic fit would."""
    from tsne_flink_spark.operators.graph import (
        embed_by_component,
        random_walks,
    )

    def clique(nodes):
        return [(a, b) for a, b in itertools.combinations(nodes, 2)]

    c1a, c1b = list(range(1, 6)), list(range(10, 15))
    c2a, c2b = list(range(20, 25)), list(range(30, 35))
    edges = (
        clique(c1a) + clique(c1b) + [(5, 10)]      # component 1
        + clique(c2a) + clique(c2b) + [(24, 30)]   # component 2
    )
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    walks = random_walks(df, walk_len=6, seed=1)
    for s in (2, 3):
        walks = walks.unionByName(random_walks(df, walk_len=6, seed=s))

    out = embed_by_component(df, walks, dim=8, epochs=4, n_shards=2)
    rows = out.collect()
    E = {r["id"]: np.array(r["emb"]) for r in rows}
    allnodes = set(c1a) | set(c1b) | set(c2a) | set(c2b)
    # disjoint union: every node exactly once, correct dim, finite
    assert len(rows) == len(E) == len(allnodes)
    assert set(E) == allnodes
    assert all(len(v) == 8 for v in E.values())
    assert all(np.all(np.isfinite(v)) for v in E.values())
    # within-component contrast survives sharding
    for ca, cb in ((c1a, c1b), (c2a, c2b)):
        same = [_cos(E, a, b) for a, b in itertools.combinations(ca, 2)]
        same += [_cos(E, a, b) for a, b in itertools.combinations(cb, 2)]
        cross = [_cos(E, a, b) for a in ca for b in cb]
        assert np.mean(same) > np.mean(cross) + 0.5, (
            f"same {np.mean(same):.3f} vs cross {np.mean(cross):.3f}"
        )


def test_embed_by_component_never_splits_a_component(spark):
    """n_shards larger than the component count: every component still
    lands whole in exactly one shard (mod assignment cannot split one),
    and no node is duplicated or dropped."""
    from tsne_flink_spark.operators.graph import (
        embed_by_component,
        random_walks,
    )

    # a 4-cycle and a 3-path, disconnected
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (20, 21), (21, 22)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    walks = random_walks(df, walk_len=4, seed=1).unionByName(
        random_walks(df, walk_len=4, seed=2)
    )
    out = embed_by_component(df, walks, dim=4, epochs=2, n_shards=8)
    ids = [r["id"] for r in out.select("id").collect()]
    assert sorted(ids) == [1, 2, 3, 4, 20, 21, 22]


def test_streaming_kmv_shards_available_now(spark, tmp_path):
    """available_now=True drains a bounded file stream and terminates —
    the mode the streaming_countmin gate query (and any backlog replay)
    depends on; the drained store must union to the batch sketch."""
    from tsne_flink_spark.pipeline.sketches import (
        countmin_estimate,
        countmin_sketch,
        countmin_union,
        streaming_countmin_shards,
    )

    df = spark.createDataFrame(
        [(f"w{i % 7}",) for i in range(200)], "t string"
    )
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    df.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("t string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_countmin_shards(
        stream, store, "t", w=64, d=3, available_now=True
    )
    q.awaitTermination(120)
    shards = spark.read.parquet(store)
    assert shards.select("shard").distinct().count() == 3
    probes = df.select("t").distinct()
    streamed = {
        r["t"]: r["est"]
        for r in countmin_estimate(
            countmin_union(shards), probes, "t"
        ).collect()
    }
    batch = {
        r["t"]: r["est"]
        for r in countmin_estimate(
            countmin_sketch(df, "t", w=64, d=3), probes, "t"
        ).collect()
    }
    # the shard union is an exact elementwise sum: identical estimates
    assert streamed == batch


def test_skyline_nd_blocked_matches_bruteforce():
    """The d>=4 blocked sweep (vectorized chunks replacing the per-row
    Python loop) must equal the O(n^2) brute force on ties, duplicates,
    anti-correlated frontiers, and cross-chunk dominance (tiny block)."""
    import numpy as np

    from tsne_flink_spark.operators.skyline import (
        _skyline_indices,
        _skyline_nd_blocked,
    )

    def brute(pts):
        keep = []
        for i in range(len(pts)):
            if not any(
                (pts[j] >= pts[i]).all() and (pts[j] > pts[i]).any()
                for j in range(len(pts))
                if j != i
            ):
                keep.append(i)
        return np.array(sorted(keep), dtype=np.int64)

    rng = np.random.default_rng(3)
    for d in (4, 5):
        pts = rng.integers(0, 5, size=(250, d)).astype(float)  # ties+dups
        assert np.array_equal(_skyline_indices(pts), brute(pts))
        anti = rng.random((300, d))
        anti[:, -1] = d - anti[:, :-1].sum(axis=1)  # frontier == input
        assert np.array_equal(_skyline_indices(anti), brute(anti))
    # tiny block forces many cross-chunk kept-matrix tests
    pts = rng.integers(0, 4, size=(200, 4)).astype(float)
    assert np.array_equal(_skyline_nd_blocked(pts, block=13), brute(pts))


def test_pareto_range_merge_matches_single_task(spark):
    """merge='range' (distributed phase-2 on range blocks of the first
    criterion) must return the exact same row SET as the single-task
    merge — uniform, anti-correlated (frontier == input), and mixed
    min/max directions, across awkward partition counts."""
    import numpy as np
    import pandas as pd

    from tsne_flink_spark.operators.skyline import pareto_frontier

    rng = np.random.default_rng(5)
    cases = [
        (4, 800, False, None),
        (4, 600, True, None),
        (4, 500, False, [True, False, True, False]),
    ]
    for d, n, anti, mx in cases:
        cols = [f"c{i}" for i in range(d)]
        X = rng.integers(0, 20, size=(n, d)).astype(float)  # ties+dups
        if anti:
            X = rng.random((n, d))
            X[:, -1] = d - X[:, :-1].sum(axis=1)
        pdf = pd.DataFrame(X, columns=cols)
        pdf["id"] = range(n)
        df = spark.createDataFrame(pdf).repartition(7)
        a = sorted(r["id"] for r in pareto_frontier(df, cols, mx).collect())
        b = sorted(
            r["id"]
            for r in pareto_frontier(
                df, cols, mx, merge="range", merge_partitions=5
            ).collect()
        )
        assert a == b, (d, n, anti, len(a), len(b))
        if anti:
            assert len(a) == n  # the adversarial shape really was one
