"""Round-13 operator tests: DeepWalk skip-gram embeddings over random
walks (operators/graph.walk_embeddings), the batched k-core peel, and the
d>=3 skyline kernel."""

from __future__ import annotations

import itertools

import numpy as np
import pytest


def _cos(E, a, b):
    va, vb = E[a], E[b]
    return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))


def test_walk_embeddings_separate_cliques(spark):
    """Two 5-cliques joined by one weak edge: same-clique (co-walked)
    pairs must embed far more cosine-similar than cross-clique pairs —
    the DeepWalk contract the gated check asserts at corpus scale."""
    from tsne_flink_spark.operators.graph import random_walks, walk_embeddings

    c1, c2 = list(range(1, 6)), list(range(10, 15))
    edges = (
        [(a, b) for a, b in itertools.combinations(c1, 2)]
        + [(a, b) for a, b in itertools.combinations(c2, 2)]
        + [(5, 10)]
    )
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    walks = random_walks(df, walk_len=6, seed=1)
    for s in (2, 3):
        walks = walks.unionByName(random_walks(df, walk_len=6, seed=s))
    rows = walk_embeddings(walks, dim=8, epochs=4).collect()
    E = {r["id"]: np.array(r["emb"]) for r in rows}
    # every node with an edge is embedded, at the requested dim
    assert set(E) == set(c1) | set(c2)
    assert all(len(v) == 8 for v in E.values())
    assert all(np.all(np.isfinite(v)) for v in E.values())
    same = [_cos(E, a, b) for a, b in itertools.combinations(c1, 2)]
    same += [_cos(E, a, b) for a, b in itertools.combinations(c2, 2)]
    cross = [_cos(E, a, b) for a in c1 for b in c2]
    assert np.mean(same) > np.mean(cross) + 0.5, (
        f"same {np.mean(same):.3f} vs cross {np.mean(cross):.3f}"
    )


def test_kcore_batched_peel_identical_on_chain(spark):
    """The batched peel (peel_batch=3) must return bit-identical (id,
    deg) output to level-at-a-time peeling (peel_batch=1) on the
    adversarial chain case, in strictly fewer driver rounds."""
    from tsne_flink_spark.operators.graph import k_core

    n = 20  # chain 1..20 peels away; 4-clique survives as the 2-core
    edges = [(i, i + 1) for i in range(1, n)]
    cl = [n + 1, n + 2, n + 3, n + 4]
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1 :]]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    s1: dict = {}
    s3: dict = {}
    out1 = sorted(
        (r["id"], r["deg"])
        for r in k_core(df, k=2, peel_batch=1, _stats=s1).collect()
    )
    out3 = sorted(
        (r["id"], r["deg"])
        for r in k_core(df, k=2, peel_batch=3, _stats=s3).collect()
    )
    assert out1 == out3 == [(c, 3) for c in cl]
    assert s3["driver_rounds"] < s1["driver_rounds"]


def test_kcore_peel_batch_validation(spark):
    from tsne_flink_spark.operators.graph import k_core

    df = spark.createDataFrame([(1, 2)], "a bigint, b bigint")
    with pytest.raises(ValueError):
        k_core(df, peel_batch=0)


def test_walk_embeddings_empty_walks(spark):
    from tsne_flink_spark.operators.graph import walk_embeddings

    walks = spark.createDataFrame(
        [], "walk_id bigint, step int, node bigint"
    )
    assert walk_embeddings(walks, dim=4).collect() == []
