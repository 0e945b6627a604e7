"""PageRank (operators/graph.py) against a pure-python power iteration
on hand-built graphs, including dangling nodes and disconnected parts."""

import numpy as np
import pytest


def _ref_pagerank(edges, n_ids, iters=10, d=0.85, undirected=True):
    """Dense numpy reference with the same conventions (mass = N)."""
    ids = sorted(n_ids)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    es = set()
    for a, b in edges:
        if a == b:
            continue
        es.add((a, b))
        if undirected:
            es.add((b, a))
    for a, b in es:
        A[idx[b], idx[a]] = 1.0
    deg = A.sum(axis=0)
    r = np.ones(n)
    for _ in range(iters):
        contrib = np.zeros(n)
        nz = deg > 0
        contrib += A[:, nz] @ (r[nz] / deg[nz])
        dangling = r[~nz].sum()
        r = (1 - d) + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in ids}


def test_pagerank_matches_reference_undirected(spark):
    from tsne_flink_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (10, 11)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {r["id"]: r["rank"] for r in pagerank(df).collect()}
    ids = {x for e in edges for x in e}
    want = _ref_pagerank(edges, ids)
    assert set(got) == ids
    for v in ids:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # hub 3 outranks leaf 4; total mass conserved at N
    assert got[3] > got[4]
    assert sum(got.values()) == pytest.approx(len(ids), abs=1e-6)


def test_pagerank_directed_with_dangling(spark):
    from tsne_flink_spark.operators.graph import pagerank

    # 3 is a dangling sink: its mass must redistribute, not vanish
    edges = [(1, 3), (2, 3), (1, 2)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    got = {
        r["id"]: r["rank"]
        for r in pagerank(df, undirected=False).collect()
    }
    want = _ref_pagerank(edges, {1, 2, 3}, undirected=False)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert got[3] > got[2] > got[1]  # sink collects, source teleports only
    assert sum(got.values()) == pytest.approx(3.0, abs=1e-6)


def test_pagerank_duplicate_and_self_edges_ignored(spark):
    from tsne_flink_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (1, 1)], "a bigint, b bigint"
    )
    got = {r["id"]: r["rank"] for r in pagerank(df).collect()}
    # symmetric 2-node graph: uniform ranks
    assert got[1] == pytest.approx(1.0, abs=1e-12)
    assert got[2] == pytest.approx(1.0, abs=1e-12)


def test_triangle_census_orientations_agree(spark):
    """Degree-oriented census (orient_by_degree=True) must equal the
    id-ordered default on a graph with hubs, skewed degrees, duplicate
    and self edges — and both must equal a brute-force count."""
    from itertools import combinations

    from tsne_flink_spark.operators.graph import triangle_stats

    rng = np.random.default_rng(11)
    n = 40
    edges = [(1, k) for k in range(2, 30)]  # hub
    edges += [
        tuple(sorted(rng.choice(n, size=2, replace=False) + 1))
        for _ in range(150)
    ]
    edges += [(2, 2), (3, 4), (4, 3)]  # self edge + duplicate reversed
    adj = {(a, b) for a, b in edges if a != b} | {
        (b, a) for a, b in edges if a != b
    }
    nodes = sorted({v for e in adj for v in e})
    brute = sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a bigint, b bigint"
    )
    plain = triangle_stats(df).collect()[0].asDict()
    oriented = triangle_stats(df, orient_by_degree=True).collect()[0].asDict()
    assert plain == oriented
    assert plain["n_triangles"] == brute


def test_round11_ops_on_empty_inputs(spark):
    """Zero-row inputs flow through the round-11 operators: the census
    emits one fully-typed zero row (no NULL wedge count), directed
    PageRank and the sketch union return empty, and the Bloom annotate
    handles an empty batch against a non-empty index."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.operators.graph import pagerank, triangle_stats
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate_bloom,
    )
    from tsne_flink_spark.pipeline.sketches import sketch_shards, sketch_union

    empty_edges = spark.createDataFrame([], "a long, b long")
    for oriented in (False, True):
        row = triangle_stats(empty_edges, orient_by_degree=oriented).collect()
        assert len(row) == 1
        r = row[0].asDict()
        assert r == {
            "n_nodes": 0, "n_edges": 0, "n_wedges": 0,
            "n_triangles": 0, "clustering_coefficient": 0.0,
        }, r
    assert pagerank(empty_edges, undirected=False).collect() == []

    empty_ev = spark.createDataFrame(
        [], "event_type string, user_id long, ts timestamp"
    )
    shards = sketch_shards(
        empty_ev, ["event_type"], "user_id",
        F.pmod(F.xxhash64("ts"), F.lit(8)),
    )
    assert sketch_union(shards, ["event_type"]).collect() == []

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "AA")], "doc_id long, text string"
    )
    out = incremental_dedup_annotate_bloom(empty_docs, fingerprint_index(docs))
    assert out.collect() == []
