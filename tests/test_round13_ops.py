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


def _brute_skyline(pts: np.ndarray) -> set[int]:
    keep = set()
    for i in range(len(pts)):
        dominated = False
        for j in range(len(pts)):
            if i == j:
                continue
            if (pts[j] >= pts[i]).all() and (pts[j] > pts[i]).any():
                dominated = True
                break
        if not dominated:
            keep.add(i)
    return keep


def test_skyline_3d_matches_bruteforce():
    """The d=3 staircase sweep vs the O(n^2) reference, on random data
    with engineered ties, duplicates, and collinear points."""
    from tsne_flink_spark.operators.skyline import _skyline_indices

    rng = np.random.default_rng(11)
    for trial in range(6):
        pts = rng.integers(0, 8, size=(120, 3)).astype(float)
        pts[10] = pts[11]  # exact duplicates: both kept or both dropped
        pts[12, :2] = pts[13, :2]  # tie on two dims
        got = set(_skyline_indices(pts).tolist())
        assert got == _brute_skyline(pts), f"trial {trial}"


def test_skyline_3d_anticorrelated_frontier_is_everything():
    """Points on the x+y+z=const simplex are mutually non-dominated —
    the worst case the staircase sweep must keep at O(n log n)."""
    from tsne_flink_spark.operators.skyline import _skyline_indices

    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, size=(500, 2))
    pts = np.column_stack([a[:, 0], a[:, 1], 2.0 - a.sum(axis=1)])
    assert len(_skyline_indices(pts)) == 500


def test_skyline_3d_via_dataframe(spark):
    """End-to-end pareto_frontier with 3 criteria incl. a minimized one."""
    from tsne_flink_spark.operators.skyline import pareto_frontier

    rows = [
        (1, 10.0, 5.0, 3.0),   # dominated by 2 (equal p, q; worse min c)
        (2, 10.0, 5.0, 2.0),
        (3, 9.0, 4.0, 4.0),    # dominated by 2 on all three
        (4, 12.0, 1.0, 9.0),
        (5, 12.0, 1.0, 9.0),   # exact duplicate of 4: both kept
    ]
    df = spark.createDataFrame(rows, "id int, p double, q double, c double")
    got = sorted(
        r["id"]
        for r in pareto_frontier(
            df, ["p", "q", "c"], maximize=[True, True, False]
        ).collect()
    )
    assert got == [2, 4, 5]


def test_event_transitions_custom_id_col(spark):
    """event_transitions must honor a renamed tie-break column (r12
    ADVICE: the signature parameterized ts/user/type but hardcoded
    event_id)."""
    from tsne_flink_spark.streaming.events import event_transitions

    rows = [
        (1, 10, "a", 100),
        (1, 10, "b", 101),  # same ts: tie-break by custom id
        (1, 20, "c", 102),
    ]
    df = spark.createDataFrame(
        rows, "uid bigint, t bigint, etype string, my_id bigint"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(
            df, ts_col="t", user_col="uid", type_col="etype", id_col="my_id"
        ).collect()
    }
    assert got == {("a", "b"): (1, 1.0), ("b", "c"): (1, 1.0)}


def test_weighted_sample_by_per_group(spark):
    """Per-group A-ES: exactly k rows per group (fewer when the group is
    smaller), and within one group the selection equals the GLOBAL
    weighted_sample restricted to that group (same key arithmetic)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.curation import (
        weighted_sample,
        weighted_sample_by,
    )

    rows = [(i, "en" if i % 3 else "de", 10 + i) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars int")
    out = weighted_sample_by(df, ["lang"], 5, F.col("n_chars") + F.lit(1))
    by_lang: dict = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by_lang["en"]) == 5 and len(by_lang["de"]) == 5
    solo = weighted_sample(
        df.where(F.col("lang") == "en"), 5, F.col("n_chars") + F.lit(1)
    )
    assert {r["doc_id"] for r in solo.collect()} == by_lang["en"]
    # a group smaller than k returns the whole group
    tiny = weighted_sample_by(
        df.where(F.col("doc_id") < 4), ["lang"], 5, F.lit(1.0)
    )
    assert tiny.count() == 4


def test_countmin_overestimates_and_exact_when_sparse(spark):
    """Count-min invariants: estimates are NEVER below the true count;
    with w >> distinct values, collisions are unlikely and estimates are
    exact for this fixed corpus (deterministic md5 hashing — checked)."""
    from tsne_flink_spark.pipeline.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    vals = ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + ["dd"] * 5
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    sk = countmin_sketch(df, "t", w=256, d=4)
    rows = sk.collect()
    assert {r["depth"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["counts"]) == 256 for r in rows)
    assert all(sum(r["counts"]) == len(vals) for r in rows)  # mass per row
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("dd",), ("missing",)], "t string"
    )
    est = {
        r["t"]: r["est"]
        for r in countmin_estimate(sk, probes, "t").collect()
    }
    true = {"a": 7, "b": 3, "c": 1, "dd": 5, "missing": 0}
    for t, n in true.items():
        assert est[t] >= n
    # at w=256 with 4 distinct values, no depth collides on all 4 rows
    assert est == true


def test_countmin_union_equals_single_build(spark):
    """Merging per-shard sketches == the sketch of the concatenated
    input, bit-for-bit (elementwise counter sum is lossless)."""
    from tsne_flink_spark.pipeline.sketches import (
        countmin_sketch,
        countmin_union,
    )

    a = spark.createDataFrame([(f"v{i % 5}",) for i in range(40)], "t string")
    b = spark.createDataFrame([(f"v{i % 7}",) for i in range(30)], "t string")
    sep = countmin_union(
        countmin_sketch(a, "t", w=64, d=3).unionByName(
            countmin_sketch(b, "t", w=64, d=3)
        )
    )
    one = countmin_sketch(a.unionByName(b), "t", w=64, d=3)
    got = {r["depth"]: list(r["counts"]) for r in sep.collect()}
    want = {r["depth"]: list(r["counts"]) for r in one.collect()}
    assert got == want


def test_walk_embeddings_empty_walks(spark):
    from tsne_flink_spark.operators.graph import walk_embeddings

    walks = spark.createDataFrame(
        [], "walk_id bigint, step int, node bigint"
    )
    assert walk_embeddings(walks, dim=4).collect() == []


def test_semantic_decontaminate_kills_planted_leak(spark):
    """A train vector equal to a holdout vector (sim 1.0) is killed; a
    scaled copy (same direction) too (cosine is scale-invariant); an
    orthogonal vector survives; the returned sim matches numpy."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.semantic import semantic_decontaminate

    hold = [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])]
    train = [
        (1, [1.0, 0.0, 0.0, 0.0]),     # exact leak
        (2, [0.0, 2.0, 0.0, 0.0]),     # scaled leak
        (3, [0.0, 0.0, 1.0, 0.0]),     # orthogonal: survives
        (4, [1.0, 1.0, 0.0, 0.0]),     # cos 1/sqrt(2) = 0.7071
    ]
    schema = "vec_id bigint, embedding array<double>"
    out = {
        r["vec_id"]: r["max_holdout_sim"]
        for r in semantic_decontaminate(
            spark.createDataFrame(train, schema),
            spark.createDataFrame(hold, schema),
            threshold=0.7,
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    assert out[1] == pytest.approx(1.0)
    assert out[2] == pytest.approx(1.0)
    assert out[4] == pytest.approx(2 ** -0.5)
