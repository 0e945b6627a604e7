"""Round-15 operator changes: pareto_frontier's auto range-merge
selection, the grouped_pareto corpus-sized-groups helper, and the
walk_embeddings partitioning default flip (B89)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _anti_df(spark, n=600, d=3, parts=7):
    """Anti-correlated point set: frontier == input (every point is on
    the simplex sum(c) == d, so no point dominates another)."""
    rng = np.random.default_rng(11)
    X = rng.random((n, d))
    X[:, -1] = d - X[:, :-1].sum(axis=1)
    pdf = pd.DataFrame(X, columns=[f"c{i}" for i in range(d)])
    pdf["id"] = range(n)
    return spark.createDataFrame(pdf).repartition(parts)


def test_pareto_auto_selects_range_merge_on_anticorrelated(spark):
    """merge=True must take the range-distributed phase 2 UNPROMPTED when
    the phase-1 survivor volume crosses the threshold (the 100-TB user
    does not know their correlation structure), and stay single-task
    below it.  The range path is identified from the physical plan: its
    phase 2 is a grouped applyInPandas (FlatMapGroupsInPandas), which
    the single-task path never contains."""
    from tsne_flink_spark.operators.skyline import pareto_frontier

    df = _anti_df(spark)
    cols = ["c0", "c1", "c2"]

    auto = pareto_frontier(df, cols, auto_range_threshold=100)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, "auto did not take range path"

    single = pareto_frontier(df, cols, auto_range_threshold=10**9)
    plan1 = single._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan1, "auto took range path"

    a = sorted(r["id"] for r in auto.collect())
    b = sorted(r["id"] for r in single.collect())
    assert a == b and len(a) == 600  # frontier really was the input


def test_pareto_merge_single_forces_single_task(spark):
    from tsne_flink_spark.operators.skyline import pareto_frontier

    df = _anti_df(spark, n=200)
    out = pareto_frontier(
        df, ["c0", "c1", "c2"], merge="single", auto_range_threshold=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert out.count() == 200


def test_grouped_pareto_matches_by_path(spark):
    """grouped_pareto (driver loop of the two-phase distributed form)
    must return exactly the per-group skylines the by= grouped-map path
    computes — ties, duplicates, and min/max mixes included."""
    from tsne_flink_spark.operators.skyline import (
        grouped_pareto,
        pareto_frontier,
    )

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z"], size=500),
            "c0": rng.integers(0, 12, size=500).astype(float),
            "c1": rng.integers(0, 12, size=500).astype(float),
            "id": range(500),
        }
    )
    df = spark.createDataFrame(pdf).repartition(5)
    mx = [True, False]
    by = pareto_frontier(df, ["c0", "c1"], mx, by=["g"])
    loop = grouped_pareto(df, "g", ["c0", "c1"], mx)
    a = sorted((r["g"], r["id"]) for r in by.collect())
    b = sorted((r["g"], r["id"]) for r in loop.collect())
    assert a == b and len(a) > 0


def test_grouped_pareto_guards_high_cardinality(spark):
    from tsne_flink_spark.operators.skyline import grouped_pareto

    df = spark.range(100).select(
        F.col("id").alias("g"), F.col("id").cast("double").alias("c0")
    )
    with pytest.raises(ValueError, match="max_groups"):
        grouped_pareto(df, "g", ["c0"], max_groups=8)


def test_grouped_pareto_explicit_values_and_null_group(spark):
    from tsne_flink_spark.operators.skyline import grouped_pareto

    pdf = pd.DataFrame(
        {
            "g": ["a", "a", None, None, "b"],
            "c0": [1.0, 2.0, 3.0, 4.0, 5.0],
            "id": range(5),
        }
    )
    df = spark.createDataFrame(pdf)
    out = grouped_pareto(df, "g", ["c0"], values=["a", None])
    got = sorted(r["id"] for r in out.collect())
    assert got == [1, 3]  # max c0 within 'a' and within NULL; 'b' skipped


def test_walk_embeddings_default_partitions_derived(spark):
    """The B89 default: num_partitions=None resolves to
    max(2, defaultParallelism // 4) — asserted through the fitted
    Word2Vec parameters via a monkeypatched fit that records them."""
    from tsne_flink_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long"
    )
    walks = G.random_walks(edges, walk_len=3)
    seen = {}
    import pyspark.ml.feature as mlf

    orig_fit = mlf.Word2Vec.fit

    def spy_fit(self, dataset):
        seen["numPartitions"] = self.getNumPartitions()
        return orig_fit(self, dataset)

    mlf.Word2Vec.fit = spy_fit
    try:
        G.walk_embeddings(walks, dim=4, epochs=1)
    finally:
        mlf.Word2Vec.fit = orig_fit
    expect = max(2, spark.sparkContext.defaultParallelism // 4)
    assert seen["numPartitions"] == expect


def test_pagerank_loop_width_invariant_and_conf_restored(spark, monkeypatch):
    """The r15 scale-adaptive PR-loop shuffle width: ranks are identical
    at width 1 (the tiny-graph derivation), at a forced wide setting
    (SPARK_GRAFT_GRAPH_PARTS), and on both the undirected (no nodes
    left-join) and directed paths — and the session's
    spark.sql.shuffle.partitions is restored afterwards, even though
    the whole loop executed inside the conf window."""
    from tsne_flink_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 11)],
        "a bigint, b bigint",
    )
    before = spark.conf.get("spark.sql.shuffle.partitions")
    for undirected in (True, False):
        monkeypatch.delenv("SPARK_GRAFT_GRAPH_PARTS", raising=False)
        narrow = {
            r["id"]: r["rank"]
            for r in pagerank(edges, undirected=undirected).collect()
        }
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        monkeypatch.setenv("SPARK_GRAFT_GRAPH_PARTS", "16")
        wide = {
            r["id"]: r["rank"]
            for r in pagerank(edges, undirected=undirected).collect()
        }
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
        assert narrow == wide, (undirected, narrow, wide)
