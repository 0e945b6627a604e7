"""Scale probe for operators/graph.connected_components: a synthetic edge
set far beyond bench scale — ring-of-cliques components (the near-dup
regime: many small dense families) PLUS one long path (the adversarial
diameter regime for label propagation).

Usage: python tools/probe_cc.py [n_edges_millions] [path_len]

Records wall time and round count; the convergence claim under test is
O(log diameter) rounds via pointer jumping, with O(|E|)-row shuffles per
round and only a 1-row aggregate on the driver.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    path_len = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("cc-probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_edges = int(millions * 1_000_000)
    # clique components: node i belongs to clique i//8; edges connect each
    # node to (seeded-pseudo-random) other members of its clique
    base = spark.range(n_edges).select(
        (F.col("id") % F.lit(n_edges // 4)).alias("n")
    )
    # ring of 8 within each family (i -> i+1 mod 8): connected, root = 8*q
    cq = F.floor(F.col("n") / 8)
    clique_edges = base.select(
        (cq * 8 + (F.col("n") % 8)).alias("a"),
        (cq * 8 + F.pmod(F.col("n") % 8 + 1, F.lit(8))).alias("b"),
    ).where(F.col("a") != F.col("b"))
    # one long path on a disjoint id range: diameter = path_len
    off = 10 * n_edges
    path_edges = spark.range(path_len).select(
        (F.col("id") + off).alias("a"), (F.col("id") + off + 1).alias("b")
    )
    edges = clique_edges.union(path_edges)

    from tsne_flink_spark.operators import graph
    from tsne_flink_spark.operators.graph import connected_components

    # count rounds by intercepting materialize
    rounds = {"n": 0}
    orig = graph.materialize

    def counting(df):
        rounds["n"] += 1
        return orig(df)

    graph.materialize = counting
    t0 = time.time()
    out = connected_components(edges)
    n_nodes = out.count()
    wall = time.time() - t0
    graph.materialize = orig

    # correctness spot checks: the path collapses to one component rooted at
    # its lowest id; clique roots are multiples of 8
    path_comps = (
        out.where(F.col("id") >= off).select("component").distinct().collect()
    )
    bad_cliques = (
        out.where(F.col("id") < off)
        .where(F.col("component") != F.floor(F.col("id") / 8) * 8)
        .count()
    )
    print(
        f"edges={n_edges + path_len} nodes={n_nodes} "
        f"wall={wall:.1f}s materialize_calls={rounds['n']} "
        f"(propagation rounds = {rounds['n'] - 2}); "
        f"path components={len(path_comps)} (want 1, root {off}): "
        f"{path_comps[:3]}; clique mislabels={bad_cliques} (want 0)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
