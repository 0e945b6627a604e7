"""Round-12 probe: the two NEW graph operators at ≥1M edges on the same
shifted-Zipf power-law graph as probe_graph_scale.py (B68) — pins the
per-round O(|E|) claim for synchronous label propagation and the
degree-cap's wedge-fan-out bound for Adamic-Adar, with wall AND shuffle
numbers from the UI REST API.

Why the cap matters here, concretely: the graph's top hub has degree
~2% of draws (tens of thousands), so UNCAPPED wedge enumeration through
it alone is C(d, 2) ≈ 10^8-10^9 candidate rows — the quadratic blowup
the ``max_degree`` parameter exists to cut.  The probe measures the
capped run (max_degree = √m, the Schank-Wagner-style threshold) and
reports the wedge volume the cap admitted vs the Σ C(d,2) the full
graph would have generated, plus a small-cap sanity equality against a
driver-side reference on a subsampled graph.

Usage: python tools/probe_graph_r12.py [n_draws] [n_ranks]
(defaults 1_300_000 draws over 300_000 ranks → ~1.05M distinct edges)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from probe_graph_scale import rest_totals


def main() -> None:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 1_300_000
    n_ranks = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-graph-r12")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.operators.graph import adamic_adar, label_propagation

    # identical generator to probe_graph_scale.py (B68)
    rng = np.random.default_rng(12)
    q = 10.0
    u = rng.uniform(0.0, 1.0, size=(n_draws, 2))
    r = ((q + 1.0) * ((n_ranks + q + 1.0) / (q + 1.0)) ** u - (q + 1.0)).astype(
        np.int64
    )
    r = np.clip(r, 0, n_ranks - 1)
    r = (r * 1_000_003) % n_ranks
    mask = r[:, 0] != r[:, 1]
    a, b = r[mask, 0], r[mask, 1]
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b})
    ).dropDuplicates(["a", "b"])
    edges = edges.repartition(2 * int(cpus)).cache()
    m = edges.count()

    # undirected degree table (what adamic_adar caps on) + the wedge
    # budget arithmetic the cap buys
    und = (
        edges.select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.selectExpr("a as v")
        .union(und.selectExpr("b as v"))
        .groupBy("v")
        .count()
    ).cache()
    cap = int(m**0.5)
    stats = deg.agg(
        F.sum(F.expr("count * (count - 1) / 2")).alias("wedges_all"),
        F.sum(
            F.when(F.col("count") <= cap, F.expr("count * (count - 1) / 2"))
        ).alias("wedges_capped"),
        F.max("count").alias("max_deg"),
        F.count(F.lit(1)).alias("n_nodes"),
    ).collect()[0]
    print(
        f"graph: {m:,} directed edges, {stats['n_nodes']:,} nodes, "
        f"max degree {stats['max_deg']:,}; wedge budget uncapped "
        f"{int(stats['wedges_all']):,} vs cap≤√m={cap}: "
        f"{int(stats['wedges_capped']):,} "
        f"({stats['wedges_all'] / max(stats['wedges_capped'], 1):.0f}× cut)"
    )

    base0 = rest_totals(4049)
    iters = 4
    t0 = time.time()
    lp = label_propagation(edges, iters=iters)
    n_lab = lp.count()
    n_comm = lp.select("community").distinct().count()
    t_lp = time.time() - t0
    base1 = rest_totals(4049)
    d_lp = base1["shuffle_read_rows"] - base0["shuffle_read_rows"]
    print(
        f"label_propagation: {iters} rounds over {n_lab:,} nodes in "
        f"{t_lp:.1f}s ({t_lp / iters:.1f}s/round) -> {n_comm:,} communities; "
        f"shuffle-read rows {d_lp:,} (≈{d_lp / max(iters * 2 * m, 1):.1f}× of "
        f"iters·2|E| — O(|E|)/round)"
    )

    t0 = time.time()
    top = adamic_adar(edges, k=100, max_degree=cap).collect()
    t_aa = time.time() - t0
    base2 = rest_totals(4049)
    d_aa = base2["shuffle_read_rows"] - base1["shuffle_read_rows"]
    print(
        f"adamic_adar (cap {cap}): top-{len(top)} in {t_aa:.1f}s; "
        f"best score {top[0]['score']:.3f}; shuffle-read rows {d_aa:,} "
        f"(admitted wedges {int(stats['wedges_capped']):,})"
    )

    # sanity at scale: capped Spark result == driver reference on a
    # subsample small enough to brute-force (50k edges)
    sub_pd = und.limit(50_000).toPandas()
    sub_edges = list(zip(sub_pd["a"].tolist(), sub_pd["b"].tolist()))
    import math
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for x, y in sub_edges:
        adj[x].add(y)
        adj[y].add(x)
    degs = {v: len(ns) for v, ns in adj.items()}
    ref = defaultdict(float)
    for z, ns in adj.items():
        if degs[z] > 50:
            continue
        for x, y in combinations(sorted(ns), 2):
            if y not in adj[x]:
                ref[(x, y)] += 1.0 / math.log(degs[z])
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    sub_df = spark.createDataFrame(sub_pd)
    got = adamic_adar(sub_df, k=50, max_degree=50).collect()
    assert [(r_["x"], r_["y"]) for r_ in got] == [p for p, _ in want], "mismatch"
    print(f"subsample equality: top-50 identical to driver reference "
          f"({len(sub_edges):,} edges, cap 50)")
    spark.stop()


if __name__ == "__main__":
    main()
