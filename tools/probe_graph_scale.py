"""Round-12 probe (VERDICT r11 item 6): the two graph gates at ≥1M edges
on a synthetic power-law graph — B60 measured the degree-oriented census
at 50k edges; this pins the O(√m)-orientation and O(|E|)-per-iteration
PageRank claims at 20× that, with wall AND shuffle numbers.

Graph: endpoints drawn from a shifted-Zipf rank distribution
p(r) ∝ 1/(r+q) over N ranks (q=10 keeps the head heavy but finite —
max degree ~1-2% of draws), then deduped.  This is the WARC-link-graph
regime the orientation flag exists for: a few 10^4-degree hubs over a
long tail.

Measured per formulation, same session:
  - triangle census id-ordered vs degree-oriented: equality + wall +
    shuffle records of the two-hop stage (the Σd² fan-out shows up as
    shuffle ROWS through the join, read via the Spark UI REST API);
  - directed PageRank (10 iterations, dangling mass in-plan): wall,
    per-iteration mean, and total shuffle rows ≈ iters × O(|E|).

Usage: python tools/probe_graph_scale.py [n_draws] [n_ranks]
(defaults 1_300_000 draws over 300_000 ranks → ~1.05M distinct edges)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession


def rest_totals(ui_port: int) -> dict:
    """Sum shuffle read/write across all completed stages via the UI REST
    API — the only local-mode surface that exposes per-stage shuffle
    volume to Python."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base, timeout=10))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=30)
    )
    return {
        "shuffle_read_rows": sum(s.get("shuffleReadRecords", 0) for s in stages),
        "shuffle_write_rows": sum(s.get("shuffleWriteRecords", 0) for s in stages),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in stages) / 2**20, 1
        ),
        "n_stages": len(stages),
    }


def main() -> None:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 1_300_000
    n_ranks = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-graph-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")  # REST API = shuffle numbers
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.operators.graph import pagerank, triangle_stats

    # shifted-Zipf endpoints: r = (q+1)·((N+q+1)/(q+1))^u − (q+1)
    rng = np.random.default_rng(12)
    q = 10.0
    u = rng.uniform(0.0, 1.0, size=(n_draws, 2))
    r = ((q + 1.0) * ((n_ranks + q + 1.0) / (q + 1.0)) ** u - (q + 1.0)).astype(
        np.int64
    )
    r = np.clip(r, 0, n_ranks - 1)
    # scatter hub IDs uniformly (fixed multiplicative bijection): rank 0
    # (the top hub) must NOT get the minimum ID — under a<b normalization
    # a minimum-ID hub has in-degree 0 and the id-ordered two-hop pays
    # nothing through it; real link graphs don't hand out IDs by degree
    r = (r * 1_000_003) % n_ranks
    mask = r[:, 0] != r[:, 1]
    a, b = r[mask, 0], r[mask, 1]
    import pandas as pd

    # directed as drawn (for PageRank); census normalizes internally
    edges = spark.createDataFrame(
        pd.DataFrame({"a": a, "b": b})
    ).dropDuplicates(["a", "b"])
    edges = edges.repartition(2 * int(cpus)).cache()
    m = edges.count()
    deg = (
        edges.selectExpr("a as v")
        .union(edges.selectExpr("b as v"))
        .groupBy("v")
        .count()
        .orderBy("count", ascending=False)
        .limit(5)
        .collect()
    )
    top_deg = [int(r_["count"]) for r_ in deg]
    print(f"graph: {m:,} distinct directed edges over ≤{n_ranks:,} nodes")
    print(f"  top-5 degrees: {top_deg} (√m = {int(m ** 0.5):,})")

    base0 = rest_totals(4049)

    t0 = time.time()
    oriented = triangle_stats(edges, orient_by_degree=True).collect()[0].asDict()
    t_or = time.time() - t0
    base1 = rest_totals(4049)

    t0 = time.time()
    plain = triangle_stats(edges).collect()[0].asDict()
    t_id = time.time() - t0
    base2 = rest_totals(4049)

    assert plain == oriented, (plain, oriented)
    d_or = base1["shuffle_read_rows"] - base0["shuffle_read_rows"]
    d_id = base2["shuffle_read_rows"] - base1["shuffle_read_rows"]
    print(f"census identical: {plain}")
    print(
        f"  degree-oriented {t_or:.1f}s ({d_or:,} shuffle-read rows) vs "
        f"id-ordered {t_id:.1f}s ({d_id:,} rows) — {t_id / max(t_or, 1e-9):.1f}×"
    )

    iters = 10
    t0 = time.time()
    pr = pagerank(edges, iters=iters, undirected=False)
    n_nodes = pr.count()
    mass = pr.agg({"rank": "sum"}).collect()[0][0]
    t_pr = time.time() - t0
    base3 = rest_totals(4049)
    d_pr = base3["shuffle_read_rows"] - base2["shuffle_read_rows"]
    print(
        f"directed pagerank: {iters} iters over {n_nodes:,} nodes in "
        f"{t_pr:.1f}s ({t_pr / iters:.1f}s/iter); rank mass "
        f"{mass:,.1f} (≈N); shuffle-read rows {d_pr:,} "
        f"(≈{d_pr / max(iters * m, 1):.1f}×·iters·|E| — O(|E|)/iter)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
