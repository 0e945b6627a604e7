"""Round-10 probe: triangle census under degree orientation vs the
id-ordered default on a hub graph (VERDICT r9 item 7).

The id-ordered two-hop (normalize a < b, join e1(x,y) ⋈ e2(y,z) ⋈
e3(x,z)) is itself an orientation — by vertex ID — so its fan-out
through a vertex v is in(v)·out(v) under that order.  A hub whose ID
sits in the MIDDLE of its neighbors' IDs is the worst case: d/2 in ×
d/2 out = d²/4 joined rows through one key.  Degree orientation
(orient_by_degree=True) points every hub edge TOWARD the hub (its
neighbors all have lower degree), so the hub's oriented out-degree is
0 and the fan-out through it vanishes; every oriented out-degree is
bounded by O(√m).

This probe builds exactly that adversary: one hub with mid-range ID in
HUB_DEG edges (default 50 000), plus a sparse random background so
triangles exist, runs BOTH formulations, checks the censuses are
IDENTICAL, and times them.  It then replays both on the real near-dup
graph (ngram_jaccard_pairs at sf0.01) to confirm the flag changes
nothing on the graphs the census currently serves.

Usage: python tools/probe_triangle_hub.py [hub_degree]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession


def census(df, **kw):
    from tsne_flink_spark.operators.graph import triangle_stats

    t0 = time.time()
    row = triangle_stats(df, **kw).collect()[0].asDict()
    return row, time.time() - t0


def main():
    hub_deg = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-triangle-hub")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Hub with mid-range ID: neighbors 0..d/2-1 and hub+1..hub+d/2, so the
    # id-order splits its edges evenly into in- and out-edges.
    rng = np.random.default_rng(7)
    hub = hub_deg // 2
    lo = np.arange(0, hub_deg // 2)
    hi = np.arange(hub + 1, hub + 1 + hub_deg // 2)
    hub_edges = [(int(min(v, hub)), int(max(v, hub))) for v in np.concatenate([lo, hi])]
    n_ids = hub + 1 + hub_deg // 2
    bg = rng.integers(0, n_ids, size=(3 * hub_deg, 2))
    bg = [(int(min(a, b)), int(max(a, b))) for a, b in bg if a != b]
    edges = spark.createDataFrame(hub_edges + bg, "a bigint, b bigint")

    plain, t_plain = census(edges)
    oriented, t_oriented = census(edges, orient_by_degree=True)
    assert plain == oriented, (plain, oriented)
    print(
        f"hub graph (hub_deg={hub_deg}, edges~{len(hub_edges) + len(bg)}): "
        f"census identical {plain}"
    )
    print(
        f"  id-ordered {t_plain:.1f}s (fan-out through hub ~{(hub_deg // 2) ** 2:,} rows) "
        f"vs degree-oriented {t_oriented:.1f}s"
    )

    # Same census on the graph the operator actually serves today.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as entrymod

    pairs = entrymod.queries()["ngram_jaccard_pairs"](spark, sf_dir)
    dup_edges = pairs.select("a", "b")
    p2, tp2 = census(dup_edges)
    o2, to2 = census(dup_edges, orient_by_degree=True)
    assert p2 == o2, (p2, o2)
    print(f"dup graph ({sf_dir}): census identical {p2}")
    print(f"  id-ordered {tp2:.1f}s vs degree-oriented {to2:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
