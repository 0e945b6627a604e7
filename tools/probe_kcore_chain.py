"""Probe: batched k-core peel on an adversarial chain graph.

A path graph is the peeling worst case: with k=2 every synchronous level
removes only the two current endpoints, so an N-node chain needs ~N/2
levels — and the unbatched peel pays one driver round-trip (job
submission + scheduling latency, the expensive part on a 1000-executor
cluster) PER LEVEL.  The batched peel (peel_batch=B) composes B levels
lazily between materializations, cutting driver rounds to ceil(depth/B)+1
while returning the identical fixpoint (peeling is confluent).

Measures, for a chain + one 4-clique (so the 2-core is nonempty):
  - identical (id, deg) output across peel_batch = 1 / 3 / 6
  - driver rounds per variant (from k_core's _stats hook)
  - wall-clock per variant

Usage: python tools/probe_kcore_chain.py [chain_len]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120

    from pyspark.sql import SparkSession

    from tsne_flink_spark.operators.graph import k_core

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # chain 1-2-...-n (peels away entirely) + a 4-clique on n+1..n+4
    # (survives as the 2-core, every node at in-core degree 3)
    edges = [(i, i + 1) for i in range(1, n)]
    cl = [n + 1, n + 2, n + 3, n + 4]
    edges += [(a, b) for i, a in enumerate(cl) for b in cl[i + 1 :]]
    df = spark.createDataFrame(edges, "a bigint, b bigint")

    results = {}
    for batch in (1, 3, 6):
        stats: dict = {}
        t0 = time.time()
        out = sorted(
            (r["id"], r["deg"])
            for r in k_core(
                df, k=2, max_rounds=1000, peel_batch=batch, _stats=stats
            ).collect()
        )
        wall = time.time() - t0
        results[batch] = out
        print(
            f"peel_batch={batch}: driver_rounds={stats['driver_rounds']} "
            f"wall={wall:.1f}s core_nodes={len(out)}"
        )

    assert results[1] == results[3] == results[6], "outputs diverge!"
    assert results[1] == [(c, 3) for c in cl], "wrong 2-core!"
    depth = (n + 1) // 2
    print(f"chain_len={n} peel_depth~{depth}: outputs identical across batches")


if __name__ == "__main__":
    main()
