"""Probe: the walk->embedding pipeline at the B68 graph scale.

Runs random_walks (2 seeds) + walk_embeddings over the same shifted-Zipf
power-law graph as B68/B74 (~1M distinct edges, ~240k nodes, hub degree
in the tens of thousands) and checks the DeepWalk contract holds at
scale: graph-neighbor pairs are more cosine-similar than random
non-adjacent pairs, by a sampled mean margin.  Also reports the two
walls separately (walk generation = 6 equi-joins per seed; skip-gram fit
= MLlib Word2Vec over ~2N sequences with a vocab x dim model of
~n_nodes x 8 doubles).

Usage: python tools/probe_walk_embeddings_scale.py [n_draws] [n_ranks]
(defaults 1_300_000 / 300_000 -> ~1.05M distinct edges, the B68 shape)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 1_300_000
    n_ranks = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-walk-emb")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.operators.graph import random_walks, walk_embeddings

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
    edges = (
        spark.createDataFrame(pd.DataFrame({"a": a, "b": b}))
        .dropDuplicates(["a", "b"])
        .repartition(2 * int(cpus))
        .cache()
    )
    m = edges.count()

    t0 = time.time()
    walks = random_walks(edges, walk_len=6, seed=1).unionByName(
        random_walks(edges, walk_len=6, seed=2)
    )
    n_walk_rows = walks.count()
    t_walks = time.time() - t0

    walks = walks.cache()
    walks.count()

    # A/B the Word2Vec scale knob: num_partitions=1 (single-stream SGD,
    # the deterministic-ish gate default) vs 8 (sharded SGD with
    # per-iteration parameter averaging — the wall-clock path for a
    # web-scale walk corpus).  The margin invariant must hold on BOTH.
    t0 = time.time()
    emb1 = walk_embeddings(walks, dim=8, epochs=2, num_partitions=1)
    emb1 = emb1.cache()
    n_emb1 = emb1.count()
    t_fit1 = time.time() - t0

    t0 = time.time()
    emb = walk_embeddings(walks, dim=8, epochs=2, num_partitions=8)
    emb = emb.cache()
    n_emb = emb.count()
    t_fit = time.time() - t0
    assert n_emb1 == n_emb, (n_emb1, n_emb)

    # sampled margin: 5k graph-neighbor pairs vs 5k pseudo-random
    # non-adjacent pairs among embedded nodes
    er = edges.limit(5000).collect()
    epairs = [(int(x["a"]), int(x["b"])) for x in er]
    ids = [int(x["id"]) for x in emb.select("id").limit(20000).collect()]
    prng = np.random.default_rng(7)
    eset = set(map(tuple, map(sorted, epairs)))
    rpairs = []
    while len(rpairs) < 5000:
        i, j = prng.integers(0, len(ids), 2)
        pr = tuple(sorted((ids[i], ids[j])))
        if pr[0] != pr[1] and pr not in eset:
            rpairs.append(pr)
    need = sorted({x for p in epairs + rpairs for x in p})
    need_df = spark.createDataFrame(
        pd.DataFrame({"id": need}), "id bigint"
    )
    got = {
        int(x["id"]): np.array(x["emb"])
        for x in emb.join(need_df, "id").collect()
    }

    def mean_cos(pairs):
        vals = []
        for x, y in pairs:
            if x in got and y in got:
                vx, vy = got[x], got[y]
                vals.append(
                    float(
                        vx @ vy
                        / (np.linalg.norm(vx) * np.linalg.norm(vy) + 1e-12)
                    )
                )
        return float(np.mean(vals)), len(vals)

    me, ne = mean_cos(epairs)
    mr, nr = mean_cos(rpairs)

    got1 = {
        int(x["id"]): np.array(x["emb"])
        for x in emb1.join(need_df, "id").collect()
    }
    got, got1 = got1, got  # reuse mean_cos over the p=1 embeddings
    me1, _ = mean_cos(epairs)
    mr1, _ = mean_cos(rpairs)
    got = got1

    print(
        f"walk-embeddings @ B68 scale: {m:,} edges, {n_emb:,} nodes "
        f"embedded; walks {n_walk_rows:,} rows in {t_walks:.1f}s\n"
        f"  num_partitions=1: fit {t_fit1:.1f}s, neighbor cos {me1:.3f} "
        f"vs non-adjacent {mr1:.3f} — margin {me1 - mr1:+.3f}\n"
        f"  num_partitions=8: fit {t_fit:.1f}s, neighbor cos {me:.3f} "
        f"(n={ne}) vs non-adjacent {mr:.3f} (n={nr}) — margin "
        f"{me - mr:+.3f}\n"
        f"  speedup {t_fit1 / max(t_fit, 1e-9):.2f}x; both margins must "
        f"clear the 0.2 gate threshold"
    )


if __name__ == "__main__":
    main()
