"""Probe: persisted-IVF staleness after an append (r12 verdict item 8).

append_to_ivf_index assigns new vectors to the FROZEN coarse quantizer
(the FAISS add-with-frozen-quantizer pattern) — exact per-row, but the
quantizer itself goes stale as the data distribution shifts.  This
measures the real cost: recall@10 of (a) the appended stale-quantizer
index vs (b) a fresh rebuild over the grown corpus, both against exact
brute-force ground truth, after a 20% append drawn from a SHIFTED
cluster mixture (the adversarial case — i.i.d. appends barely move the
quantizer).  Also times append vs rebuild: the append path never
re-encodes the old corpus.

Usage: python tools/probe_ivf_append.py [n_base]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _recall(got_rows, truth, k):
    by_q: dict = {}
    for r in got_rows:
        by_q.setdefault(r["q"], []).append(r["c"])
    hits = tot = 0
    for q, want in truth.items():
        have = set(by_q.get(q, []))
        hits += len(have & set(want[:k]))
        tot += k
    return hits / max(tot, 1)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_new = n_base // 5  # 20% append
    n_q, k, dim = 300, 10, 32

    from pyspark.sql import SparkSession

    from tsne_flink_spark.pipeline.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_query_index,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(31)
    # base corpus: 20 clusters around the origin
    cb = rng.normal(0, 1, (20, dim))
    base = cb[rng.integers(0, 20, n_base)] + rng.normal(0, 0.3, (n_base, dim))
    # appended batch: 5 NEW clusters shifted away — the stale-quantizer
    # adversary (i.i.d. appends would not move the quantizer)
    cn = rng.normal(2.5, 1, (5, dim))
    new = cn[rng.integers(0, 5, n_new)] + rng.normal(0, 0.3, (n_new, dim))
    # queries from the appended distribution (where staleness hurts most)
    qv = cn[rng.integers(0, 5, n_q)] + rng.normal(0, 0.3, (n_q, dim))

    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id bigint, embedding array<double>",
    ).repartition(32).cache()
    newdf = spark.createDataFrame(
        [(n_base + i, v.tolist()) for i, v in enumerate(new)],
        "vec_id bigint, embedding array<double>",
    ).repartition(8).cache()
    qdf = spark.createDataFrame(
        [(10_000_000 + i, v.tolist()) for i, v in enumerate(qv)],
        "vec_id bigint, embedding array<double>",
    ).cache()
    emb.count(), newdf.count(), qdf.count()

    # exact ground truth over the union corpus (numpy brute force)
    allv = np.vstack([base, new])
    alln = np.linalg.norm(allv, axis=1)
    truth = {}
    for i, q in enumerate(qv):
        sims = allv @ q / (alln * np.linalg.norm(q) + 1e-12)
        truth[10_000_000 + i] = np.argsort(-sims)[:k].tolist()

    t0 = time.time()
    centroids_df, index_df = build_ivf_index(emb, n_corpus=n_base)
    index_df = index_df.cache()
    index_df.count()
    t_build = time.time() - t0

    t0 = time.time()
    appended = append_to_ivf_index(centroids_df, newdf).cache()
    appended.count()
    t_append = time.time() - t0
    stale = ivf_query_index(
        qdf, centroids_df, index_df.unionByName(appended), k=k, n_probe=4
    ).collect()
    r_stale = _recall(stale, truth, k)

    t0 = time.time()
    full = emb.unionByName(newdf)
    c2, i2 = build_ivf_index(full, n_corpus=n_base + n_new)
    i2 = i2.cache()
    i2.count()
    t_rebuild = time.time() - t0
    fresh = ivf_query_index(qdf, c2, i2, k=k, n_probe=4).collect()
    r_fresh = _recall(fresh, truth, k)

    print(
        f"ivf append drift @ {n_base}+{n_new} (20% shifted append), "
        f"{n_q} queries from the new distribution, recall@{k}: "
        f"stale-quantizer append {r_stale:.3f} "
        f"(append cost {t_append:.1f}s vs initial build {t_build:.1f}s) "
        f"vs fresh rebuild {r_fresh:.3f} ({t_rebuild:.1f}s) — "
        f"drift {r_fresh - r_stale:+.3f}"
    )

    # the OTHER staleness cost: list-occupancy imbalance.  Shifted
    # appends crowd a few stale lists; the serving equi-join's biggest
    # task scales with the hottest probed list, so max/mean occupancy is
    # the rebuild trigger even when recall holds.
    from pyspark.sql import functions as F

    def occupancy(idx, label):
        st = (
            idx.groupBy("list")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.avg("count").alias("mean"),
            )
            .collect()[0]
        )
        print(
            f"list occupancy [{label}]: max {st['mx']} / mean "
            f"{st['mean']:.0f} = skew {st['mx'] / st['mean']:.1f}x"
        )

    occupancy(index_df.unionByName(appended), "stale+append")
    occupancy(i2, "fresh rebuild")


if __name__ == "__main__":
    main()
