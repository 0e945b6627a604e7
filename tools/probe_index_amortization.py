"""Round-12 probe: what the persisted ANN indexes actually buy — serve
repeated query batches from the parquet artifact vs re-running the
one-shot operator per batch, at 20× corpus (the B66 jittered-replica
construction, ~40k vectors).

The one-shot path pays TRAIN (driver k-means / codebooks) + ENCODE (a
full corpus scan through the Arrow kernel) on every call; the persisted
path pays them once at build time and each subsequent batch only probes
+ ADC/scores + reranks.  At 100 TB the encode scan is the dominant
cost, so the local ratio here UNDERSTATES the cluster win — the probe
pins the shape (per-batch serving wall ≈ one-shot wall minus
train+encode) and asserts batch-1 output equality so the amortization
is not buying a different answer.

Usage: python tools/probe_index_amortization.py [sf_dir] [replicas] [batches]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    batches = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-index-amortization")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.similarity import (
        build_ivf_index,
        build_pq_index,
        ivf_query_index,
        ivf_top_k,
        pq_query_index,
        pq_top_k,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("__r"))
    big = (
        emb.crossJoin(rep)
        .select(
            (F.col("vec_id") * replicas + F.col("__r")).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + (
                    (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("__r"), i),
                            F.lit(10_000),
                        )
                        / 10_000.0
                        - 0.5
                    )
                    * 0.1
                ),
            ).alias("embedding"),
        )
        .repartition(int(cpus))
        .persist()
    )
    n = big.count()
    k = 3
    # disjoint query batches (batch b = vec_id % (40*batches) == 40*b)
    qbatches = [
        big.where(F.col("vec_id") % (40 * batches) == 40 * b).persist()
        for b in range(batches)
    ]
    sizes = [q.count() for q in qbatches]
    print(f"corpus: {n} vectors ({replicas}x); query batches: {sizes}, k={k}")

    import tempfile

    store = tempfile.mkdtemp(prefix="ann_amort_")

    for name, build, serve, oneshot in (
        (
            "pq ",
            lambda: build_pq_index(big, n_corpus=n),
            lambda model, codes, q: pq_query_index(
                q, model, codes, big, k, n_probe=8
            ),
            lambda q: pq_top_k(q, big, k, n_probe=8, n_corpus=n),
        ),
        (
            "ivf",
            lambda: build_ivf_index(big, n_corpus=n),
            lambda cent, idx, q: ivf_query_index(q, cent, idx, k, n_probe=8),
            lambda q: ivf_top_k(q, big, k, n_probe=8, n_corpus=n),
        ),
    ):
        t0 = time.time()
        half_a, half_b = build()
        pa, pb = f"{store}/{name.strip()}_a", f"{store}/{name.strip()}_b"
        half_a.write.mode("overwrite").parquet(pa)
        half_b.write.mode("overwrite").parquet(pb)
        t_build = time.time() - t0
        ra, rb = spark.read.parquet(pa), spark.read.parquet(pb)

        served_walls, oneshot_walls = [], []
        first_equal = None
        for b, q in enumerate(qbatches):
            t0 = time.time()
            srows = serve(ra, rb, q).collect()
            served_walls.append(time.time() - t0)
            t0 = time.time()
            orows = oneshot(q).collect()
            oneshot_walls.append(time.time() - t0)
            if b == 0:
                first_equal = sorted(map(tuple, srows)) == sorted(
                    map(tuple, orows)
                )
        assert first_equal, f"{name}: persisted serving diverged from one-shot"
        s_avg = sum(served_walls) / len(served_walls)
        o_avg = sum(oneshot_walls) / len(oneshot_walls)
        print(
            f"{name}: build+persist {t_build:.1f}s ONCE; per-batch serve "
            f"{[round(x, 1) for x in served_walls]} (avg {s_avg:.1f}s) vs "
            f"one-shot {[round(x, 1) for x in oneshot_walls]} (avg "
            f"{o_avg:.1f}s) — {o_avg / max(s_avg, 1e-9):.2f}x per batch, "
            f"batch-1 outputs identical"
        )
    spark.stop()


if __name__ == "__main__":
    main()
