"""Round-12 probe (VERDICT r11 item 7): close or pin the PQ↔IVF recall
gap on near-iid vectors (B64: pq p8 0.5513 vs ivf p8 0.5625).

The corpus payload is FIXED at the 20 B/vector binary-code shape — the
two levers that don't touch it are the rerank ``shortlist`` (overfetch:
how many ADC-ranked candidates reach the exact-cosine rerank; since the
rerank is exact, a large enough shortlist makes PQ's output converge to
IVF's output at the same probed candidate set) and ``n_lists`` (coarse
partition granularity, shared with IVF — sweeping it moves BOTH, so
IVF is re-measured at each value as the parity target).

Usage: python tools/probe_pq_sweep.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-pq-sweep")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.similarity import (
        brute_force_top_k,
        ivf_top_k,
        pq_top_k,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    dim = len(emb.select("embedding").head()[0])
    default_lists = max(4, min(4096, int(np.sqrt(n))))
    print(f"{sf_dir}: n={n} dim={dim} k={k}; default n_lists={default_lists}")

    exact = {(r["q"], r["c"]) for r in brute_force_top_k(emb, emb, k).collect()}

    def recall(df) -> tuple[float, float]:
        t0 = time.time()
        approx = {(r["q"], r["c"]) for r in df.collect()}
        return len(exact & approx) / max(len(exact), 1), time.time() - t0

    # 1) shortlist (overfetch) sweep at default n_lists, p8, fixed payload
    for s in (32, 64, 128, 256):
        r, dt = recall(
            pq_top_k(emb, emb, k, n_probe=8, shortlist=s, n_corpus=n)
        )
        print(f"pq  p8 s{s:<3} lists{default_lists}: recall {r:.4f}, {dt:.1f}s")
    r, dt = recall(ivf_top_k(emb, emb, k, n_probe=8, n_corpus=n))
    print(f"ivf p8      lists{default_lists}: recall {r:.4f}, {dt:.1f}s")

    # 2) n_lists sweep at p8 (probe fraction doubles as lists halve) —
    #    IVF re-measured at each granularity as the parity target
    for nl in (default_lists // 2, default_lists * 2):
        r_pq, dt_pq = recall(
            pq_top_k(
                emb, emb, k, n_probe=8, shortlist=64, n_lists=nl, n_corpus=n
            )
        )
        r_ivf, dt_ivf = recall(
            ivf_top_k(emb, emb, k, n_probe=8, n_lists=nl, n_corpus=n)
        )
        print(
            f"lists {nl:>4} p8: pq s64 {r_pq:.4f} ({dt_pq:.1f}s) vs "
            f"ivf {r_ivf:.4f} ({dt_ivf:.1f}s)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
