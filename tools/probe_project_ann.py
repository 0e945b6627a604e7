"""Round-7 probe: dimensionality reduction as ANN preprocessing.

The standard corpus-scale retrieval shape: generate candidates in a
REDUCED space (cheap GEMMs, small shuffles), then re-rank the candidate
set with exact cosines in the RAW space.  This probe measures, at
N=50k d=64 clustered vectors (queries = a 500-vector sample):

- recall@10 vs exact raw-space cosine for: IVF on raw 64-d, IVF on
  PCA-16 candidates + raw re-rank, IVF on JL-16 candidates + raw
  re-rank;
- wall time of each path (candidate generation dominates; the re-rank
  is one join + GEMM over ~5x-overfetched candidates).

Usage: python tools/probe_project_ann.py [n_base] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

K = 10
OVERFETCH = 5  # candidates per query fed to the exact re-rank


def exact_top_k_numpy(Q, X, k):
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Qn @ Xn.T
    return np.argsort(-sims, axis=1)[:, :k]


def recall(cand_ids: dict, truth: np.ndarray, qids: np.ndarray) -> float:
    hits = total = 0
    for row, qid in enumerate(qids):
        got = set(cand_ids.get(int(qid), ()))
        want = set(truth[row].tolist())
        hits += len(got & want)
        total += len(want)
    return hits / total


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    d = 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-project-ann")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.project import (
        pca_fit,
        pca_transform,
        random_projection,
    )
    from tsne_flink_spark.pipeline.similarity import ivf_top_k
    from tsne_flink_spark.functions.metrics import metric_expr

    rng = np.random.default_rng(13)
    centers = rng.normal(0, 1, (64, d)) * 4
    X = (
        centers[rng.integers(0, len(centers), n_base)]
        + rng.normal(0, 1, (n_base, d))
    )
    base = spark.createDataFrame(
        zip(range(n_base), (x.tolist() for x in X)),
        "vec_id long, embedding array<double>",
    ).repartition(64).cache()
    base.count()
    q_idx = rng.choice(n_base, n_q, replace=False)
    Q = X[q_idx]
    queries = spark.createDataFrame(
        zip((int(i) for i in q_idx), (x.tolist() for x in Q)),
        "vec_id long, embedding array<double>",
    ).cache()
    queries.count()
    truth = exact_top_k_numpy(Q, X, K)

    def collect_topk(df):
        out: dict[int, list[int]] = {}
        for r in df.collect():
            out.setdefault(r["q"], []).append(r["c"])
        return out

    results = {}

    # raw-space IVF baseline
    t0 = time.time()
    raw = ivf_top_k(queries, base, K, n_corpus=n_base)
    got = collect_topk(raw)
    results["ivf_raw64"] = {
        "recall": round(recall(got, truth, q_idx), 3),
        "wall_sec": round(time.time() - t0, 1),
    }

    # reduced-space candidates + exact raw re-rank
    def reduced_path(name, reduce_fn, overfetch=OVERFETCH):
        t0 = time.time()
        rbase = reduce_fn(base).cache()
        rqueries = reduce_fn(queries)
        cands = ivf_top_k(
            rqueries, rbase, K * overfetch, n_corpus=n_base
        ).select("q", "c")
        qv = queries.select(
            F.col("vec_id").alias("q"), F.col("embedding").alias("__q")
        )
        bv = base.select(
            F.col("vec_id").alias("c"), F.col("embedding").alias("__b")
        )
        sim = F.lit(1.0) - metric_expr("cosine", F.col("__q"), F.col("__b"))
        from pyspark.sql import Window

        w = Window.partitionBy("q").orderBy(
            F.col("sim").desc(), F.col("c").asc()
        )
        rer = (
            cands.join(qv, "q")
            .join(bv, "c")
            .withColumn("sim", sim)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= K)
            .select("q", "c")
        )
        got = collect_topk(rer)
        rbase.unpersist()
        results[name] = {
            "recall": round(recall(got, truth, q_idx), 3),
            "wall_sec": round(time.time() - t0, 1),
        }

    m16 = pca_fit(base, k=16)
    m32 = pca_fit(base, k=32)
    reduced_path("ivf_pca16_of5", lambda df: pca_transform(df, m16), 5)
    reduced_path("ivf_pca16_of20", lambda df: pca_transform(df, m16), 20)
    reduced_path("ivf_pca32_of20", lambda df: pca_transform(df, m32), 20)
    reduced_path(
        "ivf_jl32_of20", lambda df: random_projection(df, k=32, seed=3), 20
    )

    print(json.dumps({"n_base": n_base, "n_queries": n_q, "d": d,
                      "k": K, "overfetch": OVERFETCH, **results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
