"""B10 probe: project_knn recall vs exact at N=100k, d=16, k=10.

    python tools/probe_project_recall.py [curve ...]    # default: morton hilbert

For each curve, runs project_knn on the same seeded clustered dataset and
reports recall over 300 sampled query points (exact kNN computed in numpy
on the driver — probe-only; the operator itself never collects) plus wall
time.  One JSON line per curve.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from tsne_flink_spark.operators.knn import project_knn

N, D, K = 100_000, 16, 10
N_QUERIES = 300


def main():
    curves = sys.argv[1:] or ["morton", "hilbert"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-project-recall")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(77)
    centers = rng.normal(0, 1, (64, D))
    X = centers[rng.integers(0, 64, N)] + rng.normal(0, 0.25, (N, D))
    df = spark.createDataFrame(
        zip(range(N), (row.tolist() for row in X)),
        "id int, features array<double>",
    ).repartition(64).cache()
    df.count()

    qidx = rng.choice(N, N_QUERIES, replace=False)
    exact: dict[int, set] = {}
    for qi in qidx:
        d2 = ((X - X[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        exact[int(qi)] = set(np.argpartition(d2, K)[:K].tolist())

    for curve in curves:
        t0 = time.time()
        out = project_knn(df, K, iterations=3, seed=1, curve=curve)
        got: dict[int, set] = {}
        for r in out.where(out["i"].isin([int(q) for q in qidx])).collect():
            got.setdefault(r["i"], set()).add(r["j"])
        wall = round(time.time() - t0, 1)
        hits = sum(len(got.get(q, set()) & exact[q]) for q in exact)
        recall = round(hits / (len(exact) * K), 3)
        print(json.dumps({"curve": curve, "recall": recall, "sec": wall}),
              flush=True)
        spark.catalog.clearCache()
        df.cache().count()
    spark.stop()


if __name__ == "__main__":
    main()
