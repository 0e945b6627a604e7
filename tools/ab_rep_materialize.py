"""A/B probe: does pinning the repulsion DataFrame (materialize(rep)) before
the sum_q aggregate beat the current lazy form in the full-tree BH and exact
paths?

Structure of gradient() today: ``sum_q = rep.agg(...)`` is crossJoined as a
broadcast into the grad join, so the physical plan evaluates ``rep`` TWICE
per iteration — once inside the broadcast-exchange subquery (sum_q), once in
the grad join.  The summary path already materializes rep (correctness:
shuffle-order-dependent local trees); the full-tree paths deliberately kept
the lazy form on the theory that re-evaluating a broadcast-tree mapInPandas
is cheap.  This probe measures that theory at two scales:

- sf0.1-flagship scale: N=5k, theta=0.5 (the bench's tsne_embedding regime);
- B11 scale: N=1M, theta=0.5, full-tree distributed build;
- exact path: N=2k, theta=0 (the N^2 join runs twice today).

Usage: python tools/ab_rep_materialize.py [--mode lazy|pin] ...
Run each mode in a FRESH process, interleaved, solo (bench_ops.py interleaved
methodology).  The pin variant is toggled via the env var
TSNE_SPARK_PIN_REP=1 read by operators/gradient.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_emb(spark, n: int, parts: int = 64):
    rng = np.random.default_rng(42)
    Y = rng.normal(0, 30.0, (n, 2))
    Y = Y - Y.mean(axis=0)
    emb = spark.createDataFrame(
        zip(range(n), (y.tolist() for y in Y)), "id int, y array<double>"
    ).repartition(parts).cache()
    emb.count()
    return emb


def ring_p(spark, n: int, k: int = 5):
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))
    offs = spark.createDataFrame([(d,) for d in range(1, k + 1)], "d int")
    edges = base.crossJoin(offs).select(
        "i", ((F.col("i") + F.col("d")) % n).cast("int").alias("j")
    )
    sym = edges.union(edges.select(F.col("j").alias("i"), F.col("i").alias("j")))
    p = sym.withColumn("v", F.lit(1.0 / (2.0 * n * k))).cache()
    p.count()
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--theta", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--tree-build", default=None)
    args = ap.parse_args()

    if args.pin:
        os.environ["TSNE_SPARK_PIN_REP"] = "1"

    from pyspark.sql import SparkSession

    from tsne_flink_spark.operators.gradient import gradient

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-rep-materialize")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = make_emb(spark, args.n)
    p = ring_p(spark, args.n)

    ts = []
    for i in range(args.iters):
        t0 = time.time()
        grad, _ = gradient(
            p, emb, theta=args.theta, bh_condition="scaled",
            tree_build=args.tree_build
            or ("auto" if args.theta > 0 else "distributed"),
        )
        grad.count()
        ts.append(round(time.time() - t0, 2))
    print(
        json.dumps(
            {
                "n": args.n,
                "theta": args.theta,
                "pin": args.pin,
                "iter_sec": ts,
                "median": sorted(ts)[len(ts) // 2],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
