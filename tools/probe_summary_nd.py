"""Round-7 probe (extends tools/probe_summary.py to d != 2): per-iteration
broadcast volume and wall time of the d-dimensional Barnes-Hut repulsion,
full NDTree ('distributed') vs d-dim far-field summary ('summary').  Usage:

    python tools/probe_summary_nd.py [d] [N ...]   # default d=3, N=1000000

Prints one JSON line per N with:
- tree_bytes: pickled size of the full NDTree (what 'distributed'
  broadcasts EVERY iteration — O(N));
- pyramid_bytes: pickled size of the d-dim cell-aggregate pyramid (what
  'summary' broadcasts — capped at O(2^(d*D)), constant once D hits the
  20/d cap);
- auto_mode: which path tree_build='auto' selects at this (N, d);
- per-iteration wall time of one repulsion evaluation in each mode.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession

from tsne_flink_spark.operators import farfield
from tsne_flink_spark.operators.gradient import (
    _AUTO_BROADCAST_BUDGET,
    _nd_tree_bytes_per_point,
    _repulsive_barnes_hut,
)
from tsne_flink_spark.operators.ndtree import build_ndtree_distributed

THETA = 0.5
CONDITION = "scaled"


def probe(spark, n: int, d: int) -> dict:
    rng = np.random.default_rng(42)
    Y = rng.normal(0, 30.0, (n, d))
    Y = Y - Y.mean(axis=0)
    emb = spark.createDataFrame(
        zip(range(n), (y.tolist() for y in Y)), "id int, y array<double>"
    ).repartition(64).cache()
    emb.count()

    tree = build_ndtree_distributed(emb, d)
    tree_bytes = len(pickle.dumps(tree))

    half = float((Y.max(axis=0) - Y.min(axis=0)).max())
    plan = farfield.plan_summary_nd(n, d, half, THETA, CONDITION)
    pyramid_bytes = None
    if plan is not None:
        grid, cellw = plan.grid, plan.cellw
        idx = np.clip(((Y + half) / cellw).astype(np.int64), 0, grid - 1)
        cells = np.zeros(n, dtype=np.int64)
        for k in range(d):
            cells += idx[:, k] * grid**k
        order = np.argsort(cells)
        uniq, start = np.unique(cells[order], return_index=True)
        cum = np.add.reduceat(np.ones(n, dtype=np.int64), start)
        s = np.add.reduceat(Y[order], start, axis=0)
        levels = farfield.build_pyramid_nd(uniq, cum, s, plan)
        pyramid_bytes = len(pickle.dumps(levels))

    timings = {}
    used_flags = {}
    for mode in ("distributed", "summary"):
        ts = []
        for _ in range(3):
            t0 = time.time()
            df, used = _repulsive_barnes_hut(
                emb, THETA, d, bh_condition=CONDITION, tree_build=mode
            )
            df.count()
            ts.append(round(time.time() - t0, 2))
        timings[mode] = ts
        used_flags[mode] = used

    auto_mode = (
        "summary"
        if n * _nd_tree_bytes_per_point(d) > _AUTO_BROADCAST_BUDGET
        else "distributed"
    )
    emb.unpersist()
    return {
        "n": n,
        "d": d,
        "depth": plan.depth if plan else None,
        "rc": plan.rc if plan else None,
        "block_bits": plan.block_bits if plan else None,
        "tree_bytes": tree_bytes,
        "pyramid_bytes": pyramid_bytes,
        "auto_mode": auto_mode,
        "summary_ran": used_flags.get("summary"),
        "iter_sec": timings,
    }


def main():
    args = [int(a) for a in sys.argv[1:]]
    d = args[0] if args else 3
    ns = args[1:] or [1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-summary-nd")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(probe(spark, n, d)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
