"""B11 follow-up probe: per-iteration broadcast volume and wall time of the
Barnes-Hut repulsion, full-tree ('distributed') vs far-field summary
('summary'), at growing N.  Usage:

    python tools/probe_summary.py [N ...]        # default 100000 1000000

Prints one JSON line per N with:
- tree_bytes: pickled size of the full quadtree (what 'distributed'
  broadcasts EVERY iteration — O(N));
- pyramid_bytes: pickled size of the cell-aggregate pyramid (what 'summary'
  broadcasts — capped at O(4^D), constant once D hits its cap);
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
    _repulsive_barnes_hut,
    _repulsive_summary,
)
from tsne_flink_spark.operators.quadtree import build_quadtree_distributed

THETA = 0.5
CONDITION = "scaled"


def probe(spark, n: int) -> dict:
    rng = np.random.default_rng(42)
    Y = rng.normal(0, 30.0, (n, 2))
    Y = Y - Y.mean(axis=0)
    emb = spark.createDataFrame(
        zip(range(n), (y.tolist() for y in Y)), "id int, y array<double>"
    ).repartition(64).cache()
    emb.count()

    tree = build_quadtree_distributed(emb)
    tree_bytes = len(pickle.dumps(tree))

    half = max(
        float(Y[:, 0].max() - Y[:, 0].min()),
        float(Y[:, 1].max() - Y[:, 1].min()),
    )
    plan = farfield.plan_summary(n, half, THETA, CONDITION)
    agg = None
    pyramid_bytes = None
    if plan is not None:
        grid, cellw = plan.grid, plan.cellw
        ix = np.clip(((Y[:, 0] + half) / cellw).astype(np.int64), 0, grid - 1)
        iy = np.clip(((Y[:, 1] + half) / cellw).astype(np.int64), 0, grid - 1)
        cells = ix * grid + iy
        order = np.argsort(cells)
        uniq, start = np.unique(cells[order], return_index=True)
        cum = np.add.reduceat(np.ones(n, dtype=np.int64), start)
        sx = np.add.reduceat(Y[order, 0], start)
        sy = np.add.reduceat(Y[order, 1], start)
        levels = farfield.build_pyramid(uniq, cum, sx, sy, plan)
        pyramid_bytes = len(pickle.dumps(levels))

    timings = {}
    for mode in ("distributed", "summary"):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _repulsive_barnes_hut(
                emb, THETA, 2, bh_condition=CONDITION, tree_build=mode
            )[0].count()
            ts.append(round(time.time() - t0, 2))
        timings[mode] = ts

    emb.unpersist()
    return {
        "n": n,
        "depth": plan.depth if plan else None,
        "rc": plan.rc if plan else None,
        "tree_bytes": tree_bytes,
        "pyramid_bytes": pyramid_bytes,
        "iter_sec": timings,
    }


def main():
    ns = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-summary")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in ns:
        print(json.dumps(probe(spark, n)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
