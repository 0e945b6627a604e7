"""Same-session repeated timing of named bench queries at a given repo root.

Generalizes tools/ab_pairwise.py (the methodology that settled the r2
pairwise_affinities delta as host variance).  Usage:

    python tools/ab_query.py <repo_root> <n_timed_runs> <query> [query ...]

Starts one Spark session, warms up each query once, then interleaves timed
runs round-robin (q1, q2, ..., q1, q2, ...) so host drift affects all
queries equally.  Prints one JSON line with per-query times and medians.
Run alternately against two worktrees to cancel drift when comparing
revisions.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

root = os.path.abspath(sys.argv[1])
runs = int(sys.argv[2])
names = sys.argv[3:]
sys.path.insert(0, root)

from pyspark.sql import SparkSession  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab-query")
    .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

qs = entrymod.queries()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

times: dict[str, list[float]] = {n: [] for n in names}
rows: dict[str, int] = {}
for i in range(runs + 1):  # round 0 is warmup
    for n in names:
        t0 = time.time()
        rows[n] = qs[n](spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        if i > 0:
            times[n].append(dt)
        spark.catalog.clearCache()
        gc.collect()

print(json.dumps({
    "root": root,
    "sf_dir": sf_dir,
    "rows": rows,
    "times": times,
    "median": {n: sorted(t)[len(t) // 2] for n, t in times.items()},
}))
spark.stop()
