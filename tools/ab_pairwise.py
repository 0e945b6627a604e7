"""Same-session A/B of the pairwise_affinities bench query between two repo
revisions (VERDICT r2 'What's wrong #2').  Usage:

    python tools/ab_pairwise.py <repo_root> <n_timed_runs>

Starts one Spark session, warms up, then times n runs of the query exactly as
bench.py does (count + clearCache + gc between runs).  Prints one JSON line.
Run alternately against the r1 worktree and HEAD to cancel host drift.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

root = os.path.abspath(sys.argv[1])
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, root)

from pyspark.sql import SparkSession  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab-pairwise")
    .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod  # noqa: E402

fn = entrymod.queries()["pairwise_affinities"]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

times = []
for i in range(runs + 1):  # first run is warmup
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    dt = round(time.time() - t0, 3)
    if i > 0:
        times.append(dt)
    spark.catalog.clearCache()
    gc.collect()

print(json.dumps({"root": root, "rows": n, "times": times,
                  "median": sorted(times)[len(times) // 2]}))
spark.stop()
