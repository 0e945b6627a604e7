"""Probe: the d=3 skyline staircase kernel at scale (r12 verdict item 7).

B76 flagged the d>=3 path: the test-against-kept sweep is O(n·s) — fine
for the O((ln n)^2) expected frontier of random data, HOURS when the
frontier itself is huge (anti-correlated criteria).  The shipped d=3
kernel is now the Kung-Luccio-Preparata staircase sweep (O(n log s)
regardless of frontier size); this probe measures both regimes:

  1. 10M deterministic-uniform 3D points — tiny frontier; phase-1 local
     skylines must collapse the input before the single-task merge.
  2. 1M points on a noisy x+y+z ~ const simplex shell — the frontier IS
     ~the whole input; the old BNL sweep is quadratic here, the
     staircase sweep must complete in seconds.

Plus a 200k-row sampled dominance audit of run 1 (every sampled row is
dominated by or equal to some reported frontier row; every frontier row
is non-dominated) — correctness at scale without an O(n^2) oracle.

Usage: python tools/probe_skyline_3d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tsne_flink_spark.operators.skyline import pareto_frontier

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- regime 1: 10M uniform (tiny frontier) -------------------------
    n = 10_000_000
    base = spark.range(n).select(
        "id",
        # deterministic LCG-ish uniforms, no RNG state on executors
        (F.pmod(F.col("id") * 1103515245 + 12345, F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("x"),
        (F.pmod(F.col("id") * 69069 + 1, F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("y"),
        (F.pmod(F.col("id") * 214013 + 2531011, F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("z"),
    )
    base = base.repartition(32).cache()
    base.count()

    t0 = time.time()
    local = pareto_frontier(base, ["x", "y", "z"], merge=False)
    n_local = local.count()
    t_local = time.time() - t0

    t0 = time.time()
    sky = pareto_frontier(base, ["x", "y", "z"]).collect()
    t_full = time.time() - t0
    print(
        f"uniform 10M x 3crit: phase-1 survivors {n_local} "
        f"({n / max(n_local, 1):.0f}x cut, {t_local:.1f}s), "
        f"global frontier {len(sky)} rows in {t_full:.1f}s end-to-end"
    )

    # sampled dominance audit
    fr = np.array([(r["x"], r["y"], r["z"]) for r in sky])
    sample = np.array(
        [
            (r["x"], r["y"], r["z"])
            for r in base.sample(0.02, seed=7).collect()
        ]
    )
    covered = 0
    for p in sample:
        ge = (fr >= p).all(axis=1)
        if ge.any():
            covered += 1
    assert covered == len(sample), f"{len(sample) - covered} uncovered!"
    for i, p in enumerate(fr):
        ge = (fr >= p).all(axis=1)
        strict = (fr[ge] > p).any(axis=1)
        assert not strict.any(), f"frontier row {i} dominated!"
    print(f"audit clean: {len(sample)} sampled rows covered, "
          f"all {len(fr)} frontier rows non-dominated")

    # --- regime 2: 1M anti-correlated simplex shell --------------------
    m = 1_000_000
    shell = spark.range(m).select(
        "id",
        (F.pmod(F.col("id") * 1103515245 + 12345, F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("x"),
        (F.pmod(F.col("id") * 69069 + 1, F.lit(1 << 31))
         / F.lit(float(1 << 31))).alias("y"),
    ).select(
        "id", "x", "y",
        # z = 2 - x - y + tiny id-deterministic jitter: a noisy plane
        # whose frontier is ~the entire input
        (F.lit(2.0) - F.col("x") - F.col("y")
         + F.pmod(F.col("id") * 214013 + 2531011, F.lit(1 << 31))
         / F.lit(float(1 << 31)) * 1e-4).alias("z"),
    )
    shell = shell.repartition(32).cache()
    shell.count()
    t0 = time.time()
    n_sky = pareto_frontier(shell, ["x", "y", "z"]).count()
    t_shell = time.time() - t0
    print(
        f"anti-correlated 1M x 3crit: TRUE frontier {n_sky} rows "
        f"({n_sky / m:.1%} of input) in {t_shell:.1f}s"
    )


if __name__ == "__main__":
    main()
