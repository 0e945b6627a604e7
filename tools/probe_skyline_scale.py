"""Round-12 probe: the Pareto-frontier operator at 10M rows — does the
phase-1 local-skyline map actually collapse the input so the single-task
merge sees survivors, not the corpus?

Two regimes:
  1. independent uniform criteria (the common case): expected global
     skyline is O(ln n) — phase 1 should hand the merge a few hundred
     rows out of 10M;
  2. correlated "ridge" data (y = -x + bounded noise): the skyline is
     genuinely large (~the ridge width), the documented degradation —
     phase 2 still only sees the union of LOCAL skylines.

Correctness at this scale (NOT EXISTS is O(n²) — no oracle): every
output row must be non-dominated against a 200k-row sample AND against
the full output; every sampled non-output row must be dominated by some
output row (vectorized numpy checks).

Usage: python tools/probe_skyline_scale.py [n]   (default 10_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def check(out_pts: np.ndarray, sample_pts: np.ndarray) -> None:
    """Strict-dominance audit of the claimed skyline vs a sample."""
    for i, p in enumerate(out_pts):
        ge = (out_pts >= p).all(axis=1)
        gt = (out_pts > p).any(axis=1)
        assert not (ge & gt).any(), f"output row {i} dominated within output"
    for i, p in enumerate(out_pts):
        ge = (sample_pts >= p).all(axis=1)
        gt = (sample_pts > p).any(axis=1)
        assert not (ge & gt).any(), f"output row {i} dominated by sample"
    # every sampled row NOT on the frontier must be dominated by an output row
    dominated = 0
    for p in sample_pts:
        ge = (out_pts >= p).all(axis=1)
        gt = (out_pts > p).any(axis=1)
        eq = (out_pts == p).all(axis=1)
        assert (ge & gt).any() or eq.any(), "sampled row escapes the skyline"
        dominated += 1
    print(f"  audit: {len(out_pts)} output rows non-dominated; "
          f"{dominated:,} sampled rows all covered")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-skyline-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.operators.skyline import pareto_frontier

    # deterministic uniforms from the id hash (no RNG state)
    base = spark.range(n).repartition(2 * int(cpus)).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) / F.lit(float(1 << 63))).alias("x"),
        (F.abs(F.xxhash64("id", F.lit(1))) / F.lit(float(1 << 63))).alias("y"),
    ).cache()
    base.count()

    print(f"regime 1: {n:,} independent uniform points")
    t0 = time.time()
    n_local = pareto_frontier(base, ["x", "y"], merge=False).count()
    t_local = time.time() - t0
    t0 = time.time()
    out = pareto_frontier(base, ["x", "y"]).select("x", "y").collect()
    t_full = time.time() - t0
    print(f"  phase-1 survivors {n_local:,} of {n:,} "
          f"({n / max(n_local, 1):,.0f}x cut, {t_local:.1f}s); "
          f"global skyline {len(out):,} rows in {t_full:.1f}s end-to-end")
    out_pts = np.array([[r["x"], r["y"]] for r in out])
    sample = np.array(
        base.sample(fraction=min(1.0, 200_000 / n), seed=7)
        .select("x", "y").collect()
    )
    check(out_pts, sample)

    # regime 2: ridge — y in [-x, -x + 1e-4]: a wide genuine frontier
    m = min(n, 1_000_000)
    ridge = spark.range(m).repartition(2 * int(cpus)).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) / F.lit(float(1 << 63))).alias("x"),
        (
            -(F.abs(F.xxhash64("id")) / F.lit(float(1 << 63)))
            + F.abs(F.xxhash64("id", F.lit(2))) / F.lit(float(1 << 63)) * 1e-4
        ).alias("y"),
    ).cache()
    ridge.count()
    print(f"regime 2: {m:,} ridge points (anti-correlated, wide frontier)")
    t0 = time.time()
    n_local2 = pareto_frontier(ridge, ["x", "y"], merge=False).count()
    t_local2 = time.time() - t0
    t0 = time.time()
    n_sky2 = pareto_frontier(ridge, ["x", "y"]).count()
    t_full2 = time.time() - t0
    print(f"  phase-1 survivors {n_local2:,} of {m:,} ({t_local2:.1f}s); "
          f"global skyline {n_sky2:,} rows in {t_full2:.1f}s — the merge "
          f"task saw {n_local2:,} rows, not {m:,}")
    spark.stop()


if __name__ == "__main__":
    main()
