"""Probe: the d>=4 skyline fallback at scale (r13 verdict item 9).

Above d=3, _skyline_indices falls back to the desc-lex test-against-kept
sweep — O(n·s·d) with s the frontier size.  The question: does the
2-D/3-D pathology (huge anti-correlated frontiers making the sweep
quadratic) recur at d=4 in practice, or does the expected
O((ln n)^(d-1)) frontier keep the fallback fine?  Two regimes:

  1. 10M deterministic-uniform 4D points — expected frontier
     ~(ln n)^3 ≈ 4k rows; phase-1 local skylines must collapse the
     input and the fallback merge must stay in seconds.
  2. 1M points on a noisy x+y+z+w ~ const simplex shell — the
     adversarial frontier-is-everything case.  This is where O(n·s)
     would be quadratic; measure how far the geometric batch folding +
     lex-order pruning actually get, and how wall scales with n
     (125k / 250k / 500k / 1M) so the decision to build a d>=4
     divide-and-conquer kernel is evidence-based.

Plus a 200k-row sampled dominance audit of regime 1 (every sampled row
covered by a frontier row; every frontier row non-dominated).

Usage: python tools/probe_skyline_4d.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _uniform_col(col, a, c):
    from pyspark.sql import functions as F

    return (
        F.pmod(col * a + c, F.lit(1 << 31)) / F.lit(float(1 << 31))
    )


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from tsne_flink_spark.operators.skyline import pareto_frontier

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # --- regime 1: 10M uniform 4D (small expected frontier) ------------
    n = 10_000_000
    base = spark.range(n).select(
        "id",
        _uniform_col(F.col("id"), 1103515245, 12345).alias("x"),
        _uniform_col(F.col("id"), 69069, 1).alias("y"),
        _uniform_col(F.col("id"), 214013, 2531011).alias("z"),
        _uniform_col(F.col("id"), 134775813, 1).alias("w"),
    )
    base = base.repartition(32).cache()
    base.count()

    t0 = time.time()
    local = pareto_frontier(base, ["x", "y", "z", "w"], merge=False)
    n_local = local.count()
    t_local = time.time() - t0

    t0 = time.time()
    sky = pareto_frontier(base, ["x", "y", "z", "w"]).collect()
    t_full = time.time() - t0
    print(  # noqa
        f"uniform 10M x 4crit: phase-1 survivors {n_local} "
        f"({n / max(n_local, 1):.0f}x cut, {t_local:.1f}s), "
        f"global frontier {len(sky)} rows in {t_full:.1f}s end-to-end",
        flush=True,
    )

    fr = np.array([(r["x"], r["y"], r["z"], r["w"]) for r in sky])
    sample = np.array(
        [
            (r["x"], r["y"], r["z"], r["w"])
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
    print(  # noqa
        f"audit clean: {len(sample)} sampled rows covered, "
        f"all {len(fr)} frontier rows non-dominated",
        flush=True,
    )

    # --- regime 2: anti-correlated simplex shell, scaling sweep --------
    # single-task merge at 125k/250k pins the quadratic (measured 68 s /
    # 300 s — the recurring 2-D/3-D pathology); merge="range" (the r14
    # distributed phase-2) runs the full sweep incl. 1M
    for m in (125_000, 250_000, 500_000, 1_000_000):
        shell = spark.range(m).select(
            "id",
            _uniform_col(F.col("id"), 1103515245, 12345).alias("x"),
            _uniform_col(F.col("id"), 69069, 1).alias("y"),
            _uniform_col(F.col("id"), 134775813, 1).alias("w"),
        ).select(
            "id", "x", "y", "w",
            (
                F.lit(3.0) - F.col("x") - F.col("y") - F.col("w")
                + _uniform_col(F.col("id"), 214013, 2531011) * 1e-4
            ).alias("z"),
        )
        shell = shell.repartition(32).cache()
        shell.count()
        t0 = time.time()
        n_rng = pareto_frontier(
            shell, ["x", "y", "z", "w"], merge="range"
        ).count()
        t_rng = time.time() - t0
        line = (
            f"anti-correlated {m:,} x 4crit: frontier {n_rng} rows "
            f"({n_rng / m:.1%} of input) — range merge {t_rng:.1f}s"
        )
        if m <= 250_000:
            t0 = time.time()
            n_sky = pareto_frontier(shell, ["x", "y", "z", "w"]).count()
            t_single = time.time() - t0
            assert n_sky == n_rng, (n_sky, n_rng)
            line += f", single-task merge {t_single:.1f}s"
        print(line, flush=True)  # noqa
        shell.unpersist()


if __name__ == "__main__":
    main()
