"""Probe: count-min sketch build at 10M rows / ~1M distinct values.

Claim under test (pipeline/sketches.countmin_sketch): the build's
shuffle is bounded at d x w rows REGARDLESS of input size — the d bucket
hashes ride one explode off a single input scan, and the
groupBy(depth, bucket) partial-aggregates map-side, so only (depth,
bucket) keys cross the wire (<= 4 x 1024 = 4096 of them).  The naive
alternative (groupBy value then re-bucket) shuffles the whole
vocabulary.

Measures, for w=1024 / d=4 over 10M rows (~1M distinct Zipf-ish values):
  - the post-shuffle group count (== rows that survived map-side
    combine) vs the d*w bound and vs the distinct-value count;
  - build wall vs an exact full-vocabulary groupBy count over the same
    cached rows;
  - estimate error at the heavy head (top-20 true counts vs count-min
    estimates: always >=, bounded by collisions at 1M distinct / 1024
    buckets).

Usage: python tools/probe_countmin_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tsne_flink_spark.pipeline.sketches import (  # noqa: E402
    countmin_estimate,
    countmin_sketch,
)

N, W, D, PARTS = 10_000_000, 1024, 4, 32


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # heavy-headed value stream (the regime count-min exists for: point
    # error is ~2N/w absolute, so only counts >> N/w are estimable):
    # u uniform via LCG, rank = floor(1e6 * u^3) — rank 0 draws ~1% of
    # the stream (~100k >> N/w ~ 10k), ~1M distinct tail values — all
    # deterministic column arithmetic, no RNG state
    u = (
        F.pmod(F.col("id") * F.lit(1_103_515_245) + F.lit(12_345),
               F.lit(1 << 31)).cast("double")
        / F.lit(float(1 << 31))
    )
    rows = spark.range(N).select(
        F.concat(
            F.lit("v"),
            F.floor(F.lit(1_000_000.0) * u * u * u).cast("long").cast("string"),
        ).alias("t")
    )
    rows = rows.repartition(PARTS).cache()
    n = rows.count()
    n_distinct = rows.distinct().count()

    t0 = time.time()
    sk = countmin_sketch(rows, "t", w=W, d=D).cache()
    depth_rows = sk.count()
    t_build = time.time() - t0
    # the shuffle payload == the (depth, bucket) groups that exist
    groups = (
        sk.select(
            F.size(F.filter("counts", lambda c: c > 0)).alias("nz")
        )
        .agg(F.sum("nz"))
        .collect()[0][0]
    )

    t0 = time.time()
    exact_top = (
        rows.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "t")
        .limit(20)
    ).collect()
    t_exact = time.time() - t0

    probes = spark.createDataFrame(
        [(r["t"],) for r in exact_top], "t string"
    )
    est = {
        r["t"]: r["est"]
        for r in countmin_estimate(sk, probes, "t").collect()
    }
    true = {r["t"]: r["n"] for r in exact_top}
    assert all(est[t] >= n_ for t, n_ in true.items()), "underestimate!"
    # count-min's guarantee is ADDITIVE: err <= 2N/w w.p. 1 - 2^-d; a
    # relative reading is meaningful only for counts >> N/w (the
    # heavy-hitter band the sketch exists for)
    add_bound = 2.0 * n / W
    max_add = max(est[t] - n_ for t, n_ in true.items())
    band = {t: n_ for t, n_ in true.items() if n_ >= 2 * add_bound}
    rel = max(
        ((est[t] - n_) / n_ for t, n_ in band.items()), default=0.0
    )
    print(
        f"countmin @ {n:,} rows / {n_distinct:,} distinct: "
        f"{depth_rows} depth rows, nonzero counters {groups:,} <= d*w "
        f"bound {D * W:,} (vs {n_distinct:,} a vocabulary groupBy "
        f"shuffles = {n_distinct / (D * W):,.0f}x less); build "
        f"{t_build:.1f}s vs exact top-20 groupBy {t_exact:.1f}s; "
        f"max additive overestimate {max_add:,.0f} vs the 2N/w bound "
        f"{add_bound:,.0f}; heavy band (true >= 4N/w, {len(band)} "
        f"values) max rel err {rel:.2%} (never under anywhere)"
    )


if __name__ == "__main__":
    main()
