"""Probe: KMV sketch build at 10M rows / ~1M distinct values per key.

Claim under test (pipeline/sketches.kmv_sketch): the per-partition k-min
partial pass bounds the rows crossing the build's shuffle to
O(k x partitions) per key — never the distinct-value set — so the build
cost is scan-dominated at any corpus size.  The naive alternative
(collect_set + slice, or distinct + window) shuffles every distinct
value.

Measures, for k=512 over 4 keys x 10M rows (~990k distinct per key):
  - rows emitted by the partial stage (the shuffle payload) vs the
    distinct count a naive build would shuffle;
  - wall time of the sketch build vs exact countDistinct over the same
    rows;
  - estimate accuracy vs the exact distinct counts.

Usage: python tools/probe_kmv_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tsne_flink_spark.pipeline.sketches import (  # noqa: E402
    _kmv_partials,
    kmv_estimate,
    kmv_hash,
    kmv_sketch,
)

N, K, PARTS = 10_000_000, 512, 32


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 4 keys, values drawn so each key sees ~N/4 rows with ~40% dup rate
    base = spark.range(N).repartition(PARTS)
    df = base.select(
        (F.col("id") % 4).cast("string").alias("k"),
        ((F.col("id") * 2_654_435_761) % 6_000_000).alias("v"),
    )
    df.cache().count()

    t0 = time.time()
    exact = {
        r.k: r.n
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    t_exact = time.time() - t0
    print(f"exact countDistinct: {t_exact:.2f}s  {exact}")

    # shuffle payload: rows out of the partial stage
    hashed = df.select("k", kmv_hash(F.col("v")).cast("long").alias("__hv"))
    partials = hashed.mapInPandas(
        _kmv_partials(["k"], K), schema="k string, __hv array<bigint>"
    ).select("k", F.explode("__hv").alias("h"))
    n_partial = partials.count()
    bound = K * PARTS * len(exact)
    total_distinct = sum(exact.values())
    print(
        f"partial rows shuffled: {n_partial:,} "
        f"(bound k*parts*keys = {bound:,}; naive build would shuffle "
        f"~{total_distinct:,} distinct values = "
        f"{total_distinct / max(n_partial, 1):.1f}x more)"
    )

    t0 = time.time()
    sk = kmv_sketch(df, ["k"], "v", k=K)
    ests = {
        r.k: r.est
        for r in sk.select(
            "k", kmv_estimate(F.col("kmv"), K).alias("est")
        ).collect()
    }
    t_sketch = time.time() - t0
    errs = {kk: abs(ests[kk] - exact[kk]) / exact[kk] for kk in exact}
    print(
        f"kmv build: {t_sketch:.2f}s  max rel err "
        f"{max(errs.values()):.4f}  ests={ {k: round(v) for k, v in ests.items()} }"
    )
    assert n_partial <= bound, "partial pass exceeded its shuffle bound"
    assert max(errs.values()) < 0.15
    print("PROBE OK")
    spark.stop()


if __name__ == "__main__":
    main()
