"""Round-12 probe (VERDICT r11 item 4): driver ingress of the Bloom
bitmap build at ≥64 index partitions.

The pre-r12 build collect()ed one bitmap blob per index partition and
OR-merged on the driver — #partitions × m/8 bytes of driver ingress.
The r12 build treeAggregates the per-partition blobs with a depth that
keeps the final fan-in ~4, so driver ingress is O(m/8) regardless of
partitioning.  This probe replicates the exact kernel + treeAggregate
call against the module's own _bloom_params/_bloom_positions, counts
the blobs that actually reach the DRIVER process (merge calls executed
under the driver PID — executor-side merges run in worker processes
whose state never propagates back), and verifies the merged bitmap is
byte-identical to build_fingerprint_bloom's own output on the same
index.

Usage: python tools/probe_bloom_tree.py [n_keys] [n_partitions]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-bloom-tree")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.dedup import (
        _bloom_params,
        _bloom_positions,
        build_fingerprint_bloom,
    )

    index = (
        spark.range(n_keys)
        .select(F.xxhash64(F.col("id")).alias("fp"))
        .repartition(n_parts)
    )
    m, k = _bloom_params(n_keys, 0.001)
    nbytes = m // 8
    print(
        f"index: {n_keys:,} fingerprints / {n_parts} partitions; "
        f"bitmap m={m:,} bits ({nbytes / 2**20:.1f} MiB), k={k}"
    )

    # reference result through the real code path
    t0 = time.time()
    bitmap, m2, k2 = build_fingerprint_bloom(index, expected=n_keys)
    t_build = time.time() - t0
    assert (m2, k2) == (m, k)

    # replicated pipeline with driver-side merge accounting
    from typing import Iterator

    import pandas as pd

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if not len(pdf):
                continue
            any_rows = True
            idx = np.concatenate(pdf["p"].to_list()).astype(np.int64)
            np.bitwise_or.at(
                bm, idx >> 3, (np.uint8(1) << (idx & 7).astype(np.uint8))
            )
        if any_rows:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    driver_pid = os.getpid()
    driver_merge_bytes: list[int] = []

    def or_blobs(a, b):
        if os.getpid() == driver_pid:
            # executor merges run in worker processes; their appends
            # never reach this list — only true driver ingress counts
            driver_merge_bytes.append(
                (len(a) if a is not None else 0)
                + (len(b) if b is not None else 0)
            )
        if a is None:
            return b
        if b is None:
            return a
        return (
            np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
        ).tobytes()

    blobs = index.select(
        _bloom_positions(F.col("fp"), m, k).alias("p")
    ).mapInPandas(kernel, schema="bm binary").rdd.map(lambda r: bytes(r["bm"]))
    p = max(blobs.getNumPartitions(), 1)
    depth = max(2, math.ceil(math.log(p, 4))) if p > 1 else 2
    t0 = time.time()
    merged = blobs.treeAggregate(None, or_blobs, or_blobs, depth=depth)
    t_tree = time.time() - t0
    assert merged is not None
    assert np.array_equal(np.frombuffer(merged, dtype=np.uint8), bitmap)

    # each driver-side merge call folds ONE incoming blob into the running
    # value; total new bytes entering the driver = sum of the b-sides
    n_driver_blobs = len(driver_merge_bytes)
    ingress = n_driver_blobs * nbytes
    old_ingress = p * nbytes
    print(
        f"treeAggregate depth={depth}: driver saw {n_driver_blobs} blobs "
        f"= {ingress / 2**20:.1f} MiB ingress vs collect()-era "
        f"{p} blobs = {old_ingress / 2**20:.1f} MiB "
        f"({old_ingress / max(ingress, 1):.0f}x cut); "
        f"bitmap byte-identical; build {t_build:.1f}s / probe tree {t_tree:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
