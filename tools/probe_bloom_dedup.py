"""Round-11 probe: the Bloom-prefilter incremental dedup at 20x batch —
does the broadcast bitmap actually CUT the index-join input, and does the
output stay identical to the plain fingerprint join?

The prefilter's value proposition is physical, not semantic: at 100 TB,
every ingestion batch left-joins against the historical fingerprint index,
shuffling the WHOLE batch on the fingerprint key.  With the bitmap on the
executors, only rows the filter cannot rule out (~|true dups| +
fpp * |batch|) enter the join.  This probe replicates the sf0.1 documents
20x into a 100k-row batch where 5% are true index dups, runs BOTH
formulations, and reports:

- join-input rows (Bloom "maybe" count) vs the full batch size — the cut;
- output equality (exact annotate vs Bloom annotate, full collect compare);
- wall time for both paths, same session, exact-first then Bloom.

Usage: python tools/probe_bloom_dedup.py [sf_dir] [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-bloom-dedup")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.dedup import (
        _bloom_positions,
        build_fingerprint_bloom,
        fingerprint_index,
        incremental_dedup_annotate,
        incremental_dedup_annotate_bloom,
    )
    from tsne_flink_spark.pipeline.text import fingerprint
    from tsne_flink_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # Historical index: every original document.
    index = fingerprint_index(docs).cache()
    n_index = index.count()

    # 20x batch: replica 0 of every 20th doc keeps the ORIGINAL text (a
    # true ref_dup); everything else gets a replica-tagged text the index
    # has never seen.  doc_ids offset so the batch is id-disjoint.
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    batch = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") + F.col("rep") * (n_docs + 7)).alias("doc_id"),
            F.when(
                (F.col("rep") == 0) & (F.col("doc_id") % 20 == 0),
                F.col("text"),
            )
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" replica "), F.col("rep").cast("string")
                )
            )
            .alias("text"),
        )
        .cache()
    )
    n_batch = batch.count()
    print(f"index: {n_index} fingerprints; batch: {n_batch} rows "
          f"({replicas}x of {n_docs})")

    # --- the cut: how many batch rows survive the prefilter? ---
    bitmap, m, k = build_fingerprint_bloom(index, fpp=0.001)
    bc = spark.sparkContext.broadcast(bitmap)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(pos):
        import numpy as np
        import pandas as pd

        if not len(pos):
            return pd.Series([], dtype=bool)
        bm = bc.value
        idx = np.stack(pos.to_numpy()).astype(np.int64)
        bits = (bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    maybe = (
        batch.select(fingerprint(F.col("text")).alias("__fp"))
        .where(might_contain(_bloom_positions(F.col("__fp"), m, k)))
        .count()
    )
    cut_pct = 100.0 * (1 - maybe / n_batch)
    print(f"bloom: m={m} bits ({m // 8 / 1024:.1f} KiB), k={k}; "
          f"join input {n_batch} -> {maybe} rows ({cut_pct:.2f}% cut)")

    # --- output equality + wall, exact first ---
    t0 = time.time()
    exact = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate(batch, index).collect()
    }
    t_exact = time.time() - t0
    t0 = time.time()
    bloom = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(batch, index).collect()
    }
    t_bloom = time.time() - t0
    same = exact == bloom
    from collections import Counter

    print(f"exact:  {t_exact:.1f}s  statuses {dict(Counter(exact.values()))}")
    print(f"bloom:  {t_bloom:.1f}s  statuses {dict(Counter(bloom.values()))}")
    print(f"outputs identical: {same}")
    assert same, "Bloom variant diverged from the exact annotate"
    # the filter must rule out the overwhelming majority of a mostly-fresh
    # batch (|true dups| ~ n_docs/20, fpp adds ~0.1%)
    assert maybe < 0.05 * n_batch, f"prefilter barely cut: {maybe}/{n_batch}"
    print("PROBE OK")
    spark.stop()


if __name__ == "__main__":
    main()
