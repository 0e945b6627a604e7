"""Scale probe for the LSH clustering path: near_dup_clusters over
minhash_dup_pairs at 20x-amplified sf0.1 documents (100k docs, every doc
with 19 verbatim copies — the B7 adversarial near-dup load), validating
that the MinHash edge source + connected components collapse every copy
family and that the wall time stays shuffle-bounded.

Usage: python tools/probe_dedup_clusters.py [amplification]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("dedup-cluster-probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_base = base.count()
    copies = spark.range(amp).select(F.col("id").alias("__k"))
    docs = base.crossJoin(copies).select(
        (F.col("doc_id") + F.col("__k") * n_base).alias("doc_id"), "text"
    )

    from tsne_flink_spark.pipeline.curation import near_dup_clusters
    from tsne_flink_spark.pipeline.dedup import minhash_dup_pairs

    t0 = time.time()
    pairs = minhash_dup_pairs(docs, threshold=0.8)
    out = near_dup_clusters(docs, pairs=pairs)
    n_docs = out.count()
    n_clusters = out.select("cluster_id").distinct().count()
    wall = time.time() - t0

    # every verbatim copy family must collapse: copy k of base doc d has
    # id d + k*n_base, and its cluster must equal the cluster of copy 0
    # (identical text -> identical signature -> guaranteed candidate pair)
    canon = out.where(F.col("doc_id") < n_base).select(
        F.col("doc_id").alias("__base"), F.col("cluster_id").alias("__c0")
    )
    mismatches = (
        out.withColumn("__base", F.col("doc_id") % n_base)
        .join(canon, "__base")
        .where(F.col("cluster_id") != F.col("__c0"))
        .count()
    )
    kept = out.where("keep = 1").count()
    print(
        f"docs={n_docs} (amp x{amp}) wall={wall:.1f}s "
        f"clusters={n_clusters} kept={kept} "
        f"copy-family mismatches={mismatches} (want 0); "
        f"kept == clusters: {kept == n_clusters}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
