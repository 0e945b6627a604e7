"""Scale probe for pipeline/semantic.semantic_dedup (BASELINE.md B26).

Replicates the B24 adversarial load: the sf0.1 embeddings table duplicated
R times (every vector with R-1 exact copies) — at R=20 that is ~100k
vectors where every copy family MUST collapse (identical vectors share an
argmax centroid by construction, so SemDeDup's cluster-boundary blind spot
cannot hide them).  Verifies:

- every copy family keeps exactly one representative (the min id);
- kill count == N * (R-1) / R at minimum (base-corpus near-dups may add);
- wall time and the within-cluster pair-join row count stay shuffle-bounded.

Usage: python tools/probe_semantic.py [R] [sf_dir]
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.pipeline.semantic import semantic_dedup

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    copies = base.crossJoin(
        spark.range(R).select(F.col("id").alias("__r"))
    ).select(
        (F.col("vec_id") + F.col("__r") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
    )
    n = n_base * R
    print(f"corpus: {n_base} base x {R} = {n} vectors")

    t0 = time.time()
    out = semantic_dedup(copies, threshold=0.98).persist()
    kills = out.where(F.col("keep") == 0).count()
    wall = time.time() - t0
    keepers = out.where(F.col("keep") == 1).count()
    # per-family collapse check: group by base id (vec_id % 10M); each
    # family of R identical vectors must contribute AT MOST one keeper
    # (cross-family base near-dups can merge families; never split them)
    fam = (
        out.withColumn("__base", F.col("vec_id") % F.lit(10_000_000))
        .groupBy("__base")
        .agg(F.sum("keep").alias("k"))
    )
    split_families = fam.where(F.col("k") > 1).count()
    min_id_viol = (
        out.groupBy("group_id")
        .agg(F.min("vec_id").alias("mn"), F.sum("keep").alias("k"))
        .where((F.col("mn") != F.col("group_id")) | (F.col("k") != 1))
        .count()
    )
    print(
        f"wall {wall:.1f}s  kills {kills}  keepers {keepers} "
        f"(expected keepers <= {n_base})"
    )
    print(f"split families (>1 keeper): {split_families}  group violations: {min_id_viol}")
    assert split_families == 0, "a copy family kept more than one member"
    assert min_id_viol == 0
    assert keepers <= n_base
    assert kills == n - keepers
    print("PASS")
    spark.stop()


if __name__ == "__main__":
    main()
