"""Scale probe for the end-to-end curation pipeline (BASELINE.md B27).

The sf0.1 documents table replicated R times with distinct ids and the
copies' text perturbed per replica (suffix token) for half the replicas —
so the corpus carries BOTH massive exact-duplicate families (unperturbed
replicas) and massive near-duplicate families (perturbed ones), the
regime a 100-TB curation pass actually faces.  Runs
``curation_pipeline`` with the LSH miner (the documented corpus-scale
configuration) and checks the stage accounting:

- every document annotated exactly once (total == input count);
- exact-dup kills >= the guaranteed floor (unperturbed non-min copies
  whose family head survived the holdout stage);
- wall time and stage shuffle behavior recorded for BASELINE.md.

Usage: python tools/probe_curation_scale.py [R] [sf_dir]
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
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tsne_flink_spark.pipeline.curation import curation_pipeline

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    # ids are striped per replica (r * 10M + base), NOT contiguous per
    # family: with contiguous family ids any mod-based holdout split hits
    # every family, and the holdout copies then (correctly) flag every
    # surviving training copy as contaminated — the whole corpus dies at
    # the decontamination stage and the later stages never run.  Striping
    # sends whole families (base % holdout_mod == 0) to holdout instead.
    corpus = (
        base.crossJoin(spark.range(R).select(F.col("id").alias("__r")))
        .select(
            (F.col("__r") * F.lit(10_000_000) + F.col("doc_id")).alias("doc_id"),
            # odd replicas get a per-replica suffix token: near-dups of the
            # even replicas, exact dups of nothing
            F.when(
                F.col("__r") % 2 == 1,
                F.concat(F.col("text"), F.lit(" replicatoken"),
                         F.col("__r").cast("string")),
            ).otherwise(F.col("text")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    n = n_base * R
    print(f"corpus: {n_base} base x {R} = {n} docs")
    t0 = time.time()
    out = curation_pipeline(corpus, pair_miner="minhash").persist()
    stages = {
        r["stage"]: r["n"]
        for r in out.groupBy("stage").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall = time.time() - t0
    total = sum(stages.values())
    print(f"wall {wall:.1f}s  stages: {sorted(stages.items())}")
    assert total == n, f"annotation not total: {total} != {n}"
    # guaranteed floor: every non-holdout family has ceil(R/2) bit-equal
    # unperturbed copies, of which all but the surviving head are exact
    # dups; holdout takes whole families (striped ids), so combined
    # holdout+exact_dup must reach the floor
    even = (R + 1) // 2
    floor = n_base * R // 10 + (n_base - n_base // 10) * (even - 1)
    early = stages.get("holdout", 0) + stages.get("exact_dup", 0)
    assert early >= floor, f"exact-dup accounting broke: {early} < {floor}"
    assert stages.get("kept", 0) > 0
    print("PASS")
    spark.stop()


if __name__ == "__main__":
    main()
