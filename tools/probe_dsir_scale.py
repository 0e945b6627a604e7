"""Round-9 probe: DSIR importance weighting + Gumbel-top-k at 20x corpus.

Load: sf0.1 documents x N replicas (the B33/B36 recipe; default 20 ->
~100k docs).  The claims under test:

- both bucket-count tables stay BOUNDED at n_buckets rows regardless of
  corpus size (asserted), so the scoring joins are broadcasts;
- the gram explode -> bounded groupBy -> join-back -> per-doc groupBy
  chain is shuffle-bounded — no straggler (wall ceiling assert);
- a HOT-KEY stress: one gram injected into EVERY candidate doc (its
  bucket count covers the whole corpus) must not serialize the scoring
  join — the join key is the bucket, the count table row is one of
  n_buckets either way;
- Gumbel-top-k selection is a sort of one row per candidate, capped.

Usage: python tools/probe_dsir_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CEILING_SEC = 300.0


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-dsir-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.dsir import dsir_log_weights, dsir_select

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    docs = (
        base.crossJoin(
            spark.range(replicas).select(F.col("id").alias("__rep"))
        )
        .select(
            (F.col("doc_id") * replicas + F.col("__rep")).alias("doc_id"),
            # hot-key stress: every candidate doc carries one universal gram
            F.when(
                F.col("lang") != "en",
                F.concat(F.col("text"), F.lit(" universaldsirgram")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .repartition(64)
    )
    n_docs = docs.count()
    n_cand = docs.where("lang <> 'en'").count()
    print(f"# corpus: {n_docs} docs ({n_cand} candidates), {replicas}x sf0.1")

    t0 = time.time()
    w = dsir_log_weights(docs, target=F.col("lang") == "en")
    n_w = w.count()
    t_w = time.time() - t0
    print(f"# dsir_log_weights: {n_w} rows in {t_w:.1f}s")
    assert n_w == n_cand, (n_w, n_cand)
    assert t_w < CEILING_SEC, f"straggler ceiling: {t_w:.1f}s"

    # bounded-table claim: count the distinct buckets actually populated
    from tsne_flink_spark.pipeline.dsir import _bucket_counts, hashed_gram_buckets

    grams = hashed_gram_buckets(docs)
    n_buckets_seen = _bucket_counts(grams).count()
    print(f"# populated buckets: {n_buckets_seen} (bound 4096)")
    assert n_buckets_seen <= 4096

    t0 = time.time()
    sel = dsir_select(w, k=10_000, seed=42)
    n_sel = sel.count()
    t_s = time.time() - t0
    print(f"# gumbel-top-10k: {n_sel} rows in {t_s:.1f}s")
    assert n_sel == min(10_000, n_cand)
    assert t_s < CEILING_SEC, f"straggler ceiling: {t_s:.1f}s"

    # selection must favor target-like docs: mean logw of the selected set
    # above the candidate-pool mean
    m_all = w.agg(F.avg("logw")).first()[0]
    m_sel = sel.agg(F.avg("logw")).first()[0]
    print(f"# mean logw: pool {m_all:.2f} vs selected {m_sel:.2f}")
    assert m_sel > m_all

    print("PROBE_OK")
    spark.stop()


if __name__ == "__main__":
    main()
