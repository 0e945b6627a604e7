"""Round-8 probe (VERDICT r7 #5): the round-7 text additions at 20x corpus.

Load: sf0.1 documents x 20 = 100k docs (the B33 recipe).  Three probes:

- BM25 with a HOT-KEY query: one injected term present in EVERY document
  (universal-term df = N) alongside two ordinary terms — the tf groupBy
  and per-term join must stay shuffle-bounded, no straggler task;
- corpus-LM (bigram) perplexity: the LM table is a bounded aggregate over
  100k docs' bigrams; scoring joins the event table back to it;
- sliding-window chunking (128/64): pure narrow codegen, the cheap floor.

Straggler detection: wall time per probe plus the Spark statusTracker's
max-concurrent check is overkill here — instead each probe re-runs with
its output row count asserted and the wall recorded; a serialized hot-key
stage shows up as a multi-minute wall (cf. B17's 68x before AQE skew
handling), which the assert-below-ceiling catches.

Usage: python tools/probe_text_scale.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

HOT = "universalterm"


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-text-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.curation import chunk_documents
    from tsne_flink_spark.pipeline.lm import ngram_lm_scores
    from tsne_flink_spark.pipeline.tfidf import bm25_scores

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(reps)
        .select(
            (F.col("rep") * 10_000_000 + F.col("doc_id")).alias("doc_id"),
            # the hot term lands in EVERY doc: df = N, tf rows = N
            F.concat_ws(" ", "text", F.lit(HOT)).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    n = docs.count()
    out = {"n_docs": n}

    t0 = time.time()
    bm = bm25_scores(docs, [HOT, "join", "window"]).cache()
    n_bm = bm.count()
    out["bm25_hotkey_sec"] = round(time.time() - t0, 1)
    out["bm25_rows"] = n_bm
    # the universal term matches every doc; its idf is the Lucene floor
    # ln(1 + (N - N + 0.5)/(N + 0.5)) ~ 0 but > 0, so every doc scores
    assert n_bm == n, (n_bm, n)
    bm.unpersist()

    t0 = time.time()
    lm = ngram_lm_scores(docs).cache()
    n_lm = lm.count()
    out["lm_perplexity_sec"] = round(time.time() - t0, 1)
    out["lm_rows"] = n_lm
    assert n_lm == n, (n_lm, n)
    finite = lm.where(
        F.col("perplexity").isNotNull() & (F.col("perplexity") > 0)
    ).count()
    assert finite == n, (finite, n)
    lm.unpersist()

    t0 = time.time()
    ch = chunk_documents(docs, window=128, stride=64)
    n_ch = ch.count()
    out["chunk_documents_sec"] = round(time.time() - t0, 1)
    out["chunk_rows"] = n_ch
    assert n_ch >= n  # every doc yields at least one chunk

    from tsne_flink_spark.pipeline.bpe import (
        bpe_tokenize,
        train_bpe,
        word_frequencies,
    )

    t0 = time.time()
    merges = train_bpe(word_frequencies(docs), n_merges=64)
    bp = bpe_tokenize(docs, merges)
    n_bp = bp.count()
    out["bpe_train_apply_sec"] = round(time.time() - t0, 1)
    out["bpe_rows"] = n_bp
    assert n_bp == n, (n_bp, n)

    print(json.dumps(out))
    # straggler ceilings: B17-class serialization shows up as minutes
    for k in (
        "bm25_hotkey_sec",
        "lm_perplexity_sec",
        "chunk_documents_sec",
        "bpe_train_apply_sec",
    ):
        assert out[k] < 300, (k, out[k])


if __name__ == "__main__":
    main()
