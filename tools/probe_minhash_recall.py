"""Round-8 probe: MinHash+LSH pair recall vs exact ground truth.

The honesty metric for the approximate dedup path: the exact prefix-
filter miner (``ngram_jaccard_pairs``) is the lossless ground truth;
``minhash_dup_pairs`` trades a bounded candidate volume for S-curve
recall.  Both are run at the SAME shingle_n and threshold on the sf0.1
corpus and the pair sets compared: recall = |LSH∩exact| / |exact| and
(since LSH output is exact-verified) precision must be 1.0 by
construction — any false positive would be a verification bug, not an
approximation artifact.

Usage: python tools/probe_minhash_recall.py [threshold] [num_hashes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    num_hashes = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-minhash-recall")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.dedup import (
        minhash_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    t0 = time.time()
    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(
            docs, threshold=threshold, shingle_n=2
        ).collect()
    }
    exact_sec = round(time.time() - t0, 1)

    t0 = time.time()
    lsh = {
        (r["a"], r["b"])
        for r in minhash_dup_pairs(
            docs,
            threshold=threshold,
            num_hashes=num_hashes,
            shingle_n=2,
        ).collect()
    }
    lsh_sec = round(time.time() - t0, 1)

    inter = lsh & exact
    out = {
        "threshold": threshold,
        "num_hashes": num_hashes,
        "exact_pairs": len(exact),
        "lsh_pairs": len(lsh),
        "recall": round(len(inter) / max(len(exact), 1), 4),
        "false_positives": len(lsh - exact),
        "exact_sec": exact_sec,
        "lsh_sec": lsh_sec,
    }
    print(json.dumps(out))
    # exact-verified LSH pairs can never be false positives
    assert out["false_positives"] == 0, out


if __name__ == "__main__":
    main()
