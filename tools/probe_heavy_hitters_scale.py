"""Round-8 probe: Misra-Gries heavy hitters vs naive full groupBy at a
web-corpus-shaped vocabulary.

The MG claim: the naive plan shuffles EVERY distinct term (web corpora:
mostly singletons) to answer a question whose output is <= k rows; the
two-phase sketch shuffles only candidate occurrences.  Load: sf0.1 docs
x 20 (100k docs, the common terms stay heavy) + a unique-vocabulary tail
on every replica (4M filler tokens over 2M distinct rare terms — the
singleton-dominated shape).  Both plans are timed and must agree
exactly.

Usage: python tools/probe_heavy_hitters_scale.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-hh-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.sketches import heavy_hitters
    from tsne_flink_spark.pipeline.text import tokenize

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(reps)
        .select(
            (F.col("rep") * 10_000_000 + F.col("doc_id")).alias("doc_id"),
            # unique rare-term tail per physical doc: the
            # singleton-dominated vocabulary shape of real web text
            F.concat_ws(
                " ",
                F.col("text"),
                F.concat(F.lit("rare"), (F.col("rep") * 10_000_000
                         + F.col("doc_id")).cast("string"), F.lit("a")),
                F.concat(F.lit("rare"), (F.col("rep") * 10_000_000
                         + F.col("doc_id")).cast("string"), F.lit("b")),
            ).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    n_docs = docs.count()
    k = 100

    t0 = time.time()
    mg = {
        r["term"]: r["n"] for r in heavy_hitters(docs, k=k).collect()
    }
    mg_sec = round(time.time() - t0, 1)

    # naive: full-vocabulary groupBy, threshold after
    t0 = time.time()
    toks = docs.select(
        F.explode(tokenize(F.lower(F.col("text")))).alias("term")
    )
    n_total = toks.count()
    naive = {
        r["term"]: r["n"]
        for r in toks.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") * F.lit(k) > F.lit(n_total))
        .collect()
    }
    naive_sec = round(time.time() - t0, 1)

    distinct_terms = toks.select("term").distinct().count()
    out = {
        "n_docs": n_docs,
        "distinct_terms": distinct_terms,
        "k": k,
        "heavy_terms": len(mg),
        "mg_sec": mg_sec,
        "naive_sec": naive_sec,
        "identical": mg == naive,
    }
    print(json.dumps(out))
    assert out["identical"], "sketch path must equal the naive answer"


if __name__ == "__main__":
    main()
