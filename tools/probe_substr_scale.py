"""Round-7 probe: ExactSubstr dedup (pipeline/substr.py) at 20x corpus.

Load: sf0.1 documents x 20 = 100k docs; every doc gets a shared 24-token
license footer (one universal hot gram family — the adversarial skew case,
cf. B17) and replicas of the SAME base doc additionally share their whole
body as a duplicated passage.  Checks:

- every footer is cut (provable floor: all 100k docs lose >= the footer);
- wall time stays shuffle-bounded (gram groupBy + join back + one
  Arrow-batched cut pass — no all-pairs stage);
- the universal gram does not serialize the join (AQE skew handling).

Usage: python tools/probe_substr_scale.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FOOTER = (
    "this work is provided under the terms of the creative commons "
    "attribution share alike four point zero international public "
    "license no warranty of any kind"
)


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-substr-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(reps)
        .select(
            (F.col("rep") * 10_000_000 + F.col("doc_id")).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit(FOOTER)).alias("text"),
        )
        .repartition(64)
        .cache()
    )
    n = docs.count()
    footer_tokens = len(FOOTER.split())

    t0 = time.time()
    out = exact_substring_dedup(docs, l=8).cache()
    n_out = out.count()
    wall = round(time.time() - t0, 1)

    agg = out.agg(
        F.sum((F.col("tokens_removed") >= footer_tokens).cast("long")).alias(
            "docs_losing_footer"
        ),
        F.sum("tokens_removed").alias("total_removed"),
        F.avg("n_dup_spans").alias("avg_spans"),
    ).first()
    leftover = out.where(
        F.col("text").contains("international public license")
    ).count()

    print(
        json.dumps(
            {
                "n_docs": n,
                "n_out": n_out,
                "wall_sec": wall,
                "docs_losing_at_least_footer": agg["docs_losing_footer"],
                "total_tokens_removed": int(agg["total_removed"]),
                "avg_spans_per_doc": round(float(agg["avg_spans"]), 2),
                "docs_with_footer_leftover": leftover,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
