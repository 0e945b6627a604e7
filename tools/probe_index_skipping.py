"""Round-8 probe: row-group skipping on the persisted inverted index.

The reason write_inverted_index sorts postings files by term: a BM25
query touches a handful of terms, and parquet min/max statistics on the
sorted term column let the scan skip every row group whose term range
misses the query.  This probe writes the sf0.1 index with small row
groups, then measures (a) the fraction of row groups a 3-term query
would have to read under sorted vs unsorted layout (pyarrow statistics,
engine-independent), and (b) the end-to-end bm25_from_index wall time on
both layouts.

Usage: python tools/probe_index_skipping.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

TERMS = ["join", "window", "stream"]


def rowgroup_hit_fraction(path: str) -> tuple[int, int]:
    """(hit, total) row groups whose [min, max] term range intersects any
    query term."""
    hit = total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(root, fn))
            idx = pf.schema_arrow.names.index("term")
            for rg in range(pf.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                total += 1
                if st is None:
                    hit += 1
                    continue
                if any(st.min <= t <= st.max for t in TERMS):
                    hit += 1
    return hit, total


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-index-skipping")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # block size is a hadoop conf (set directly on the context's hadoop
    # configuration — the spark.hadoop.* runtime-conf route does not
    # reach the parquet writer); the row-check floor must drop too or a
    # small table never splits
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("parquet.block.size", str(128 * 1024))
    hc.set("parquet.page.size.row.check.min", "10")

    from tsne_flink_spark.sources.index import (
        bm25_from_index,
        build_inverted_index,
        read_inverted_index,
    )

    base_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    # the synthetic sf0.1 vocabulary is ~50 terms — a one-row-group index.
    # Pad with filler documents carrying a large unique vocabulary (the
    # realistic web-corpus shape: millions of rare terms) so the postings
    # table has enough rows to split into many row groups.
    filler = spark.range(20000).select(
        (F.lit(10_000_000) + F.col("id")).alias("doc_id"),
        F.concat(
            F.lit("filler"), F.col("id").cast("string"),
            F.lit("a word filler"), F.col("id").cast("string"),
            F.lit("b tail"),
        ).alias("text"),
    )
    docs = base_docs.select("doc_id", "text").unionByName(filler)
    index, doclens = build_inverted_index(docs)

    base = "/tmp/probe_index_skip"
    sorted_dir = f"{base}/sorted"
    shuffled_dir = f"{base}/shuffled"
    # small row groups so a 5k-doc corpus produces enough of them to
    # measure skipping (the default 128 MB would give one group)
    index.coalesce(1).sortWithinPartitions("term").write.mode(
        "overwrite"
    ).parquet(f"{sorted_dir}/postings")
    doclens.write.mode("overwrite").parquet(f"{sorted_dir}/doclens")
    # adversarial control: same rows, random order
    index.orderBy(F.xxhash64("term", "chunk")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{shuffled_dir}/postings")
    doclens.write.mode("overwrite").parquet(f"{shuffled_dir}/doclens")

    out = {}
    for tag, d in (("sorted", sorted_dir), ("shuffled", shuffled_dir)):
        hit, total = rowgroup_hit_fraction(f"{d}/postings")
        idx, dl = read_inverted_index(spark, d)
        t0 = time.time()
        n = bm25_from_index(idx, dl, TERMS).count()
        out[f"{tag}_rowgroups_scanned"] = hit
        out[f"{tag}_rowgroups_total"] = total
        out[f"{tag}_scan_fraction"] = round(hit / max(total, 1), 3)
        out[f"{tag}_query_sec"] = round(time.time() - t0, 2)
        out[f"{tag}_rows"] = n
    print(json.dumps(out))
    assert out["sorted_rows"] == out["shuffled_rows"]
    assert out["sorted_scan_fraction"] < out["shuffled_scan_fraction"]


if __name__ == "__main__":
    main()
