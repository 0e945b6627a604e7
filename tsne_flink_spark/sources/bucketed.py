"""Storage-level bucketing for co-located joins.

At 100-TB scale the dominant cost of a repeated fact-fact equi-join
(orders x lineitem, corpus x corpus self-joins keyed by doc family, ...)
is re-shuffling both sides on every query.  Writing the tables bucketed
on the join key amortizes that shuffle into the write: Spark records the
bucket spec in the catalog, and a join of two tables bucketed on the same
key with the same bucket count plans as a SortMergeJoin with NO Exchange
on either side — each task reads matching bucket files directly.

The reference engine has no persistent-storage layer (CSV in, CSV out;
Tsne.scala:33-103), so this module is part of the pipeline-extension
surface, not reference parity.

Usage::

    write_bucketed(orders,   "orders_b",   "o_orderkey", 32, path=...)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 32, path=...)
    joined = spark.table("orders_b").join(
        spark.table("lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"))
    # plan: SortMergeJoin, zero Exchange operators

Notes that matter at scale:

- Both sides must share the bucket COUNT; Spark joins bucketed tables
  with differing counts by shuffling the smaller-bucketed side (or, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``, coalescing).
- ``sortBy`` on the bucket key additionally removes the per-task Sort for
  sort-merge joins on single-file buckets.
- Bucket pruning: an equality filter on the bucket column scans 1/N of
  the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    on ``key``.  ``path`` makes it an external table rooted there (the
    catalog still records the bucket spec); without it the table lands in
    the session warehouse directory."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.  This is a
    plain DataFrame join — the shuffle elimination comes from the catalog
    bucket specs, not from anything special here — provided as the named
    counterpart of ``write_bucketed`` so callers (and tests) can assert
    the exchange-free plan in one place."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(
        right, left[left_key] == right[right_key], how
    )
