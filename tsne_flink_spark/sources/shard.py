"""Deterministic corpus sharding: seeded global shuffle into N shards.

Training pipelines need a REPRODUCIBLE global document shuffle written as a
fixed number of shard files: the order a data loader streams examples is
part of the experiment, so re-running the writer (on any cluster layout)
must produce the same document -> (shard, position) mapping.  Random
``repartition`` gives neither determinism nor an order; ``orderBy(rand)``
buries the order in file layout.

Here each document gets a seeded md5 key; the parallel JVM-side dense rank
over that key (``operators.knn._global_rank_by`` — one materialized range
shuffle + partition offsets, no single-partition window, BASELINE.md B15)
yields the global shuffle position r, and round-robin assignment
``shard = r % n_shards, rank_in_shard = r // n_shards`` balances shards to
within one document.  The whole mapping is plain SQL over md5, so the gate
query carries an exact DuckDB oracle.

``write_sharded`` materializes the layout: one parquet directory per shard
(``shard=K/``), rows sorted by ``rank_in_shard`` inside each, with the
rank kept as a column — readers that need the exact stream order sort by
it (parquet row order alone is not a contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_assignments(
    docs: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Input rows plus (shard, rank_in_shard) from the seeded global
    shuffle; deterministic for a given (corpus, n_shards, seed)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from tsne_flink_spark.operators.knn import _global_rank_by

    keyed = docs.withColumn(
        "__k",
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
    )
    ranked = _global_rank_by(keyed, "__k", id_col)
    return ranked.select(
        *docs.columns,
        (F.col("__rank") % n_shards).cast("long").alias("shard"),
        (F.floor(F.col("__rank") / n_shards)).cast("long").alias(
            "rank_in_shard"
        ),
    )


def write_sharded(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    compression: str = "zstd",
) -> None:
    """Write the seeded shuffle as ``path/shard=K/`` parquet directories,
    each sorted by ``rank_in_shard`` (kept as a column — the order
    contract).  One shuffle on the shard key bounds file counts (one file
    per shard directory), same discipline as the curation CLI sink."""
    out = shard_assignments(docs, n_shards, seed, id_col)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "rank_in_shard")
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("shard")
        .parquet(path)
    )
