"""Inverted index build / persist / serve.

The retrieval half of a corpus pipeline: tokenize ONCE, persist postings,
and answer every subsequent BM25 query from the index instead of
re-scanning the corpus text.  Spark-first shapes:

- **build**: explode -> groupBy(term, doc) tf -> per-term postings rows.
  Postings are SHARDED: a chunk column splits any term's postings into
  rows of at most ``max_postings`` entries, so a stop-word's postings
  (O(N) docs at corpus scale) can never exceed a single row/record limit
  — the chunking is a row_number window partitioned by term, the standard
  index-build shuffle.
- **persist**: parquet partitioned-by nothing but sorted within files by
  term; the term predicate of a query prunes row groups via min/max
  statistics (the same data-skipping story as sources/layout.py).
- **serve**: :func:`bm25_from_index` computes exactly the formula of
  pipeline/tfidf.bm25_scores (Lucene idf, k1/b) from (index, doc-length
  table, corpus stats) — verified identical, and carrying the same exact
  DuckDB oracle in the driver gate.

Corpus statistics (N, avgdl, per-doc lengths) live in a side table
written at build time; BM25 is defined over them, so serving never needs
the original text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tsne_flink_spark.pipeline.text import tokenize


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_postings: int = 100_000,
    lowercase: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(index, doclens): index rows (term, chunk, df, postings
    array<struct<doc_id, tf>>) with at most ``max_postings`` postings per
    row; doclens rows (doc_id, dl) for every document with >= 1 token.

    df is the TERM-level document frequency (repeated on each chunk row
    so a chunk is self-sufficient for idf).  Postings within a chunk are
    sorted by doc_id; chunks are contiguous doc_id ranges."""
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    spread = docs.select(
        F.col(id_col).alias("doc_id"), text.alias("__text")
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = spread.select(
        "doc_id", F.explode(tokenize(F.col("__text"))).alias("term")
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    chunked = tf.withColumn(
        "chunk",
        F.floor((F.row_number().over(w) - 1) / F.lit(max_postings)).cast(
            "int"
        ),
    )
    index = (
        chunked.groupBy("term", "chunk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("postings"),
        )
        .withColumn(
            "df",
            F.sum("__n").over(Window.partitionBy("term")).cast("long"),
        )
        .select("term", "chunk", "df", "postings")
    )
    # dl comes from the doc table, NOT the exploded tokens: zero-token
    # documents must appear with dl=0 so N and avgdl match bm25_scores'
    # whole-corpus statistics exactly
    doclens = spread.select(
        "doc_id",
        F.size(tokenize(F.col("__text"))).cast("long").alias("dl"),
    )
    return index, doclens


def write_inverted_index(
    index: DataFrame, doclens: DataFrame, path: str
) -> None:
    """Persist index + doclens as parquet.  Index files are sorted within
    partitions by term so a term-predicate scan skips row groups on
    min/max statistics."""
    index.sortWithinPartitions("term").write.mode("overwrite").parquet(
        f"{path}/postings"
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens")


def read_inverted_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/doclens"),
    )


def bm25_from_index(
    index: DataFrame,
    doclens: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, score) for the query — numerically identical to
    pipeline/tfidf.bm25_scores on the same corpus (same Lucene idf, same
    saturation; N and avgdl derived from the doclens table).  The term
    IN-list filter sits directly on the postings scan (predicate
    pushdown + row-group skipping on the sorted term column)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    stats = doclens.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("dl").alias("avgdl"),
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if avgdl == 0.0:
        return doclens.select("doc_id").limit(0).withColumn(
            "score", F.lit(0.0)
        )
    hits = (
        index.where(F.col("term").isin(terms))
        .select(
            "term",
            "df",
            F.explode("postings").alias("__p"),
        )
        .select(
            "term", "df",
            F.col("__p.doc_id").alias("doc_id"),
            F.col("__p.tf").alias("tf"),
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = hits.join(doclens, "doc_id").select(
        "doc_id",
        (
            idf
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            )
        ).alias("__c"),
    )
    return contrib.groupBy("doc_id").agg(F.sum("__c").alias("score"))
