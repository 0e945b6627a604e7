"""TF-IDF as pure DataFrame operations (no MLlib objects in the data plane).

Term frequencies, document frequencies, and idf are each one aggregation;
document vectors stay in "sparse map" form (term -> weight) so downstream
dedup/similarity can consume them without densifying a vocabulary-sized
array.  Shuffle profile: explode -> groupBy(doc, term) -> broadcast-join idf
(vocab is small relative to the corpus) -> groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> "F.Column":
    # one regex pass (split on whitespace runs + drop empties) — identical
    # tokens to normalize-then-split, half the regex work
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — raw counts per document.

    Raw rows are shuffled across cores before the tokenize+explode, which
    otherwise executes serially in a single-partition parquet scan stage.
    """
    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    return (
        spread.select(F.col(id_col), F.explode(_tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def document_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, df) — number of documents containing each term."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )


def tf_idf(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, term, tf, idf, tfidf) with the smoothed idf
    ln((1 + N) / (1 + df)) + 1 (scikit-learn convention)."""
    tf = term_frequencies(docs, text_col, id_col)
    if n_docs is None:
        n_docs = docs.count()
    dfreq = document_frequencies(tf, id_col)
    idf = dfreq.withColumn(
        "idf",
        F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
        + F.lit(1.0),
    )
    return tf.join(F.broadcast(idf), "term").select(
        id_col, "term", "tf", "idf", (F.col("tf") * F.col("idf")).alias("tfidf")
    )


def top_terms_per_doc(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k tf-idf terms per document (grouped top-k window)."""
    scored = tf_idf(docs, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", "tfidf", F.col("rn").cast("int").alias("rn"))
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-pair cosine similarity in tf-idf space, computed sparsely:
    join on shared terms, sum products, normalize — no dense vectors, no
    all-pairs stage (pairs with no shared term never materialize)."""
    scored = tf_idf(docs, text_col, id_col).select(
        F.col(id_col).alias("doc"), "term", "tfidf"
    )
    norms = scored.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )
    a = scored.select(F.col("doc").alias("a"), "term", F.col("tfidf").alias("wa"))
    b = scored.select(F.col("doc").alias("b"), "term", F.col("tfidf").alias("wb"))
    dots = (
        a.join(b, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc").alias("a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("doc").alias("b"), F.col("norm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            "a", "b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )
