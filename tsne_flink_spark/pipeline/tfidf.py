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
    # no forced broadcast: the idf table is one row per DISTINCT TERM, which
    # is unbounded at corpus scale (web-scale vocabularies reach 10^8 terms).
    # AQE broadcasts it at runtime whenever it is actually small.
    return tf.join(idf, "term").select(
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
    """Document-pair cosine similarity in tf-idf space, computed sparsely
    with LOSSLESS prefix filtering (the AllPairs bound, Bayardo et al.):

    1. Sort each document's terms by a global rarest-first order (idf DESC —
       idf is monotone decreasing in document frequency).
    2. A term is in the document's *prefix* iff the L2 mass of its
       normalized weights from that term onward could still reach
       ``threshold``: sqrt(1 - cum_before) >= t.  If two docs share only
       suffix terms of ``a``, then cos(a, b) <= ||suffix(a)|| < t — so every
       qualifying pair shares at least one prefix term of ``a``.
    3. Candidates = equi-join prefix(a) x all-terms(b): a ubiquitous term
       ("the") sits in the suffix of almost every document, so it joins
       few-prefix-docs x many docs instead of many x many — this removes the
       ~N^2 hot-term blow-up while provably emitting every qualifying pair.
    4. Exact dot over ALL shared terms for candidate pairs only, with the
       same unnormalized sum / norm-product formula as the naive version, so
       results are bit-compatible with the DuckDB oracle.

    Shuffle profile: O(sum_term df_prefix(term) * df(term)) candidate join +
    O(candidates * doc_len) verification — sub-quadratic whenever the
    threshold prunes, degrading gracefully to the naive join at t = 0.
    The per-doc norm attachment is a plain shuffle join (norms has one row
    per document — broadcasting it would be O(N_docs) driver state).

    Caches the scored-terms table for the call's lifetime (reclaimed by LRU
    or ``spark.catalog.clearCache()`` — see the package docstring).
    """
    scored = tf_idf(docs, text_col, id_col).select(
        F.col(id_col).alias("doc"), "term", "tfidf", "idf"
    )
    # persisted: reused 4x below (prefix, candidates, both dot sides).  The
    # cache lives until LRU eviction or spark.catalog.clearCache() — there is
    # no safe in-function unpersist point for a lazily returned DataFrame.
    scored.persist()

    # prefix selection on NORMALIZED squared mass, windowed per doc:
    # keep term iff (totsq - cumsq_before) >= t^2 * totsq  (FP slack so a
    # borderline term is kept, never dropped — losslessness over neatness)
    w_doc = Window.partitionBy("doc")
    w_before = (
        w_doc.orderBy(F.col("idf").desc(), F.col("term").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sq = F.col("tfidf") * F.col("tfidf")
    prefix = (
        scored.withColumn("__totsq", F.sum(sq).over(w_doc))
        .withColumn("__cumsq", F.coalesce(F.sum(sq).over(w_before), F.lit(0.0)))
        .where(
            (F.col("__totsq") - F.col("__cumsq"))
            >= F.lit(threshold * threshold) * F.col("__totsq") - F.lit(1e-9)
        )
        .select(F.col("doc").alias("a"), "term")
    )
    b_all = scored.select(F.col("doc").alias("b"), "term")
    cands = (
        prefix.join(b_all, "term")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )

    # exact dot over all shared terms, candidates only
    wa = scored.select(F.col("doc").alias("a"), "term", F.col("tfidf").alias("wa"))
    wb = scored.select(F.col("doc").alias("b"), "term", F.col("tfidf").alias("wb"))
    dots = (
        cands.join(wa, "a")
        .join(wb, ["b", "term"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    norms = scored.groupBy("doc").agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("norm")
    )
    na = norms.select(F.col("doc").alias("a"), F.col("norm").alias("na"))
    nb = norms.select(F.col("doc").alias("b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            "a", "b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """(doc_id, score) BM25 ranked retrieval for a bag of query terms
    (Robertson/Sparck Jones; the Lucene idf variant
    ln(1 + (N - df + 0.5) / (df + 0.5)), which keeps idf positive).

    Shuffle profile mirrors tf_idf: one explode->groupBy for tf, one
    aggregate for df and the average document length, then per-term
    contributions summed per doc.  The query-term filter is applied BEFORE
    the tf groupBy, so the shuffled rows are O(matching tokens), not
    O(corpus tokens); df/avgdl still come from the full corpus (the
    statistics BM25 is defined over).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    if n_docs is None:
        n_docs = docs.count()

    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = spread.select(
        F.col(id_col), _tokens(text_col).alias("__t")
    ).withColumn("__dl", F.size("__t"))
    avgdl = float(
        toks.agg(F.avg("__dl").alias("a")).first()["a"] or 0.0
    )
    if avgdl == 0.0:
        return docs.select(id_col).limit(0).withColumn(
            "score", F.lit(0.0)
        )

    exploded = toks.select(
        id_col, "__dl", F.explode("__t").alias("term")
    )
    # corpus-wide df for the query terms only (df of other terms is unused)
    dfreq = (
        exploded.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count_distinct(F.col(id_col)).cast("long").alias("df"))
    )
    tf = (
        exploded.where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    idf = dfreq.withColumn(
        "idf",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
    )
    contrib = tf.join(idf, "term").select(
        id_col,
        (
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.lit(avgdl))
            )
        ).alias("__c"),
    )
    return contrib.groupBy(id_col).agg(F.sum("__c").alias("score"))


def bm25_top_docs(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score (deterministic: score desc, id asc).

    Global top-k goes through ``orderBy().limit(k)`` — Spark plans it as
    TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
    NOT a single-partition global sort; the rank window then runs over the
    k surviving rows only.
    """
    scored = bm25_scores(docs, query_terms, k1, b, text_col, id_col)
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rn", F.row_number().over(w)).select(
        id_col, "score", F.col("rn").cast("int").alias("rn")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_col: str = "q",
    doc_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    top: int | None = None,
    round_scores: int = 6,
) -> DataFrame:
    """(query, doc, rrf): reciprocal-rank fusion of several per-query
    rankings (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard
    hybrid-retrieval combiner: rrf = sum over rankings of
    1 / (k + rank), summing only the rankings that returned the doc.
    Rank positions, not scores, carry the signal, so heterogeneous
    rankers (BM25 / dense ANN / different parameterizations) fuse
    without score normalization.

    Determinism: ranks order by (round(score, round_scores) DESC, doc)
    — rounding pins the order against last-bit float noise so any
    engine ranks identically (the same reason the gate hashes rounded
    scores).  Scale: one per-query window per ranking (partitioned by
    the query key, never global), a union, and one groupBy sum; ``top``
    keeps the k best fused docs per query via the same per-query
    window."""
    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = []
    for df in rankings:
        w = Window.partitionBy(query_col).orderBy(
            F.round(F.col(score_col), round_scores).desc(),
            F.col(doc_col).asc(),
        )
        parts.append(
            df.select(
                query_col, doc_col, F.row_number().over(w).alias("__r")
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(query_col, doc_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__r"))).alias("rrf")
    )
    if top is not None:
        w2 = Window.partitionBy(query_col).orderBy(
            F.col("rrf").desc(), F.col(doc_col).asc()
        )
        fused = (
            fused.withColumn("__n", F.row_number().over(w2))
            .where(F.col("__n") <= top)
            .drop("__n")
        )
    return fused
