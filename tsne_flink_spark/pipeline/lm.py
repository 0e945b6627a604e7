"""Corpus-trained n-gram language-model scoring (CCNet-style perplexity).

CCNet buckets documents by their perplexity under a pretrained KenLM —
low-perplexity text reads like the target distribution, high-perplexity
text is noise/boilerplate/garble.  No external model ships with this
repo, so the LM is trained on the corpus ITSELF in the same job: an
add-k-smoothed bigram model from one counting pass, then each document
scored by its average token log-probability.  Self-trained perplexity
keeps the ranking power (garbled docs sit in the tail of any LM fit to
the corpus) while staying fully deterministic and SQL-expressible, so
the operator carries an exact DuckDB oracle.

Model, defined identically in both engines:

- tokens: lowercased whitespace tokens; every document is prefixed with
  a BOS marker ``<s>``, giving len(tokens) prediction events per doc;
- counts: c2(w1, w2) over all bigram events, c1(w1) = sum_w2 c2(w1, w2),
  vocabulary V = |distinct predicted tokens w2|;
- logp(w2|w1) = ln((c2 + k) / (c1 + k·V)), add-k smoothing (k = 0.5);
- per doc: avg_logprob = mean event logp, perplexity = exp(-avg_logprob).

Shuffle profile: one explode -> groupBy(w1, w2) count with map-side
combine, one groupBy(w1) rollup of that (tiny), one join of the event
table back to the counts (AQE broadcasts the count tables when small;
a web-scale vocabulary shuffles on the bigram key), one groupBy(doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _bigram_events(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) — one prediction event per token, BOS-prefixed."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("__t"),
    ).withColumn("__n", F.size("__t"))
    spread = toks.where(F.col("__n") >= 1).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    ev = F.transform(
        F.sequence(F.lit(1), F.col("__n")),
        lambda j: F.struct(
            F.when(j == 1, F.lit(BOS))
            .otherwise(F.element_at("__t", (j - 1).cast("int")))
            .alias("w1"),
            F.element_at("__t", j.cast("int")).alias("w2"),
        ),
    )
    return spread.select(
        id_col, F.explode(ev).alias("__e")
    ).select(id_col, F.col("__e.w1").alias("w1"), F.col("__e.w2").alias("w2"))


def ngram_lm_scores(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    interpolation: float | None = None,
) -> DataFrame:
    """(id, n_tokens, avg_logprob, perplexity) for every document with at
    least one token, under the corpus-trained bigram LM.

    ``interpolation=None`` (default): pure add-k bigram,
    logp = ln((c2 + k) / (c1 + k*V)).

    ``interpolation=lambda`` in (0, 1): Jelinek-Mercer interpolation with
    an add-k unigram base — logp = ln(lam * c2/c1
    + (1-lam) * (u(w2) + k) / (T + k*V)) where u is the predicted-token
    unigram count and T the total event count.  The standard smoothing
    upgrade: rare-continuation events are judged against the unigram
    distribution instead of a uniform k-mass.  Self-training caveat
    (inherent to JM, not this implementation): a SINGLETON transition
    (c2 = c1 = 1) scores lam regardless of how rare its words are, so a
    short garbled doc with all-unique bigrams can out-score fluent text
    when the LM is fit on the scored corpus itself — the add-k variant's
    uniform k*V floor is the sharper self-trained tail detector, which
    is why it stays the default and the curate CLI's tail cut uses it.
    Both variants are deterministic and carry exact DuckDB oracles."""
    from tsne_flink_spark.operators.optimize import materialize

    events = _bigram_events(docs, text_col, id_col)
    # materialize the bigram counts: the vocab count below and the final
    # scoring plan (two joins) would each otherwise re-run the full
    # tokenize -> explode -> groupBy aggregation over the corpus
    c2 = materialize(
        events.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).cast("double").alias("c2")
        )
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = float(c2.select("w2").distinct().count())
    scored = events.join(c2, ["w1", "w2"]).join(c1, "w1")
    if interpolation is None:
        logp = F.log(
            (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k * vocab))
        )
    else:
        lam = float(interpolation)
        if not 0.0 < lam < 1.0:
            raise ValueError(f"interpolation must be in (0, 1): {lam}")
        uni = c2.groupBy("w2").agg(F.sum("c2").alias("u"))
        total = float(
            c2.agg(F.sum("c2").alias("t")).first()["t"] or 0.0
        )
        scored = scored.join(uni, "w2")
        logp = F.log(
            F.lit(lam) * F.col("c2") / F.col("c1")
            + F.lit(1.0 - lam)
            * (F.col("u") + F.lit(k))
            / F.lit(total + k * vocab)
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(logp).alias("avg_logprob"),
        )
        .select(
            id_col,
            "n_tokens",
            "avg_logprob",
            F.exp(-F.col("avg_logprob")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail split: documents bucketed by perplexity
    (bucket 0 = lowest perplexity = most fluent).  Boundaries come from
    ``percentile_approx`` (Greenwald-Khanna, rank error N/accuracy) and
    each doc is bucketed by threshold comparison — no global sort, no
    single-partition window; exactly how CCNet applies its head/middle/
    tail cutoffs."""
    scored = ngram_lm_scores(docs, k, text_col, id_col)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.agg(
        F.percentile_approx("perplexity", qs, 10000).alias("c")
    ).first()["c"]
    if cuts is None:  # zero scored docs: percentile over empty is NULL
        return scored.withColumn("bucket", F.lit(0))
    bucket = F.lit(0)
    for c in cuts:
        bucket = bucket + (F.col("perplexity") > F.lit(float(c))).cast("int")
    return scored.withColumn("bucket", bucket.cast("int"))


def perplexity_split_exact(
    docs: DataFrame,
    n_buckets: int = 3,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic-boundary variant of :func:`perplexity_buckets`:
    equal-count tertiles by exact global rank (SQL ``NTILE`` semantics
    over (rounded perplexity, id)) instead of GK-sketch thresholds.

    Two deliberate differences from the CCNet-style default make this
    one exactly replayable by a SQL oracle on any engine:

    - perplexity is ROUNDED (avg_logprob to 6 decimals, then exp,
      then 4 decimals — the same convention as the lm_perplexity
      gate query) before ordering, and ties break on ``id_col``, so
      the total order contains no cross-engine float ambiguity — a
      threshold comparison against an interpolated percentile
      boundary would hinge on the boundary's last bits;
    - the split is by exact rank, not by value threshold, so bucket
      populations are fixed (±1) regardless of value ties at the
      cut.

    Scale: the rank is the shuffle-parallel ``_global_rank_by``
    (range shuffle + partition-offset arithmetic) and the bucket is
    ``ntile_from_rank`` arithmetic — no single-partition window, no
    value collection; one extra count() job for N.  Buckets are
    0-based (0 = head = most fluent), matching the default variant.
    """
    from tsne_flink_spark.operators.knn import _global_rank_by, ntile_from_rank

    from tsne_flink_spark.operators.optimize import materialize

    alp = F.round("avg_logprob", 6)
    scored = ngram_lm_scores(docs, k, text_col, id_col).select(
        id_col,
        "n_tokens",
        alp.alias("avg_logprob"),
        F.round(F.exp(-alp), 4).alias("perplexity"),
    )
    # Materialize once: count() below would otherwise execute the full
    # shuffle-heavy LM-scoring plan, and _global_rank_by would execute it
    # a second time.  The pinned result is reused by both.
    scored = materialize(scored)
    n = scored.count()
    if n == 0:
        return scored.withColumn("bucket", F.lit(0).cast("long"))
    ranked = _global_rank_by(scored, F.col("perplexity").asc(), id_col)
    return ranked.select(
        id_col,
        "n_tokens",
        "avg_logprob",
        "perplexity",
        (ntile_from_rank(F.col("__rank"), n, n_buckets) - 1).alias("bucket"),
    )
