"""DSIR — Data Selection via Importance Resampling (Xie et al., 2023).

Selects pretraining data that "reads like" a small target domain: fit
bag-of-hashed-n-gram unigram distributions p (target docs) and q (raw
candidate docs), weight every candidate by its log importance ratio
log p(doc) - log q(doc) under those distributions, then resample
candidates with Gumbel-top-k on the weights.  The hashing makes the
feature space BOUNDED (``n_buckets`` rows per distribution) no matter
how large the corpus vocabulary grows — the property that lets the
method run at pretraining scale.

Model, defined identically here and in the DuckDB oracles:

- tokens: lowercased whitespace tokens (the repo's corpus tokenizer,
  same as pipeline/lm.py);
- grams: unigrams plus space-joined bigrams, each hashed to
  ``bucket = int(md5(gram)[:15 hex], 16) % n_buckets``;
- distributions: add-alpha smoothed bucket frequencies,
  p(b) = (tc_b + alpha) / (T_t + alpha * B) from the target docs and
  q(b) likewise from the candidate docs;
- per candidate doc: logw = sum over gram OCCURRENCES of
  ln p(b) - ln q(b)  (the log importance ratio of the doc's gram bag),
  plus the length-normalized avg_logw;
- resampling: Gumbel-top-k — score = logw - ln(-ln(u)) with the
  deterministic uniform u = (int(md5(seed || ':' || doc_id)[:15 hex],
  16) + 1) / (2^60 + 1), so the "random" draw replays exactly in SQL.

Shuffle profile (the 100-TB story): one explode -> groupBy(bucket)
count per distribution — both outputs BOUNDED at ``n_buckets`` rows, so
they broadcast regardless of corpus size; scoring is the gram explode
joined to the two broadcast count tables and a groupBy(doc).  No
unbounded-key shuffle anywhere; Gumbel-top-k is a global sort of one
row per candidate doc, capped by k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: fits a signed BIGINT in both engines
_HEX_CHARS = 15
_HEX_SPAN = float(16**_HEX_CHARS)


def _hash60(col) -> "F.Column":
    """First 60 md5 bits of a string column as a non-negative BIGINT —
    the cross-engine hash shared with the DuckDB oracles
    (CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_CHARS), 16, 10).cast(
        "long"
    )


def hashed_gram_buckets(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket) — ONE ROW PER GRAM OCCURRENCE (unigrams + bigrams),
    hashed into ``n_buckets``.  Narrow map + explode; no shuffle."""
    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != F.lit(""),
        ).alias("__t"),
    ).withColumn("__n", F.size("__t"))
    # guard n == 1: sequence(1, 0) in Spark is the DESCENDING [1, 0],
    # not empty — it would fabricate bigrams for single-token docs
    bigrams = F.when(
        F.col("__n") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.col("__n") - 1),
            lambda j: F.concat_ws(
                " ",
                F.element_at("__t", j.cast("int")),
                F.element_at("__t", (j + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("__t"), bigrams)
    return (
        toks.where(F.col("__n") >= 1)
        .select(id_col, F.explode(grams).alias("__g"))
        .select(
            id_col,
            (_hash60(F.col("__g")) % F.lit(n_buckets)).alias("bucket"),
        )
    )


def _bucket_counts(grams: DataFrame) -> DataFrame:
    """(bucket, cnt) — bounded at n_buckets rows, map-side combinable."""
    return grams.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )


def dsir_log_weights(
    docs: DataFrame,
    target: "F.Column",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_grams, logw, avg_logw) for every CANDIDATE doc (rows where
    ``target`` is false) with at least one token.

    ``target`` is a boolean Column splitting the input into the target
    domain (defines p) and the candidate pool (defines q and gets
    scored).  Both count tables are bounded at ``n_buckets`` rows and
    explicitly broadcast — at 100 TB this is two scans, two bounded
    aggregates, and one narrow scoring pass."""
    flagged = docs.withColumn("__is_target", target)
    grams = hashed_gram_buckets(
        flagged, n_buckets=n_buckets, text_col=text_col, id_col=id_col
    ).join(
        flagged.select(id_col, "__is_target"), id_col
    )
    tc = _bucket_counts(grams.where(F.col("__is_target"))).withColumnRenamed(
        "cnt", "tc"
    )
    rc = _bucket_counts(grams.where(~F.col("__is_target"))).withColumnRenamed(
        "cnt", "rc"
    )
    t_tot = tc.agg(F.sum("tc").alias("t_tot"))
    r_tot = rc.agg(F.sum("rc").alias("r_tot"))
    cand = grams.where(~F.col("__is_target")).select(id_col, "bucket")
    scored = (
        cand.join(F.broadcast(tc), "bucket", "left")
        .join(F.broadcast(rc), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            id_col,
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0.0)) + F.lit(alpha))
                    / (F.col("t_tot") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("rc"), F.lit(0.0)) + F.lit(alpha))
                    / (F.col("r_tot") + F.lit(alpha * n_buckets))
                )
            ).alias("__lw"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("__lw").alias("logw"),
        F.avg("__lw").alias("avg_logw"),
    )


def gumbel_key(id_col, seed: int) -> "F.Column":
    """Deterministic Gumbel(0,1) draw per id: -ln(-ln(u)) with
    u = (hash60(seed || ':' || id) + 1) / (2^60 + 1) in (0, 1) —
    replayable in SQL, stable across partitionings and retries (a
    rand()-based draw is neither)."""
    u = (
        _hash60(F.concat_ws(":", F.lit(str(seed)), id_col.cast("string")))
        + F.lit(1)
    ) / F.lit(_HEX_SPAN + 1.0)
    return -F.log(-F.log(u))


def dsir_select(
    weights: DataFrame,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    weight_col: str = "logw",
) -> DataFrame:
    """Gumbel-top-k resampling over the importance weights: taking the k
    largest ``logw + Gumbel`` draws IS sampling k docs without
    replacement with probability proportional to exp(logw) — softmax
    sampling as one distributed sort, no sequential draws, no rejection
    loop.  Deterministic via ``gumbel_key``.  Returns (id, logw,
    gumbel_score) — the k selected docs."""
    scored = weights.select(
        id_col,
        weight_col,
        (F.col(weight_col) + gumbel_key(F.col(id_col), seed)).alias(
            "gumbel_score"
        ),
    )
    return scored.orderBy(
        F.col("gumbel_score").desc(), F.col(id_col).asc()
    ).limit(k)
