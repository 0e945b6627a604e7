"""DSIR importance-resampling operator (pipeline/dsir.py)."""

import math

import pytest
from pyspark.sql import functions as F

from tsne_flink_spark.pipeline.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_key,
    hashed_gram_buckets,
)


@pytest.fixture()
def corpus(spark):
    # target domain: English-looking text; candidates: one doc that looks
    # like the target, one alien doc, one single-token doc, one empty doc
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the dog and the fox are quick and brown", "en"),
        (3, "a quick brown dog jumps over a lazy fox", "xx"),
        (4, "zzz qqq vvv kkk www uuu jjj xxx yyy", "xx"),
        (5, "solo", "xx"),
        (6, "", "xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_single_token_doc_yields_only_its_unigram(spark, corpus):
    grams = hashed_gram_buckets(corpus.where("doc_id = 5"))
    # the sequence(1, 0) descending-trap guard: no phantom bigrams
    assert grams.count() == 1


def test_empty_doc_yields_no_grams(spark, corpus):
    assert hashed_gram_buckets(corpus.where("doc_id = 6")).count() == 0


def test_gram_count_is_2n_minus_1(spark, corpus):
    n = len("the quick brown fox jumps over the lazy dog".split())
    got = hashed_gram_buckets(corpus.where("doc_id = 1")).count()
    assert got == 2 * n - 1


def test_weights_score_only_candidates(spark, corpus):
    w = dsir_log_weights(corpus, target=F.col("lang") == "en")
    ids = {r["doc_id"] for r in w.collect()}
    assert ids == {3, 4, 5}  # no target docs, no empty doc


def test_target_like_candidate_outscores_alien(spark, corpus):
    w = {
        r["doc_id"]: r["avg_logw"]
        for r in dsir_log_weights(
            corpus, target=F.col("lang") == "en"
        ).collect()
    }
    # doc 3 shares most grams with the target domain; doc 4 shares none
    assert w[3] > w[4]
    assert all(map(math.isfinite, w.values()))


def test_select_is_deterministic_subset_topk(spark, corpus):
    w = dsir_log_weights(corpus, target=F.col("lang") == "en")
    a = [r["doc_id"] for r in dsir_select(w, k=2, seed=7).collect()]
    b = [r["doc_id"] for r in dsir_select(w, k=2, seed=7).collect()]
    assert a == b and len(a) == 2
    assert set(a) <= {3, 4, 5}
    c = [r["doc_id"] for r in dsir_select(w, k=3, seed=7).collect()]
    assert set(c) == {3, 4, 5}


def test_gumbel_key_varies_by_seed_and_id(spark):
    df = spark.range(200).select(
        gumbel_key(F.col("id"), 1).alias("g1"),
        gumbel_key(F.col("id"), 2).alias("g2"),
    )
    row = df.agg(
        F.countDistinct("g1").alias("d1"),
        F.sum((F.col("g1") == F.col("g2")).cast("int")).alias("same"),
        F.avg("g1").alias("mean"),
    ).collect()[0]
    assert row["d1"] == 200          # distinct draws per id
    assert row["same"] == 0          # seed changes every draw
    # Gumbel(0,1) mean is the Euler-Mascheroni constant ~0.5772
    assert abs(row["mean"] - 0.5772) < 0.35


def test_gumbel_top_k_tracks_weights(spark):
    """Sampling property: across many seeds, a doc with weight ln(9)
    above another must win the 1-slot sample ~90% of the time (softmax
    = 9:1 odds).  Deterministic given the fixed seed list."""
    rows = [(1, float(math.log(9.0))), (2, 0.0)]
    w = spark.createDataFrame(rows, "doc_id long, logw double")
    wins = 0
    trials = 60
    for seed in range(trials):
        top = dsir_select(w, k=1, seed=seed).collect()[0]["doc_id"]
        wins += top == 1
    assert 0.78 <= wins / trials <= 0.99, wins / trials
