"""Corpus-trained bigram LM scoring (pipeline/lm.py) vs a pure-python
reference, plus the ranking property the CCNet signal exists for."""

import math

import pytest


def _py_scores(rows, k=0.5):
    toks = {i: t.lower().split() for i, t in rows if t.strip()}
    c2, c1 = {}, {}
    for t in toks.values():
        prev = "<s>"
        for w in t:
            c2[(prev, w)] = c2.get((prev, w), 0) + 1
            c1[prev] = c1.get(prev, 0) + 1
            prev = w
    vocab = len({w2 for (_, w2) in c2})
    out = {}
    for i, t in toks.items():
        lps = []
        prev = "<s>"
        for w in t:
            lps.append(
                math.log((c2[(prev, w)] + k) / (c1[prev] + k * vocab))
            )
            prev = w
        out[i] = (len(t), sum(lps) / len(lps))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox sleeps under the tall tree"),
        (2, "the lazy dog jumps over the quick fox"),
        (3, "zq xv qq zz vx pq qp zx"),  # garble: unseen-everywhere bigrams
        (4, "the quick brown fox"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_lm_scores_match_reference(spark, corpus):
    from tsne_flink_spark.pipeline.lm import ngram_lm_scores

    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    want = _py_scores(rows)
    got = {r["doc_id"]: r for r in ngram_lm_scores(corpus).collect()}
    assert set(got) == set(want)  # empty doc 5 excluded by both
    for i, (n, alp) in want.items():
        assert got[i]["n_tokens"] == n
        assert got[i]["avg_logprob"] == pytest.approx(alp, rel=1e-12)
        assert got[i]["perplexity"] == pytest.approx(math.exp(-alp), rel=1e-12)


def test_garble_sits_in_the_perplexity_tail(spark, corpus):
    from tsne_flink_spark.pipeline.lm import ngram_lm_scores

    ppl = {
        r["doc_id"]: r["perplexity"] for r in ngram_lm_scores(corpus).collect()
    }
    assert ppl[3] > max(ppl[i] for i in (0, 1, 2, 4))


def test_perplexity_buckets_are_threshold_consistent(spark, corpus):
    from tsne_flink_spark.pipeline.lm import perplexity_buckets

    rows = perplexity_buckets(corpus, n_buckets=3).collect()
    assert {r["bucket"] for r in rows} <= {0, 1, 2}
    # buckets respect the perplexity order: no lower-perplexity doc sits in
    # a higher bucket than a higher-perplexity doc
    by_ppl = sorted(rows, key=lambda r: r["perplexity"])
    buckets = [r["bucket"] for r in by_ppl]
    assert buckets == sorted(buckets)
    # the garbled doc lands in the top bucket
    assert next(r for r in rows if r["doc_id"] == 3)["bucket"] == max(buckets)


def test_interpolated_lm_ranks_fluency(spark):
    """Jelinek-Mercer interpolation must (a) keep per-doc probability
    mass sane (logp < 0), (b) rank a garbled doc above a fluent one in
    perplexity, and (c) differ from the pure add-k scores (it is a
    different model)."""
    from tsne_flink_spark.pipeline.lm import ngram_lm_scores

    fluent = "the quick brown fox jumps over the lazy dog " * 6
    # garble with BRANCHING transitions: under a self-trained JM model a
    # singleton transition scores lam regardless of word rarity (see the
    # ngram_lm_scores docstring), so the discriminative case needs w1
    # continuations that actually branch
    garble = "zq xv zq qq xv zz zq vx qq zq xv qq zz vx zq"
    docs = spark.createDataFrame(
        [(0, fluent), (1, garble), (2, fluent + " unique tail words")],
        "doc_id bigint, text string",
    )
    interp = {
        r["doc_id"]: r
        for r in ngram_lm_scores(docs, interpolation=0.7).collect()
    }
    addk = {
        r["doc_id"]: r for r in ngram_lm_scores(docs).collect()
    }
    assert all(r["avg_logprob"] < 0 for r in interp.values())
    assert interp[1]["perplexity"] > interp[0]["perplexity"]
    assert any(
        abs(interp[d]["avg_logprob"] - addk[d]["avg_logprob"]) > 1e-9
        for d in interp
    )


def test_perplexity_split_exact_matches_window_ntile(spark, corpus):
    """The rank-based exact split must equal a literal NTILE(3) window
    over (rounded perplexity, doc_id), and its bucket populations must
    be equal-count (+-1) regardless of value ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.lm import (
        ngram_lm_scores,
        perplexity_split_exact,
    )

    out = perplexity_split_exact(corpus, n_buckets=3)
    got = {r["doc_id"]: r["bucket"] for r in out.collect()}

    alp = F.round("avg_logprob", 6)
    scored = ngram_lm_scores(corpus).select(
        "doc_id", F.round(F.exp(-alp), 4).alias("perplexity")
    )
    w = Window.orderBy("perplexity", "doc_id")
    want = {
        r["doc_id"]: r["b"]
        for r in scored.select(
            "doc_id", (F.ntile(3).over(w) - 1).cast("long").alias("b")
        ).collect()
    }
    assert got == want

    from collections import Counter

    sizes = Counter(got.values())
    assert set(sizes) == {0, 1, 2}
    assert max(sizes.values()) - min(sizes.values()) <= 1

    # fluency ordering: every head doc is at most as perplexing as every
    # tail doc
    perp = {r["doc_id"]: r["perplexity"] for r in scored.collect()}
    assert max(perp[d] for d, b in got.items() if b == 0) <= min(
        perp[d] for d, b in got.items() if b == 2
    )
