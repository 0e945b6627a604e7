"""ExactSubstr dedup (pipeline/substr.py, Lee et al. 2022): duplicated
L-token spans are found corpus-wide and cut from every document."""

import pytest

DUP = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, f"intro A {DUP} outro A", "en"),
        (1, f"intro B something else {DUP} and trailing text here", "en"),
        (2, "totally unique document with no shared passage at all", "en"),
        (3, "short doc", "en"),
        (4, f"{DUP} {DUP} double trouble", "en"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_cross_doc_span_removed(spark, corpus):
    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    out = {r["doc_id"]: r for r in exact_substring_dedup(corpus, l=8).collect()}
    # the 13-token shared passage is cut from every carrier
    assert out[0]["text"] == "intro A outro A"
    assert out[0]["n_dup_spans"] == 1 and out[0]["tokens_removed"] == 13
    assert out[1]["text"] == "intro B something else and trailing text here"
    assert out[1]["tokens_removed"] == 13
    # untouched docs pass through (whitespace-normalized), zero stats
    assert out[2]["tokens_removed"] == 0 and out[2]["n_dup_spans"] == 0
    assert out[3]["text"] == "short doc"  # shorter than L: gram-free
    assert out[5]["text"] == "" and out[5]["tokens_removed"] == 0
    # extra columns survive
    assert out[0]["lang"] == "en"


def test_within_doc_repeat_merges_to_one_span(spark, corpus):
    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    out = {r["doc_id"]: r for r in exact_substring_dedup(corpus, l=8).collect()}
    # doc 4 holds the passage twice back-to-back: the hit intervals chain
    # (each hit within L of the next), so they merge into ONE 26-token span
    assert out[4]["text"] == "double trouble"
    assert out[4]["n_dup_spans"] == 1 and out[4]["tokens_removed"] == 26


def test_duplicated_grams_counts(spark, corpus):
    from tsne_flink_spark.pipeline.substr import duplicated_grams

    dup = duplicated_grams(corpus, l=8).collect()
    assert dup, "shared passage must produce duplicated grams"
    # 13-token passage -> 6 grams of 8; docs 0, 1 each carry all 6, doc 4
    # carries the doubled form; every duplicated gram occurs >= 2 times
    assert all(r["n_occurrences"] >= 2 for r in dup)
    # raising min_count above the occurrence ceiling empties the set
    assert not duplicated_grams(corpus, l=8, min_count=50).collect()


def test_min_count_gate(spark):
    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(0, f"one {shared} x"), (1, f"two {shared} y"), (2, f"three {shared} z")],
        "doc_id bigint, text string",
    )
    # appears 3 times: survives min_count=4, cut at min_count=3
    kept = exact_substring_dedup(docs, l=8, min_count=4).collect()
    assert all(r["tokens_removed"] == 0 for r in kept)
    cut = exact_substring_dedup(docs, l=8, min_count=3).collect()
    assert all(r["tokens_removed"] == 8 for r in cut)


def test_unicode_whitespace_tokenization_agrees(spark):
    """The gram stage tokenizes with Java \\s (ASCII-only); the cut stage
    must use the SAME rule.  A document whose duplicated passage follows a
    \\xa0 (NBSP — one Spark token 'intro\\xa0A', but two under Python
    str.split) would otherwise have its span indices shifted by one and cut
    the wrong tokens."""
    from tsne_flink_spark.pipeline.substr import exact_substring_dedup

    docs = spark.createDataFrame(
        [
            (0, f"intro\xa0A {DUP} outro", "en"),
            (1, f"intro B {DUP} trailer", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    out = {r["doc_id"]: r for r in exact_substring_dedup(docs, l=8).collect()}
    # NBSP stays inside the first token; the 13-token passage (Spark
    # positions 2..14) is cut exactly, leaving the ASCII-joined remainder
    assert out[0]["text"] == "intro\xa0A outro"
    assert out[0]["tokens_removed"] == 13 and out[0]["n_dup_spans"] == 1
    assert out[1]["text"] == "intro B trailer"
    assert out[1]["tokens_removed"] == 13


def test_cleaned_corpus_interior_grams_unique(spark, corpus):
    """Soundness property: an L-gram fully inside a KEPT region existed in
    the input and was not duplicated, so recomputing duplicated grams over
    the cleaned text finds duplicates only among grams that cross a cut
    boundary (none here: cuts land mid-doc in distinct contexts)."""
    from tsne_flink_spark.pipeline.substr import (
        duplicated_grams,
        exact_substring_dedup,
    )

    cleaned = exact_substring_dedup(corpus, l=8).select("doc_id", "text")
    assert not duplicated_grams(cleaned, l=8).collect()
