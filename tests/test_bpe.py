"""BPE tokenizer training/application (pipeline/bpe.py) vs the published
algorithm's behavior on the classic example, plus round-trip invariants."""

import pytest

from tsne_flink_spark.pipeline.bpe import (
    EOW,
    encode_word,
    train_bpe,
)


def test_train_bpe_classic_example():
    """Sennrich et al.'s worked example: {low, lower, newest, widest}.
    The first merges must assemble the frequent 'est'+EOW suffix."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(wf, n_merges=10)
    assert merges[0] == ("e", "s")     # 9 occurrences, wins count then lexic.
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    # with only the suffix merges applied, trained AND unseen words end in
    # the assembled 'est'+EOW unit; with the full table, trained words
    # collapse to single tokens
    ranks3 = {p: i for i, p in enumerate(merges[:3])}
    assert encode_word("newest", ranks3)[-1] == "est" + EOW
    assert encode_word("lowest", ranks3)[-1] == "est" + EOW  # generalizes
    full = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", full) == ["newest" + EOW]


def test_encode_word_roundtrip_and_unknowns():
    wf = [("abab", 4), ("abc", 3)]
    merges = train_bpe(wf, n_merges=5)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("abab", "abc", "zzz", "a", ""):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
    # unseen characters fall back to single symbols
    assert len(encode_word("zzz", ranks)) >= 2


def test_train_bpe_deterministic_ties():
    wf = [("ab", 2), ("cd", 2)]
    m1 = train_bpe(wf, n_merges=2)
    m2 = train_bpe(list(reversed(wf)), n_merges=2)
    assert m1 == m2  # lexicographic tie-break, input-order independent


def test_bpe_end_to_end_spark(spark):
    from tsne_flink_spark.pipeline.bpe import (
        bpe_tokenize,
        word_frequencies,
    )

    rows = [
        (0, "the lowest tower in the lower town"),
        (1, "the newest and widest tower of the west"),
        (2, "low lower lowest newest widest"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    wf = word_frequencies(docs)
    assert wf[0] == ("the", 4)  # ordered by (-count, word)
    merges = train_bpe(wf, n_merges=30)
    out = {
        r["doc_id"]: r
        for r in bpe_tokenize(docs, merges, with_detok=True).collect()
    }
    for i, text in rows:
        norm = " ".join(text.lower().split())
        assert out[i]["detok"] == norm          # lossless round-trip
        assert out[i]["n_words"] == (len(norm.split()) if norm else 0)
        assert out[i]["n_tokens"] >= out[i]["n_words"]
    # merges compress: fewer tokens than characters for the trained words
    assert out[2]["n_tokens"] < len("low lower lowest newest widest")


def test_eow_sentinel_cannot_alias():
    """EOW must be a character no whitespace-split token can contain, so a
    literal '</w>' (the classic marker) in input text cannot corrupt
    detokenization."""
    assert EOW not in "foo</w>bar"  # the historical failure mode
    import re

    assert re.fullmatch(r"[ \t\n\x0b\f\r]+", EOW)


def test_bpe_spark_unicode_ws_and_eow_literal(spark):
    """Round-trip survives (a) a literal '</w>' inside a token and (b)
    Unicode whitespace (NBSP), which Spark's \\s+ split treats as a
    token character — the Python application side must agree."""
    from tsne_flink_spark.pipeline.bpe import (
        bpe_tokenize,
        word_frequencies,
    )

    rows = [
        (0, "see foo</w>bar and foo</w>bar again"),
        (1, "nb\xa0sp nb\xa0sp plain words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = train_bpe(word_frequencies(docs), n_merges=20)
    out = {
        r["doc_id"]: r
        for r in bpe_tokenize(docs, merges, with_detok=True).collect()
    }
    assert out[0]["detok"] == "see foo</w>bar and foo</w>bar again"
    # NBSP is NOT a separator under the Java \s rule: 'nb\xa0sp' is one
    # word on both the training and application sides
    assert out[1]["detok"] == "nb\xa0sp nb\xa0sp plain words here"
    assert out[1]["n_words"] == 5
