"""BM25 ranked retrieval (pipeline/tfidf.py) vs a pure-python reference."""

import math

import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark join window join join stream data"),
        (1, "window window window table scan"),
        (2, "stream stream join merge sort"),
        (3, "totally unrelated words about nothing here"),
        (4, "join"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for t in toks.values() if term in t)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(t) / avgdl)
            scores[i] = scores.get(i, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_scores_match_reference(spark, corpus):
    from tsne_flink_spark.pipeline.tfidf import bm25_scores

    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    terms = ["join", "window", "stream"]
    want = _py_bm25(rows, terms)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(corpus, terms).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-12)


def test_bm25_top_docs_order(spark, corpus):
    from tsne_flink_spark.pipeline.tfidf import bm25_top_docs

    rows = [(r["doc_id"], r["text"]) for r in corpus.collect()]
    terms = ["join", "window", "stream"]
    want = _py_bm25(rows, terms)
    order = sorted(want, key=lambda i: (-want[i], i))
    got = bm25_top_docs(corpus, terms, k=3).collect()
    assert [r["doc_id"] for r in got] == order[:3]
    assert [r["rn"] for r in got] == [1, 2, 3]


def test_bm25_rare_term_outscores_common(spark):
    """idf does its job: a doc matching a rare term beats a doc matching a
    corpus-wide term, at equal tf and length."""
    from tsne_flink_spark.pipeline.tfidf import bm25_scores

    docs = spark.createDataFrame(
        [(0, "rareword filler filler"), (1, "common filler filler")]
        + [(i, "common pad pad") for i in range(2, 12)],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, ["rareword", "common"]).collect()
    }
    assert got[0] > got[1]


def test_bm25_empty_query_rejected(spark, corpus):
    from tsne_flink_spark.pipeline.tfidf import bm25_scores

    with pytest.raises(ValueError):
        bm25_scores(corpus, [])


def test_rrf_fuse_combines_rankings(spark):
    """RRF arithmetic on handcrafted rankings: doc ranked high by both
    rankers beats one ranked top by only one; docs missing from a
    ranking sum only the present terms; top cut respects ties."""
    from tsne_flink_spark.pipeline.tfidf import rrf_fuse

    r1 = spark.createDataFrame(
        [(0, 10, 5.0), (0, 11, 4.0), (0, 12, 3.0)],
        "q int, doc_id bigint, score double",
    )
    r2 = spark.createDataFrame(
        [(0, 10, 2.0), (0, 12, 9.0)],
        "q int, doc_id bigint, score double",
    )
    got = {
        r["doc_id"]: r["rrf"]
        for r in rrf_fuse([r1, r2], top=3).collect()
    }
    # r1 ranks: 10->1, 11->2, 12->3; r2 ranks: 12->1, 10->2
    assert got[10] == pytest.approx(1 / 61 + 1 / 62)
    assert got[12] == pytest.approx(1 / 63 + 1 / 61)
    assert got[11] == pytest.approx(1 / 62)
    assert got[10] > got[12] > got[11]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([])
