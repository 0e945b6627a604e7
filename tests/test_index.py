"""Inverted index (sources/index.py): build/persist/serve roundtrip and
numerical identity of index-served BM25 with the direct scorer."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "a fast brown fox and a slow red dog"),
        (2, "window functions join streams and tables"),
        (3, "the window slides over the stream of events"),
        (4, ""),  # zero-token doc: must count in N and avgdl
        (5, "fox fox fox dog dog window"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_index_build_shapes(spark, corpus):
    from tsne_flink_spark.sources.index import build_inverted_index

    index, doclens = build_inverted_index(corpus)
    rows = {(r["term"], r["chunk"]): r for r in index.collect()}
    fox = rows[("fox", 0)]
    assert fox["df"] == 3  # docs 0, 1, 5
    posts = {p["doc_id"]: p["tf"] for p in fox["postings"]}
    assert posts == {0: 1, 1: 1, 5: 3}
    # postings sorted by doc_id
    assert [p["doc_id"] for p in fox["postings"]] == sorted(posts)
    dl = {r["doc_id"]: r["dl"] for r in doclens.collect()}
    assert dl[4] == 0 and dl[5] == 6 and len(dl) == 6


def test_index_chunking_bounds_postings_rows(spark, corpus):
    from tsne_flink_spark.sources.index import build_inverted_index

    index, _ = build_inverted_index(corpus, max_postings=2)
    fox = sorted(
        (r["chunk"], [p["doc_id"] for p in r["postings"]], r["df"])
        for r in index.where("term = 'fox'").collect()
    )
    # 3 postings split into chunks of <= 2, df repeated on every chunk
    assert fox == [(0, [0, 1], 3), (1, [5], 3)]


def test_bm25_from_index_equals_direct(spark, corpus):
    from tsne_flink_spark.pipeline.tfidf import bm25_scores
    from tsne_flink_spark.sources.index import (
        bm25_from_index,
        build_inverted_index,
    )

    index, doclens = build_inverted_index(corpus, max_postings=2)
    for terms in (["fox", "dog"], ["window"], ["the", "fox", "stream"]):
        direct = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(corpus, terms).collect()
        }
        served = {
            r["doc_id"]: r["score"]
            for r in bm25_from_index(index, doclens, terms).collect()
        }
        assert set(direct) == set(served), terms
        for d in direct:
            assert direct[d] == pytest.approx(served[d], rel=0, abs=1e-12)


def test_index_persist_roundtrip(spark, corpus, tmp_path):
    from tsne_flink_spark.sources.index import (
        bm25_from_index,
        build_inverted_index,
        read_inverted_index,
        write_inverted_index,
    )

    index, doclens = build_inverted_index(corpus)
    path = str(tmp_path / "idx")
    write_inverted_index(index, doclens, path)
    index2, doclens2 = read_inverted_index(spark, path)
    a = {
        r["doc_id"]: r["score"]
        for r in bm25_from_index(index, doclens, ["fox", "dog"]).collect()
    }
    b = {
        r["doc_id"]: r["score"]
        for r in bm25_from_index(index2, doclens2, ["fox", "dog"]).collect()
    }
    assert a.keys() == b.keys()
    for d in a:
        assert a[d] == pytest.approx(b[d], rel=0, abs=0)  # bit-identical
