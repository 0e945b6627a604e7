"""WARC source (sources/warc.py): record framing, record-gzip member
splitting, and the documents projection — against synthesized WARC bytes
built directly from the ISO 28500 framing rules."""

import gzip

import pytest


def _record(warc_type: str, uri: str, body: bytes, ctype="text/plain"):
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


BODIES = [
    (b"hello web page one with words", "http://a.example/1", "conversion"),
    (b"second page body here", "http://a.example/2", "conversion"),
    (b"\x89PNG fake image bytes", "http://a.example/img", "resource"),
]


def _warc_bytes():
    out = b""
    # a warcinfo record first, as real files have
    out += _record("warcinfo", "", b"software: synthetic\r\n",
                   ctype="application/warc-fields")
    for body, uri, wtype in BODIES:
        ctype = "text/plain" if wtype == "conversion" else "image/png"
        out += _record(wtype, uri, body, ctype=ctype)
    return out


def test_parse_warc_records_plain():
    from tsne_flink_spark.sources.warc import parse_warc_records

    recs = list(parse_warc_records(_warc_bytes()))
    assert len(recs) == 4
    offsets = [r[0] for r in recs]
    assert offsets == sorted(offsets) and offsets[0] == 0
    assert recs[1][1]["warc-type"] == "conversion"
    assert recs[1][2] == BODIES[0][0]
    assert recs[3][1]["warc-target-uri"] == "http://a.example/img"


def test_split_gzip_members():
    from tsne_flink_spark.sources.warc import _split_gzip_members

    members = [b"alpha", b"beta", b"gamma gamma"]
    blob = b"".join(gzip.compress(m) for m in members)
    assert list(_split_gzip_members(blob)) == members


@pytest.mark.parametrize("gz", [False, True])
def test_read_warc_end_to_end(spark, tmp_path, gz):
    from tsne_flink_spark.sources.warc import read_warc, warc_to_documents

    if gz:
        # record-gzipped: each record its own gzip member
        from tsne_flink_spark.sources.warc import parse_warc_records

        raw = _warc_bytes()
        members = []
        # re-frame each record into its own member
        prev = 0
        recs = list(parse_warc_records(raw))
        for i, (off, _, _) in enumerate(recs):
            end = recs[i + 1][0] if i + 1 < len(recs) else len(raw)
            members.append(gzip.compress(raw[off:end]))
        path = tmp_path / "x.warc.gz"
        path.write_bytes(b"".join(members))
    else:
        path = tmp_path / "x.warc"
        path.write_bytes(_warc_bytes())

    recs = read_warc(spark, str(path)).collect()
    assert len(recs) == 4
    types = sorted(r["warc_type"] for r in recs)
    assert types == ["conversion", "conversion", "resource", "warcinfo"]
    by_uri = {r["target_uri"]: r for r in recs}
    assert bytes(by_uri["http://a.example/1"]["payload"]) == BODIES[0][0]
    assert by_uri["http://a.example/1"]["n_bytes"] == len(BODIES[0][0])

    docs = warc_to_documents(read_warc(spark, str(path))).collect()
    texts = {r["url"]: r["text"] for r in docs}
    # only text/* conversion/response records become documents
    assert set(texts) == {"http://a.example/1", "http://a.example/2"}
    assert texts["http://a.example/1"] == "hello web page one with words"
    ids = [r["doc_id"] for r in docs]
    assert len(set(ids)) == 2  # deterministic distinct identities


def test_extract_links_and_domain_pagerank_chain(spark, tmp_path):
    """The full raw-web chain: WARC records -> documents -> href
    extraction -> domain edges -> PageRank.  The hub domain every page
    links to must outrank the leaves."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.operators.graph import pagerank
    from tsne_flink_spark.sources.warc import (
        extract_links,
        read_warc,
        warc_to_documents,
    )

    pages = [
        ("http://a.example/", b'<a href="http://hub.example/x">hub</a> '
                              b'<a href="http://b.example/y">b</a>'),
        ("http://b.example/", b"<A HREF='http://hub.example/z'>hub</A>"),
        ("http://c.example/", b'<a href="http://hub.example/">hub</a>'),
    ]
    out = b""
    for uri, body in pages:
        out += _record("response", uri, body, ctype="text/html")
    path = tmp_path / "links.warc"
    path.write_bytes(out)

    docs = warc_to_documents(read_warc(spark, str(path)))
    links = extract_links(docs.withColumnRenamed("doc_id", "doc_id"))
    assert links.count() == 4  # both quote styles, case-insensitive

    dom = F.regexp_extract(F.col("href"), r"https?://([^/]+)", 1)
    src_dom = F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    edges = (
        links.join(docs.select("doc_id", "url"), "doc_id")
        .select(src_dom.alias("a"), dom.alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    ranks = {
        r["id"]: r["rank"]
        for r in pagerank(edges, undirected=False, iters=10).collect()
    }
    assert ranks["hub.example"] == max(ranks.values())


def test_parse_warc_truncated_and_malformed():
    """Framing robustness: truncated payloads and non-WARC garbage stop
    the record walk cleanly instead of raising or looping."""
    from tsne_flink_spark.sources.warc import parse_warc_records

    good = _record("conversion", "http://x.example/", b"body words here")
    # truncated: header claims more bytes than present
    trunc = (
        "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 5000\r\n\r\n"
    ).encode() + b"short"
    recs = list(parse_warc_records(good + trunc))
    # the good record parses; the truncated one yields its partial payload
    assert len(recs) == 2
    assert recs[0][2] == b"body words here"
    assert recs[1][2] == b"short"
    # garbage prefix: not a WARC version line -> no records, no exception
    assert list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope")) == []
    # bad Content-Length value -> zero-length payload, walk continues
    bad_len = (
        "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: abc\r\n\r\n"
    ).encode() + b"\r\n\r\n" + good
    recs = list(parse_warc_records(bad_len))
    assert len(recs) == 2 and recs[1][2] == b"body words here"
