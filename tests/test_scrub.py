"""Unit tests for pipeline/scrub.py and pipeline/semantic.py on crafted
inputs with hand-computable expected values (the sf-scale DuckDB parity is
covered by the oracle gate; these pin the semantics)."""

import pytest
from pyspark.sql import functions as F

from tsne_flink_spark.pipeline.scrub import (
    bigram_stats,
    pii_stats,
    remove_boilerplate_lines,
    url_domain_stats,
)
from tsne_flink_spark.pipeline.semantic import (
    semantic_dedup,
    semantic_dedup_invariants,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_counts_and_redaction(spark):
    docs = _docs(spark, [
        (1, "write to a.b-c@sub.example.org or ops@example.io today"),
        (2, "call +1-555-0199 or 212-555-0000; host 10.1.2.3 and 255.255.255.0"),
        (3, "nothing sensitive here"),
    ])
    out = {r["doc_id"]: r for r in pii_stats(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 2, 2)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)
    # redaction replaces every hit: no raw entity survives in doc 2's length
    red2 = "call <PHONE> or <PHONE>; host <IP> and <IP>"
    assert out[2]["redacted_len"] == len(red2)


def test_url_domain_stats_groups_by_domain(spark):
    docs = _docs(spark, [
        (1, "see https://a.example.com/x and https://a.example.com/y end"),
        (2, "also http://b.example.net/z and https://a.example.com/q end"),
    ])
    out = {r["domain"]: r for r in url_domain_stats(docs).collect()}
    assert out["a.example.com"]["n_urls"] == 3
    assert out["a.example.com"]["n_docs"] == 2
    assert out["b.example.net"]["n_urls"] == 1


def test_boilerplate_lines_removed_by_document_frequency(spark):
    docs = _docs(spark, [
        (1, "FOOTER\nunique one"),
        (2, "FOOTER\nunique two"),
        (3, "FOOTER\nunique three"),
        (4, "no footer here"),
    ])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (2, 1)
    assert (out[4]["n_lines"], out[4]["n_removed"]) == (1, 0)
    # reassembly fingerprints: identical retained text -> need distinct
    # uniques, so all four fingerprints differ
    assert len({r["kept_fp"] for r in out.values()}) == 4


def test_bigram_stats_counts_and_tiebreak(spark):
    docs = _docs(spark, [
        (1, "a b a b"),      # "a b" x2, "b a" x1
        (2, "a b"),           # "a b" x1
        (3, "solo"),          # no bigrams
        (4, ""),              # no bigrams
    ])
    rows = bigram_stats(docs, k=10).collect()
    assert [(r["bigram"], r["n"]) for r in rows] == [("a b", 3), ("b a", 1)]


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_kills_exact_copies(spark):
    # two duplicate families (identical vectors -> cosine 1 -> same argmax
    # centroid) plus isolated vectors
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 1.0]),
        (6, [0.7, 0.7, 0.1]),
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb(spark, rows), threshold=0.999, n_clusters=4
        ).collect()
    }
    assert out[1]["keep"] == 1 and out[2]["keep"] == 0
    assert out[2]["group_id"] == 1
    assert out[3]["keep"] == 1 and out[4]["keep"] == 0
    assert out[5]["keep"] == 1 and out[6]["keep"] == 1


def test_semantic_dedup_invariants_zero(spark):
    rows = [(i, [float(i % 5 == j) for j in range(5)]) for i in range(20)]
    row = semantic_dedup_invariants(
        _emb(spark, rows), threshold=0.999, n_clusters=4
    ).head()
    assert (row["bad_killed"], row["bad_pairs"], row["bad_groups"]) == (0, 0, 0)


def test_scrub_ops_streaming(spark, tmp_path):
    """The scrub suite runs on Structured Streaming sources: pii_stats is a
    stateless narrow map (append mode); url_domain_stats is a streaming agg
    (complete mode); boilerplate removal joins a STATIC frequent-line set
    computed by a batch pass (stream-static join + per-doc agg)."""
    from tsne_flink_spark.pipeline.scrub import (
        boilerplate_line_set,
        pii_stats,
        remove_boilerplate_lines,
        url_domain_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "FOOTER\nmail me at a@b.example.com via https://x.example.com/p"),
            (2, "FOOTER\ncall 212-555-0000 see https://x.example.com/q"),
            (3, "FOOTER\nhost 10.0.0.1 and https://y.example.net/r"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs_parquet")
    docs.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)

    def run(df, name, mode):
        assert df.isStreaming
        q = (
            df.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r["doc_id"]: r for r in spark.sql(f"select * from {name}").collect()}

    pii = run(pii_stats(stream), "pii_stream", "append")
    assert pii[1]["n_emails"] == 1 and pii[2]["n_phones"] == 1
    assert pii[3]["n_ips"] == 1

    # exact distinct aggregates are rejected on streams; the documented
    # streaming/scale form uses the HLL sketch (exact at these tiny counts)
    doms = run(
        url_domain_stats(stream, exact=False)
        .withColumnRenamed("domain", "doc_id"),
        "dom_stream", "complete",
    )
    assert doms["x.example.com"]["n_urls"] == 2
    assert doms["y.example.net"]["n_docs"] == 1

    static_frequent = boilerplate_line_set(docs, min_docs=3)
    scrubbed = run(
        remove_boilerplate_lines(stream, frequent=static_frequent),
        "boiler_stream", "complete",
    )
    assert all(scrubbed[i]["n_removed"] == 1 for i in (1, 2, 3))
    # streaming output matches the batch run with the same frequent set
    batch = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(docs, frequent=static_frequent).collect()
    }
    assert {i: scrubbed[i]["kept_fp"] for i in batch} == {
        i: batch[i]["kept_fp"] for i in batch
    }


def test_incremental_dedup_batch_and_streaming(spark, tmp_path):
    """Batch-vs-index dedup: annotation statuses on crafted docs, and the
    streaming keep path (stream-static index join + stateful in-batch
    dropDuplicates) surviving the same fingerprints as the batch path."""
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate,
        incremental_dedup_keep,
    )

    ref = spark.createDataFrame(
        [(100, "seen before")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "Seen   BEFORE"),    # normalizes to the ref text -> ref_dup
            (2, "brand new one"),
            (3, "brand  NEW one"),   # batch dup of 2
            (4, "another fresh"),
        ],
        "doc_id long, text string",
    )
    index = fingerprint_index(ref)
    ann = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate(batch, index).collect()
    }
    assert ann == {1: "ref_dup", 2: "kept", 3: "batch_dup", 4: "kept"}

    kept = incremental_dedup_keep(batch, index)
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}

    path = str(tmp_path / "batch_parquet")
    batch.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    out = incremental_dedup_keep(stream, index)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("inc_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from inc_dedup").collect()
    # stream survivor per family is arrival-order, so compare fingerprint
    # SETS (normalized text), not row ids
    norm = lambda t: " ".join(t.lower().split())  # noqa: E731
    assert {norm(r["text"]) for r in got} == {"brand new one", "another fresh"}
    assert len(got) == 2


def test_scrub_ops_on_empty_corpus(spark):
    """Zero-row inputs flow through every round-6 operator without error
    (the guard the driver's empty-partition edge cases hit first)."""
    from tsne_flink_spark.pipeline.curation import mixture_weights
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate,
    )
    from tsne_flink_spark.pipeline.profile import profile_table
    from tsne_flink_spark.pipeline.semantic import semantic_dedup

    empty_docs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert pii_stats(empty_docs).count() == 0
    assert url_domain_stats(empty_docs).count() == 0
    assert remove_boilerplate_lines(empty_docs).count() == 0
    assert bigram_stats(empty_docs).count() == 0
    assert mixture_weights(empty_docs).count() == 0
    assert incremental_dedup_annotate(
        empty_docs, fingerprint_index(empty_docs)
    ).count() == 0
    # profile of an empty table still emits one row per column with zeros
    prof = {r["column"]: r for r in profile_table(empty_docs).collect()}
    assert prof["text"]["n_rows"] == 0 and prof["text"]["n_distinct"] == 0

    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semantic_dedup(empty_emb).count() == 0


def test_token_histogram_buckets(spark):
    from tsne_flink_spark.pipeline.text import token_histogram

    docs = _docs(spark, [
        (1, ""),                 # 0 tokens -> bucket 0
        (2, "one"),               # 1 token  -> bucket 1 (bin '1')
        (3, "a b c"),             # 3 tokens -> bucket 2 ('11')
        (4, "a b c d"),           # 4 tokens -> bucket 3 ('100')
        (5, "a b c d e f g h"),   # 8 tokens -> bucket 4 ('1000')
    ])
    out = {r["bucket"]: r for r in token_histogram(docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[2]["n_docs"] == 1 and out[2]["total_tokens"] == 3
    assert out[4]["min_tokens"] == out[4]["max_tokens"] == 8


def test_source_overlap_matrix(spark):
    """Cross-source fingerprint sharing: off-diagonal pairs count texts
    present in both sources; diagonal counts each source's distinct texts."""
    import sys
    sys.path.insert(0, ".")
    from __spark_entry__ import q_source_overlap

    docs = spark.createDataFrame(
        [
            (1, "shared text", "en", "web"),
            (2, "Shared   TEXT", "en", "books"),   # same normalized text
            (3, "only web", "en", "web"),
            (4, "only books", "en", "books"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    import tempfile, os
    d = tempfile.mkdtemp()
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["src_a"], r["src_b"]): r["shared_fps"]
        for r in q_source_overlap(spark, d).collect()
    }
    assert out[("books", "web")] == 1     # the shared normalized text
    assert out[("web", "web")] == 2       # web's two distinct texts
    assert out[("books", "books")] == 2


def test_canonical_url_rules(spark):
    from tsne_flink_spark.pipeline.scrub import canonical_url

    cases = [
        ("https://WWW.Example.ORG/Path/To#frag", "example.org/Path/To"),
        ("http://example.org/Path/To/", "example.org/Path/To"),
        ("https://example.org", "example.org"),
        ("http://www.example.org///", "example.org"),
        ("https://cdn3.example.net/x?q=1", "cdn3.example.net/x?q=1"),
        ("http://wwwx.example.net/a", "wwwx.example.net/a"),  # not 'www.'
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_stats_collapses_variants(spark):
    from tsne_flink_spark.pipeline.scrub import url_dedup_stats

    docs = spark.createDataFrame(
        [
            (1, "a https://www.example.org/p/1 b"),
            (2, "c http://example.org/p/1/ d"),
            (3, "e HTTPS://EXAMPLE.ORG/p/1#x f".lower()),
            (4, "g https://example.org/p/2 h"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["canonical_url"]: r for r in url_dedup_stats(docs).collect()}
    assert rows["example.org/p/1"]["n_urls"] == 3
    assert rows["example.org/p/1"]["n_docs"] == 3
    assert rows["example.org/p/1"]["first_doc"] == 1
    assert rows["example.org/p/2"]["n_docs"] == 1


def test_normalize_unicode_collapses_decomposed_forms(spark):
    from tsne_flink_spark.pipeline.scrub import normalize_unicode

    decomposed = "café"       # e + combining acute
    precomposed = "café"       # precomposed e-acute
    assert decomposed != precomposed
    docs = spark.createDataFrame(
        [(1, decomposed, "en"), (2, precomposed, "en"), (3, None, "en")],
        "doc_id bigint, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in normalize_unicode(docs).collect()}
    assert rows[1]["text"] == rows[2]["text"] == precomposed
    assert rows[3]["text"] == ""          # NULL-safe
    assert rows[1]["lang"] == "en"        # other columns untouched
    # NFD goes the other way
    nfd = {r["doc_id"]: r["text"]
           for r in normalize_unicode(docs, form="NFD").collect()}
    assert nfd[1] == nfd[2] == decomposed


def test_bloom_dedup_matches_exact_annotate(spark):
    """The Bloom-prefilter incremental dedup is OUTPUT-IDENTICAL to the
    plain fingerprint-join annotate — the docstring's testable claim — on a
    batch mixing ref dups, in-batch dups, and fresh rows."""
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate,
        incremental_dedup_annotate_bloom,
    )

    ref = spark.createDataFrame(
        [(100 + i, f"historical doc {i}") for i in range(30)],
        "doc_id long, text string",
    )
    rows = []
    for i in range(40):
        if i % 5 == 0:
            rows.append((i, f"Historical   DOC {i % 30}"))  # ref_dup
        elif i % 5 == 1:
            rows.append((i, "fresh shared text"))  # batch-dup family
        else:
            rows.append((i, f"unique fresh text {i}"))
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    index = fingerprint_index(ref)

    exact = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate(batch, index).collect()
    }
    bloom = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(batch, index).collect()
    }
    assert bloom == exact
    assert set(exact.values()) == {"ref_dup", "batch_dup", "kept"}


def test_bloom_dedup_forced_false_positives(spark):
    """expected=1 forces the minimum 64-bit bitmap with ~44 hashes; a
    30-key index saturates it, so every batch row is a Bloom 'maybe' —
    the exact confirm join must kill every false positive."""
    from tsne_flink_spark.pipeline.dedup import (
        build_fingerprint_bloom,
        fingerprint_index,
        incremental_dedup_annotate,
        incremental_dedup_annotate_bloom,
    )

    ref = spark.createDataFrame(
        [(100 + i, f"historical doc {i}") for i in range(30)],
        "doc_id long, text string",
    )
    index = fingerprint_index(ref)
    bitmap, m, k = build_fingerprint_bloom(index, fpp=0.5, expected=1)
    assert m == 64
    # the tiny filter must be (near-)saturated for the test to bite
    import numpy as np

    assert np.unpackbits(bitmap).sum() >= 48

    batch = spark.createDataFrame(
        [(i, f"never seen before {i}") for i in range(50)]
        + [(1000, "historical doc 7")],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate(batch, index).collect()
    }
    bloom = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(
            batch, index, fpp=0.5, expected=1
        ).collect()
    }
    assert bloom == exact
    assert bloom[1000] == "ref_dup"
    assert all(v == "kept" for i, v in bloom.items() if i != 1000)


def test_bloom_dedup_empty_index_and_index_miss(spark):
    """Empty index -> zero bitmap -> every row short-circuits the join and
    only in-batch statuses remain; disjoint index -> no ref_dup."""
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate_bloom,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, "aa"), (2, "AA"), (3, "bb")], "doc_id long, text string"
    )
    ann = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(
            batch, fingerprint_index(empty)
        ).collect()
    }
    assert ann == {1: "kept", 2: "batch_dup", 3: "kept"}

    disjoint = spark.createDataFrame(
        [(9, "zz"), (10, "yy")], "doc_id long, text string"
    )
    ann2 = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(
            batch, fingerprint_index(disjoint)
        ).collect()
    }
    assert ann2 == {1: "kept", 2: "batch_dup", 3: "kept"}


def test_bloom_bitmap_tree_merge_at_64_partitions(spark):
    """The bitmap build OR-merges per-partition blobs with treeAggregate
    (driver receives O(1) blobs, not #partitions).  At 64 index
    partitions — the scale the pre-r12 collect() path would have shipped
    64 bitmaps to the driver — the merged bitmap must be IDENTICAL to the
    1-partition build, and probing through it must stay output-identical
    to the exact annotate."""
    import numpy as np

    from tsne_flink_spark.pipeline.dedup import (
        build_fingerprint_bloom,
        fingerprint_index,
        incremental_dedup_annotate,
        incremental_dedup_annotate_bloom,
    )

    ref = spark.createDataFrame(
        [(1000 + i, f"historical doc {i}") for i in range(500)],
        "doc_id long, text string",
    )
    index = fingerprint_index(ref)
    bm1, m1, k1 = build_fingerprint_bloom(index.coalesce(1), expected=500)
    bm64, m64, k64 = build_fingerprint_bloom(
        index.repartition(64), expected=500
    )
    assert (m1, k1) == (m64, k64)
    assert np.array_equal(bm1, bm64)

    batch = spark.createDataFrame(
        [(i, f"historical doc {i % 500}") for i in range(0, 100, 2)]
        + [(i, f"fresh text {i}") for i in range(1, 100, 2)],
        "doc_id long, text string",
    )
    exact = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate(batch, index).collect()
    }
    bloom = {
        r["doc_id"]: r["status"]
        for r in incremental_dedup_annotate_bloom(
            batch, index.repartition(64), expected=500
        ).collect()
    }
    assert bloom == exact


def test_bloom_state_exposes_unpersistable_broadcast(spark):
    """bloom_state={} hands back the bitmap broadcast so per-batch
    incremental callers can unpersist it (the documented lifecycle) —
    and unpersisting after consumption must not break a fresh probe."""
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_annotate_bloom,
    )

    ref = spark.createDataFrame(
        [(100 + i, f"historical doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(0, "historical doc 3"), (1, "fresh")], "doc_id long, text string"
    )
    index = fingerprint_index(ref)
    state: dict = {}
    out = incremental_dedup_annotate_bloom(batch, index, bloom_state=state)
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {0: "ref_dup", 1: "kept"}
    assert state["m"] % 8 == 0 and state["k"] >= 1
    state["broadcast"].unpersist(blocking=True)
    # a NEW annotate (fresh broadcast) still works after the old one is gone
    out2 = incremental_dedup_annotate_bloom(batch, index)
    assert {r["doc_id"]: r["status"] for r in out2.collect()} == got
