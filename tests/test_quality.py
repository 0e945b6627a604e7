"""C4 and Gopher reference-rule filters (pipeline/quality.py) against
hand-computed expectations from the published rule sets."""

import pytest


@pytest.fixture(scope="module")
def c4_docs(spark):
    good = "\n".join(
        f"this is a perfectly fine sentence number {i}." for i in range(6)
    )
    rows = [
        (0, good),                                     # clean page
        (1, good + "\nlorem ipsum dolor sit amet."),   # lorem kill
        (2, good + "\nfunction() { return 1; }"),      # brace kill
        (3, "a short line.\nno punct here at all\nthis is ok fine."),  # too few kept
        (4, good + "\nenable javascript to view this page."),  # js line cut
        (5, good + "\ntiny one."),                     # <3 words line cut
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_c4_line_and_page_rules(spark, c4_docs):
    from tsne_flink_spark.pipeline.quality import c4_line_filter

    out = {r["doc_id"]: r for r in c4_line_filter(c4_docs).collect()}
    assert not out[0]["killed"] and out[0]["kill_reason"] == ""
    assert out[0]["n_kept_lines"] == 6
    assert out[1]["killed"] and out[1]["kill_reason"] == "lorem_ipsum"
    assert out[2]["killed"] and out[2]["kill_reason"] == "curly_brace"
    assert out[3]["killed"] and out[3]["kill_reason"] == "too_few_sentences"
    assert out[3]["n_kept_lines"] == 2  # 'no punct here' dropped
    # the javascript line is cut but the page survives (6 good lines)
    assert not out[4]["killed"]
    assert out[4]["n_kept_lines"] == 6
    assert "javascript" not in out[4]["text"]
    # a 2-word line fails the >= 3 words rule
    assert out[5]["n_kept_lines"] == 6
    assert "tiny one." not in out[5]["text"]


def test_c4_terminal_punctuation_variants(spark):
    from tsne_flink_spark.pipeline.quality import c4_line_filter

    base = "\n".join(f"pad sentence number {i} is fine." for i in range(5))
    rows = [
        (0, base + '\nhe said "stop right there."'),
        (1, base + "\nis this a question from me?"),
        (2, base + "\nwhat an exciting exclamation line!"),
        (3, base + "\ntrailing comma does not count,"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in c4_line_filter(docs).collect()}
    assert out[0]["n_kept_lines"] == 6
    assert out[1]["n_kept_lines"] == 6
    assert out[2]["n_kept_lines"] == 6
    assert out[3]["n_kept_lines"] == 5  # comma line dropped


def test_gopher_rules(spark):
    from tsne_flink_spark.pipeline.quality import gopher_quality

    fluent = " ".join(
        ["the quick brown fox jumps over and over that lazy dog to be "
         "seen with friends of mine"] * 4
    )
    rows = [
        (0, fluent),                                   # passes everything
        (1, "word " * 10),                             # too few words
        (2, fluent + " " + "#tag " * 40),              # symbol ratio blown
        (3, "\n".join(["- bullet item for all"] * 8)), # 100% bullets
        (4, " ".join(["12345 67890"] * 40)),           # no alpha words
        (5, ""),                                       # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[0]["passed"] and out[0]["n_stop_hits"] >= 2
    assert not out[1]["passed"] and out[1]["n_words"] == 10
    assert not out[2]["passed"]
    assert out[2]["symbol_word_ratio"] > 0.1
    assert not out[3]["passed"] and out[3]["bullet_line_frac"] == 1.0
    assert not out[4]["passed"] and out[4]["alpha_word_frac"] == 0.0
    assert not out[5]["passed"] and out[5]["n_words"] == 0


def test_gopher_ellipsis_lines(spark):
    from tsne_flink_spark.pipeline.quality import gopher_quality

    body = "the fine words of and that to be have with " * 8
    rows = [
        (0, "\n".join([body] + ["click to read more..."] * 9)),
        (1, "\n".join([body] * 9 + ["one trailing teaser…"])),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[0]["ellipsis_line_frac"] == 0.9 and not out[0]["passed"]
    assert out[1]["ellipsis_line_frac"] == 0.1 and out[1]["passed"]


def test_line_repetition(spark):
    from tsne_flink_spark.pipeline.quality import line_repetition

    rows = [
        (0, "a unique line\nanother unique line"),
        (1, "promo\npromo\npromo\nbody text line"),
        (2, "x"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in line_repetition(docs).collect()}
    assert out[0]["n_dup_lines"] == 0 and out[0]["dup_line_frac"] == 0.0
    # 3x 'promo': 2 of 4 occurrences are repeats; chars 10 of 29
    assert out[1]["n_dup_lines"] == 2
    assert out[1]["dup_line_frac"] == 0.5
    assert out[1]["dup_line_char_frac"] == round(10 / 29, 6)
    assert out[2]["n_lines"] == 1 and out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 1  # empty text is one empty line


def test_compression_ratio_bounds_hold_for_tiny_docs(spark):
    """ADVICE r8: zlib's ~11-byte fixed overhead makes docs shorter than
    ~8 bytes compress LARGER than the input, so a flat ratio <= 1.5 bound
    false-fails on them.  The invariant q_compression_check now enforces —
    n_compressed <= n_bytes + 64 + n_bytes/1000, ratio <= 1.5 only for
    n_bytes >= 64 — must hold for empty, 1-byte, tiny, and incompressible
    inputs alike."""
    import random

    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.quality import compression_ratio

    rng = random.Random(7)
    incompressible = "".join(chr(rng.randrange(0x20, 0x2000)) for _ in range(5000))
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "a"),
            (3, "ab"),
            (4, "tiny"),
            (5, "x" * 63),
            (6, "y" * 64),
            (7, "hello world " * 400),
            (8, incompressible),
        ],
        "doc_id long, text string",
    )
    out = compression_ratio(docs)
    bad = out.where(
        (F.col("n_bytes") > 0)
        & (
            (F.col("ratio") < 1e-9)
            | (F.col("n_compressed") > F.col("n_bytes") + 64 + F.col("n_bytes") / 1000)
            | ((F.col("n_bytes") >= 64) & (F.col("ratio") > 1.5))
        )
    ).collect()
    assert not bad, bad
    # and the old flat bound really does false-fail on a tiny doc —
    # the reason the invariant changed
    tiny = out.where(F.col("doc_id") == 2).collect()[0]
    assert tiny["ratio"] > 1.5


def test_blocklist_filter_token_boundary(spark):
    """C4 word-blocklist rule: token-boundary matching only — a
    blocklisted word inside another word must NOT match."""
    from tsne_flink_spark.pipeline.quality import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "this query is slow today"),
            (2, "slowly is a different token"),
            (3, "SLOW uppercase still matches"),
            (4, "clean document"),
            (5, "slow slow broken"),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in blocklist_filter(
        docs, ["slow", "broken"]).collect()}
    assert out[1]["blocked"] and out[1]["n_blocked"] == 1
    assert not out[2]["blocked"]          # substring never matches
    assert out[3]["blocked"]              # case-insensitive
    assert not out[4]["blocked"]
    assert out[5]["n_blocked"] == 3
    assert not out[6]["blocked"]
    # empty blocklist blocks nothing
    none = blocklist_filter(docs, []).where("blocked").count()
    assert none == 0


def test_keyword_textrank_centrality_and_stopwords(spark):
    """TextRank ranks the co-occurrence HUB above peripheral words, never
    emits stop words, and is partition-independent."""
    docs = spark.createDataFrame(
        [
            # "spark" co-occurs with every other content word (the hub);
            # stop word "the" is everywhere but must not appear
            (1, "the spark engine"),
            (2, "the spark shuffle"),
            (3, "the spark catalyst"),
            (4, "the spark tungsten"),
            (5, "the engine shuffle"),
        ],
        "doc_id long, text string",
    )
    from tsne_flink_spark.pipeline.text import keyword_textrank

    rows = keyword_textrank(docs, k=10).collect()
    words = [r.word for r in rows]
    assert "the" not in words
    assert words[0] == "spark"  # highest centrality
    assert set(words) == {"spark", "engine", "shuffle", "catalyst", "tungsten"}
    rows2 = keyword_textrank(docs.repartition(7), k=10).collect()
    assert [(r.word, r.rank) for r in rows] == [(r.word, r.rank) for r in rows2]


def test_winsorize_clips_at_exact_percentiles(spark):
    """Per-group clip bounds are Spark's exact percentile; values inside
    the band pass through untouched; by=None clips globally."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.quality import winsorize

    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 100.0), ("b", 200.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", by=["g"], lo=0.1, hi=0.9)
    a = sorted(r["v_w"] for r in out.where(F.col("g") == "a").collect())
    # exact percentile of 1..10 at 0.1 = 1.9, at 0.9 = 9.1
    assert a[0] == 1.9 and a[-1] == 9.1
    assert a[3] == 4.0  # interior values untouched
    g = winsorize(df.where(F.col("g") == "a"), "v", lo=0.0, hi=1.0)
    assert sorted(r["v_w"] for r in g.collect()) == [float(v) for v in range(1, 11)]
