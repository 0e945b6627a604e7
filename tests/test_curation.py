"""Tests for the curation operators (connected components, near-dup
clustering, decontamination, stratified sampling, sequence packing) and the
repetition quality signals."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "The quick brown fox jumps over the lazy dog", "en", "s1"),
        (2, "The quick brown fox leaps over the lazy dog", "en", "s2"),
        (3, "Der schnelle braune Fuchs springt und das ist gut", "de", "s0"),
        (4, "Completely different text about spark and data processing", "en", "s1"),
        (5, "the  QUICK   brown fox jumps over the lazy dog", "en", "s3"),
        (6, "Le renard brun rapide saute et c'est tres bien pour le chien", "fr", "s2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_connected_components_transitive(spark):
    from tsne_flink_spark.operators.graph import connected_components

    # two components: {1,2,3,4} via a chain (1-2, 2-3, 3-4), {10,11}
    out = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)]))
    comp = {r["id"]: r["component"] for r in out.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path(spark):
    from tsne_flink_spark.operators.graph import connected_components

    # a 40-node path: diameter 39, must converge well within max_rounds
    # thanks to pointer jumping (O(log diameter) rounds)
    out = connected_components(_edges(spark, [(i, i + 1) for i in range(39)]))
    comp = {r["id"]: r["component"] for r in out.collect()}
    assert set(comp) == set(range(40))
    assert set(comp.values()) == {0}


def test_connected_components_empty_and_selfloop(spark):
    from tsne_flink_spark.operators.graph import connected_components

    assert connected_components(_edges(spark, [])).count() == 0
    out = connected_components(_edges(spark, [(5, 5), (7, 8)]))
    comp = {r["id"]: r["component"] for r in out.collect()}
    assert comp == {5: 5, 7: 7, 8: 7}


def test_connected_components_vs_union_find(spark):
    """Random graph vs a pure-python union-find reference."""
    import random

    from tsne_flink_spark.operators.graph import connected_components

    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    for a, b in edges:
        for x in (a, b):
            expected[x] = find(x)

    out = connected_components(_edges(spark, edges))
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == expected


def test_connected_components_huge_hash_ids(spark):
    """Node ids near 2^62 (xxhash64-derived keys): id arithmetic must not
    overflow anywhere — a sum-of-labels convergence potential would raise
    under ANSI mode with just three such nodes."""
    from tsne_flink_spark.operators.graph import connected_components

    big = 1 << 62
    out = connected_components(
        _edges(spark, [(big + 5, big + 9), (big + 9, big + 1)])
    )
    comp = {r["id"]: r["component"] for r in out.collect()}
    assert comp == {big + 5: big + 1, big + 9: big + 1, big + 1: big + 1}


def test_stratified_sample_huge_ids_no_overflow(spark):
    """Doc ids above ~8.4e9 overflow a naive key*A LCG step (ANSI error);
    the pre-fold keeps the arithmetic exact and engine-portable."""
    from tsne_flink_spark.pipeline.curation import (
        _LCG_A,
        _LCG_C,
        _LCG_M,
        stratified_sample,
    )

    big = 1 << 40
    docs = spark.createDataFrame(
        [(big + i, "x", "en") for i in range(50)],
        "doc_id bigint, text string, lang string",
    )
    rows = {
        r["doc_id"]: r["sample_bucket"]
        for r in stratified_sample(docs, {"en": 100}).collect()
    }
    assert len(rows) == 50  # rate 100 keeps everything
    for i in range(50):
        k = (big + i) % _LCG_M
        h = (k * _LCG_A + _LCG_C) % _LCG_M
        h = (h * _LCG_A + _LCG_C) % _LCG_M
        assert rows[big + i] == h % 100


def test_near_dup_clusters_transitive_family(spark, docs):
    from tsne_flink_spark.pipeline.curation import near_dup_clusters

    out = near_dup_clusters(docs, threshold=0.4, shingle_n=2)
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert set(rows) == set(range(7))  # total annotation: every doc emitted
    # 0, 1, 5 are normalization-duplicates and 2 a near-dup: one family,
    # canonical = lowest id
    assert rows[0] == (0, 1)
    for d in (1, 2, 5):
        assert rows[d] == (0, 0)
    # unrelated docs are their own singleton clusters
    for d in (3, 4, 6):
        assert rows[d] == (d, 1)
    # exactly one keep=1 per cluster
    kept = out.where("keep = 1").groupBy("cluster_id").count().collect()
    assert all(r["count"] == 1 for r in kept)


def test_near_dup_clusters_from_minhash_pairs(spark, docs):
    """The scale path: LSH-bounded verified pairs feeding the same
    clustering; exact dups are guaranteed caught (identical signatures)."""
    from tsne_flink_spark.pipeline.curation import near_dup_clusters
    from tsne_flink_spark.pipeline.dedup import minhash_dup_pairs

    pairs = minhash_dup_pairs(docs, threshold=0.5)
    out = near_dup_clusters(docs, pairs=pairs)
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert set(rows) == set(range(7))
    assert rows[0] == (0, 1)
    assert rows[1] == (0, 0)  # exact dup of 0
    assert rows[5] == (0, 0)  # normalization dup of 0
    assert rows[4] == (4, 1)  # unrelated doc is its own cluster


def test_near_dup_clusters_from_simhash_pairs(spark, docs):
    """Any (a, b) miner feeds the same clustering: simhash pairs (Hamming
    <= 3 banded) must collapse the exact-dup family."""
    from tsne_flink_spark.pipeline.curation import near_dup_clusters
    from tsne_flink_spark.pipeline.dedup import simhash_dup_pairs

    out = near_dup_clusters(docs, pairs=simhash_dup_pairs(docs))
    rows = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in out.collect()}
    assert rows[0] == (0, 1)
    assert rows[1] == (0, 0)  # identical text -> identical simhash
    assert rows[5] == (0, 0)


def test_decontaminate(spark, docs):
    from tsne_flink_spark.pipeline.curation import decontaminate

    train = docs.where(F.col("doc_id").isin(1, 2, 4))
    holdout = docs.where(F.col("doc_id").isin(0, 6))
    out = decontaminate(train, holdout, ngram_n=5, min_hits=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 4}  # all training docs annotated
    # doc 1 is an exact dup of holdout doc 0: shares all its 5-grams
    assert rows[1]["contaminated"] == 1
    assert rows[1]["n_holdout_docs"] == 1
    assert rows[1]["n_shared_grams"] == 5  # 9 tokens -> 5 distinct 5-grams
    # doc 2 swaps the middle word; all five 5-gram windows of a 9-token doc
    # cover position 5, so none survive -> clean despite being a near-dup
    assert rows[2]["contaminated"] == 0
    assert rows[2]["n_shared_grams"] == 0
    # doc 4 is unrelated prose: clean
    assert rows[4]["n_shared_grams"] == 0
    assert rows[4]["n_holdout_docs"] == 0
    assert rows[4]["contaminated"] == 0


def test_stratified_sample_deterministic_and_nested(spark, docs):
    from tsne_flink_spark.pipeline.curation import stratified_sample

    a = {r["doc_id"] for r in stratified_sample(docs, {"en": 60}).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"en": 60}).collect()}
    assert a == b  # same rows every run — no RNG state
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 20}, default_rate=0).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(docs, {"en": 60}, default_rate=0).collect()
    }
    assert small <= big  # nested samples: raising a rate only adds rows
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": 150})


def test_stratified_sample_respects_rates(spark):
    from tsne_flink_spark.pipeline.curation import stratified_sample

    n = 2000
    docs = spark.createDataFrame(
        [(i, "x", "en" if i % 2 else "de") for i in range(n)],
        "doc_id bigint, text string, lang string",
    )
    out = stratified_sample(docs, {"en": 50, "de": 10}).groupBy("lang").count()
    counts = {r["lang"]: r["count"] for r in out.collect()}
    # LCG buckets are near-uniform: expect ~500 en, ~100 de (±20%)
    assert 400 <= counts["en"] <= 600
    assert 60 <= counts["de"] <= 140


def test_pack_sequences_layout(spark):
    from tsne_flink_spark.pipeline.curation import pack_sequences

    # token counts are word counts here (no punctuation): 6, 8, 3, 0 tokens
    rows = [
        (0, "a b c d e f", "s0"),
        (1, "g h i j k l m n", "s0"),
        (2, "o p q", "s0"),
        (3, "", "s0"),
        (10, "z y x w", "s1"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, capacity=10, shard_col="source").collect()
    }
    # s0 stream: doc0 [0,6) pack0; doc1 [6,14) spans packs 0-1; doc2 [14,17)
    # pack1; doc3 zero tokens at 17 -> pack1, spans 1
    assert (out[0]["pack_id"], out[0]["pack_offset"], out[0]["n_packs"]) == (0, 0, 1)
    assert (out[1]["pack_id"], out[1]["pack_offset"], out[1]["n_packs"]) == (0, 6, 2)
    assert (out[2]["pack_id"], out[2]["pack_offset"], out[2]["n_packs"]) == (1, 4, 1)
    assert (out[3]["pack_id"], out[3]["pack_offset"], out[3]["n_packs"]) == (1, 7, 1)
    # s1 is an independent stream
    assert (out[10]["pack_id"], out[10]["pack_offset"], out[10]["n_packs"]) == (0, 0, 1)
    # conservation: every pack except each shard's last is exactly full
    assert out[1]["n_tokens"] == 8


def test_curation_pipeline_minhash_miner(spark, docs):
    """The corpus-scale miner swap: same staged semantics, LSH-bounded
    edges.  On this fixture the exact dups are guaranteed caught, so the
    stage labels for the unambiguous docs must match the exact path."""
    from tsne_flink_spark.pipeline.curation import curation_pipeline

    out = curation_pipeline(docs, pair_miner="minhash")
    stages = {r["doc_id"]: r["stage"] for r in out.collect()}
    assert stages[0] == "holdout"
    assert stages[5] == "exact_dup"
    assert stages[1] == "contaminated"  # identical to holdout doc 0
    with pytest.raises(ValueError):
        curation_pipeline(docs, pair_miner="simhash")


def test_pack_sequences_property_vs_python(spark):
    """Random corpora vs a pure-python packer: layout must be gapless and
    conserving — every doc starts exactly where the previous one in its
    shard ended, pack/offset arithmetic agrees with integer division."""
    import random

    rng = random.Random(23)
    cap = 64
    rows = []
    for i in range(400):
        shard = f"s{rng.randrange(5)}"
        n_tok = rng.choice([0, 1, rng.randrange(2, 150)])
        rows.append((i, "w " * n_tok if n_tok else "", shard))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    from tsne_flink_spark.pipeline.curation import pack_sequences

    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"], r["n_packs"])
        for r in pack_sequences(docs, capacity=cap).collect()
    }

    cum = {}
    for i, text, shard in rows:  # already in doc_id order
        n_tok = len(text.split())
        start = cum.get(shard, 0)
        end = start + n_tok
        first = start // cap
        last = (end - 1) // cap if n_tok else first
        assert got[i] == (n_tok, first, start % cap, max(last, first) - first + 1)
        cum[shard] = end


def test_curation_pipeline_stages(spark, docs):
    from tsne_flink_spark.pipeline.curation import (
        _LCG_A,
        _LCG_C,
        _LCG_M,
        curation_pipeline,
    )

    out = curation_pipeline(docs, jaccard_threshold=0.5, shingle_n=2)
    stages = {r["doc_id"]: r["stage"] for r in out.collect()}
    assert set(stages) == set(range(7))  # total annotation
    assert stages[0] == "holdout"       # id % 10 == 0
    assert stages[5] == "exact_dup"     # ws/case dup of 1 (0 is held out)
    assert stages[2] == "near_dup"      # jaccard 0.6 with canonical 1
    assert stages[1] == "contaminated"  # identical text to holdout doc 0
    # 3 (de) and 6 (fr) score low on the en-stopword quality heuristic
    assert stages[3] == "low_quality"
    assert stages[6] == "low_quality"
    # doc 4 survives every filter; kept iff its LCG bucket < en rate (50)
    h = (4 * _LCG_A + _LCG_C) % _LCG_M
    h = (h * _LCG_A + _LCG_C) % _LCG_M
    assert stages[4] == ("kept" if h % 100 < 50 else "not_sampled")


def test_stratified_take_exact_k(spark):
    from tsne_flink_spark.pipeline.curation import stratified_take

    docs = spark.createDataFrame(
        [(i, "x", "en" if i % 3 else "de") for i in range(300)],
        "doc_id bigint, text string, lang string",
    )
    out = stratified_take(docs, 25)
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    assert counts == {"en": 25, "de": 25}
    # deterministic: identical rows across runs
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in stratified_take(docs, 25).collect()}
    assert a == b
    # k above the stratum size returns the whole stratum
    assert stratified_take(docs, 1000).count() == 300


def test_curation_ops_stream_batch_parity(spark, tmp_path, docs):
    """The stateless curation/text ops (LCG sampling, quality scoring,
    language ID) are pure narrow maps, so the SAME code runs unchanged on a
    Structured Streaming source — append-mode output must equal batch."""
    import os

    from tsne_flink_spark.pipeline.curation import stratified_sample
    from tsne_flink_spark.pipeline.text import language_id, quality_score

    stream_dir = str(tmp_path / "docs_stream")
    os.makedirs(stream_dir)
    docs.write.mode("overwrite").parquet(stream_dir)

    def xform(df):
        return stratified_sample(df, {"en": 60}, default_rate=40).select(
            "doc_id",
            "sample_bucket",
            F.round(quality_score(F.col("text")), 6).alias("q"),
            language_id(F.col("text")).alias("lang_pred"),
        )

    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    q = (
        xform(stream)
        .writeStream.format("memory")
        .queryName("curation_parity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("select * from curation_parity").collect()}
    want = {tuple(r) for r in xform(docs).collect()}
    assert got == want and len(want) > 0


def test_language_id_ngram_discriminates(spark):
    """Real sentences in each lexicon language: the trigram profiles must
    pick the right language even when few whole stopwords appear."""
    from tsne_flink_spark.pipeline.text import language_id_ngram

    rows = [
        (0, "the quality of the results is important for that reason", "en"),
        (1, "der Hund ist nicht mit der Katze zu vergleichen und das stimmt", "de"),
        (2, "le chat est sur la table et les livres sont pour une amie", "fr"),
        (3, "el perro es de una familia y los gatos son por la casa", "es"),
        (4, "zzz qqq xxx", "und"),
        (5, "", "und"),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["p"]
        for r in docs.select(
            "doc_id", language_id_ngram(F.col("text")).alias("p")
        ).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_curate_cli_smoke(spark, tmp_path, docs):
    from tsne_flink_spark.pipeline.curate_cli import main, parse_rates

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out_ann = str(tmp_path / "annotated")
    rc = main(
        ["--input", src, "--output", out_ann, "--rate", "en=100",
         "--default-rate", "100", "--quality-min", "0.0"],
        spark=spark,
    )
    assert rc == 0
    ann = spark.read.parquet(out_ann)
    assert ann.count() == 7 and set(ann.columns) == {"doc_id", "stage"}

    out_flt = str(tmp_path / "filtered")
    rc = main(
        ["--input", src, "--output", out_flt, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0"],
        spark=spark,
    )
    assert rc == 0
    kept = spark.read.parquet(out_flt)
    assert set(kept.columns) == set(docs.columns)
    # with all filters wide open, kept == every clean non-holdout survivor
    want = {
        r["doc_id"] for r in ann.where("stage = 'kept'").collect()
    }
    assert {r["doc_id"] for r in kept.collect()} == want and want

    assert parse_rates(["en=50", "de=30"]) == {"en": 50, "de": 30}
    with pytest.raises(SystemExit):
        parse_rates(["bogus"])


def test_curate_cli_partitioned_write(spark, tmp_path, docs):
    """--partition-by lang writes a hive layout with the partition-col
    shuffle bounding file counts: each lang directory holds ONE parquet
    file (not one per write task), and the round-trip preserves the kept
    set exactly."""
    import os

    from tsne_flink_spark.pipeline.curate_cli import main

    src = str(tmp_path / "docs.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "by_lang")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--partition-by", "lang", "--rate", "en=100",
         "--default-rate", "100", "--quality-min", "0.0",
         "--compression", "snappy"],
        spark=spark,
    )
    assert rc == 0
    langs = sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    )
    assert langs  # at least one partition directory
    for d in langs:
        files = [
            f for f in os.listdir(os.path.join(out, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (d, files)
    kept = spark.read.parquet(out)
    assert set(kept.columns) == set(docs.columns)
    back = {(r["doc_id"], r["lang"]) for r in kept.collect()}
    flat = str(tmp_path / "flat")
    rc = main(
        ["--input", src, "--output", flat, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100",
         "--quality-min", "0.0"],
        spark=spark,
    )
    assert rc == 0
    want = {
        (r["doc_id"], r["lang"])
        for r in spark.read.parquet(flat).collect()
    }
    assert back == want and back

    # --output-files salts the partition shuffle: requesting 2 files per
    # directory must produce at most 2 (small strata can land in 1)
    out2 = str(tmp_path / "by_lang_2f")
    rc = main(
        ["--input", src, "--output", out2, "--mode", "filter",
         "--partition-by", "lang", "--output-files", "2",
         "--rate", "en=100", "--default-rate", "100",
         "--quality-min", "0.0"],
        spark=spark,
    )
    assert rc == 0
    for d in (d for d in os.listdir(out2) if d.startswith("lang=")):
        files = [
            f for f in os.listdir(os.path.join(out2, d))
            if f.endswith(".parquet")
        ]
        assert 1 <= len(files) <= 2, (d, files)


def test_repetition_stats_property_vs_python(spark):
    """Random token streams vs a pure-python reference — exercises the
    sorted-array max-run fold (max run length == max frequency) across
    duplicate-heavy, unique, and single-token regimes."""
    import random
    from collections import Counter

    rng = random.Random(31)
    vocab = ["a", "b", "cc", "ddd", "e1", "ff", "g"]
    rows = []
    for i in range(120):
        n = rng.randrange(0, 25)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    from tsne_flink_spark.pipeline.text import repetition_stats

    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    for i, text in rows:
        toks = text.split()
        n = len(toks)
        counts = Counter(toks)
        grams = (
            [" ".join(toks[j : j + 2]) for j in range(max(n - 1, 1))]
            if n
            else [""]
        )
        r = got[i]
        assert r["n_tokens"] == n
        assert r["type_token_ratio"] == pytest.approx(len(counts) / max(n, 1))
        top = max(counts.values()) if counts else 0
        assert r["top_token_frac"] == pytest.approx(top / max(n, 1))
        dup = (len(grams) - len(set(grams))) / max(len(grams), 1)
        assert r["dup_2gram_frac"] == pytest.approx(dup)


def test_curation_pipeline_degenerate_inputs(spark):
    """Empty table and all-identical corpus must not crash any stage."""
    from tsne_flink_spark.pipeline.curation import curation_pipeline

    schema = "doc_id bigint, text string, lang string"
    empty = spark.createDataFrame([], schema)
    assert curation_pipeline(empty).count() == 0

    same = spark.createDataFrame(
        [(i, "the same text for every doc here", "en") for i in range(12)],
        schema,
    )
    out = {r["doc_id"]: r["stage"] for r in curation_pipeline(same).collect()}
    assert len(out) == 12
    # 0 and 10 are holdout; 1 survives exact dedup but is contaminated
    # (identical to the holdout docs); everything else is an exact dup
    assert out[0] == "holdout" and out[10] == "holdout"
    assert out[1] == "contaminated"
    assert all(out[i] == "exact_dup" for i in out if i not in (0, 1, 10))


def test_repetition_stats_exact_values(spark):
    from tsne_flink_spark.pipeline.text import repetition_stats

    rows = [
        (0, "a a a a"),          # 4 tokens, 1 type, top 4; 2-grams: 3x "a a"
        (1, "a b c d"),          # all distinct
        (2, "a b a b a"),        # 5 tokens, 2 types, top 3; grams: ab,ba,ab,ba
        (3, ""),                 # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["n_tokens"] == 4
    assert out[0]["type_token_ratio"] == pytest.approx(0.25)
    assert out[0]["top_token_frac"] == pytest.approx(1.0)
    assert out[0]["dup_2gram_frac"] == pytest.approx(2 / 3)
    assert out[1]["type_token_ratio"] == pytest.approx(1.0)
    assert out[1]["top_token_frac"] == pytest.approx(0.25)
    assert out[1]["dup_2gram_frac"] == pytest.approx(0.0)
    assert out[2]["top_token_frac"] == pytest.approx(3 / 5)
    assert out[2]["dup_2gram_frac"] == pytest.approx(0.5)  # 4 grams, 2 distinct
    assert out[3]["n_tokens"] == 0
    assert out[3]["top_token_frac"] == pytest.approx(0.0)
    assert out[3]["dup_2gram_frac"] == pytest.approx(0.0)


def test_mixture_weights_uniform_and_targeted(spark):
    from tsne_flink_spark.pipeline.curation import mixture_weights

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "web"),      # 4 tokens
            (2, "a b c d", "web"),      # 4 tokens
            (3, "x y", "code"),          # 2 tokens
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in mixture_weights(docs).collect()}
    web, code = out["web"], out["code"]
    assert (web["n_docs"], web["n_tokens"]) == (2, 8)
    assert (code["n_docs"], code["n_tokens"]) == (1, 2)
    assert web["actual_share"] == 0.8 and code["actual_share"] == 0.2
    assert web["target_share"] == 0.5 == code["target_share"]
    # uniform target: the underrepresented source gets the bigger weight,
    # normalized so the max sample_rate is exactly 1
    assert code["weight"] == 2.5 and web["weight"] == 0.625
    assert code["sample_rate"] == 1.0 and web["sample_rate"] == 0.25

    tgt = {r["source"]: r for r in mixture_weights(
        docs, targets={"web": 0.9, "code": 0.1}
    ).collect()}
    assert tgt["web"]["target_share"] == 0.9
    assert tgt["web"]["weight"] == 1.125 and tgt["code"]["weight"] == 0.5
    assert tgt["web"]["sample_rate"] == 1.0


def test_curate_cli_scrub_flags(spark, tmp_path):
    """--strip-boilerplate removes corpus-frequent lines before the
    pipeline; --redact-pii scrubs the written text (filter mode)."""
    from tsne_flink_spark.pipeline.curate_cli import main

    rows = [
        (i, "FOOTER all rights reserved\n"
            f"the quick brown fox number {i} jumps over the lazy dog "
            "and writes to admin@corp.example.com for help", "en")
        for i in range(1, 9)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    src = str(tmp_path / "docs_scrub.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "scrubbed")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--strip-boilerplate", "3", "--redact-pii"],
        spark=spark,
    )
    assert rc == 0
    kept = spark.read.parquet(out).collect()
    assert kept  # distinct per-doc bodies survive dedup once footer is gone
    for r in kept:
        assert "FOOTER" not in r["text"]
        assert "admin@corp.example.com" not in r["text"]
        assert "<EMAIL>" in r["text"]


def test_curate_cli_zordered_write(spark, tmp_path):
    """--zorder-by doc_id,n_chars writes the curated corpus clustered on
    the Hilbert key of BOTH columns: parquet row-group min/max stats let a
    reader's 25% box predicate on EITHER column skip at least half of the
    row groups (the B28 layout, now reachable from the CLI sink)."""
    import os

    import pyarrow.parquet as pq

    from tsne_flink_spark.pipeline.curate_cli import main

    n = 1200
    # n_chars is a decorrelated permutation of doc_id so single-column
    # sorting on one would be blind on the other
    rows = [
        (i, f"unique document number {i} alpha beta gamma delta {i * 7919}",
         "en" if i % 2 else "de", (i * 769) % n)
        for i in range(n)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint"
    )
    src = str(tmp_path / "docs_z.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "zordered")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--zorder-by", "doc_id,n_chars", "--output-files", "16"],
        spark=spark,
    )
    assert rc == 0
    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) >= 8  # range shuffle produced a multi-file layout

    def scanned_fraction(col, lo, hi):
        total = overlapping = 0
        for path in files:
            pf = pq.ParquetFile(path)
            idx = pf.schema_arrow.names.index(col)
            for rg in range(pf.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                total += 1
                if not (st.max < lo or st.min > hi):
                    overlapping += 1
        return overlapping / total

    # 25% box on each clustered column; tolerate holdout-trimmed bounds
    assert scanned_fraction("doc_id", 100, 100 + n // 4) <= 0.5
    assert scanned_fraction("n_chars", 100, 100 + n // 4) <= 0.5

    # guard rail: filter-mode only
    with pytest.raises(SystemExit):
        main(["--input", src, "--output", out, "--mode", "annotate",
              "--zorder-by", "doc_id"], spark=spark)

    # --zorder-by composes with --partition-by: hive directories whose
    # files are curve-clustered (prunable on the zorder columns within
    # each directory)
    out_p = str(tmp_path / "zordered_by_lang")
    rc = main(
        ["--input", src, "--output", out_p, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--zorder-by", "doc_id,n_chars", "--partition-by", "lang",
         "--output-files", "32"],
        spark=spark,
    )
    assert rc == 0
    lang_dirs = [d for d in os.listdir(out_p) if d.startswith("lang=")]
    assert lang_dirs
    pfiles = [
        os.path.join(out_p, d, f)
        for d in lang_dirs
        for f in os.listdir(os.path.join(out_p, d))
        if f.endswith(".parquet")
    ]

    def scanned_fraction_files(col, lo, hi):
        total = overlapping = 0
        for path in pfiles:
            pf = pq.ParquetFile(path)
            idx = pf.schema_arrow.names.index(col)
            for rg in range(pf.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                total += 1
                if not (st.max < lo or st.min > hi):
                    overlapping += 1
        return overlapping / total

    assert scanned_fraction_files("doc_id", 100, 100 + n // 4) <= 0.6
    assert scanned_fraction_files("n_chars", 100, 100 + n // 4) <= 0.6


def test_curate_cli_strip_dup_substrings(spark, tmp_path):
    """--strip-dup-substrings L cuts corpus-wide duplicated passages
    before the pipeline; the written docs keep their distinct bodies."""
    from tsne_flink_spark.pipeline.curate_cli import main

    passage = ("all rights reserved redistribution permitted under the "
               "terms of this license agreement only")
    rows = [
        (i, f"document body number {i} with unique words here {passage}",
         "en")
        for i in range(1, 9)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    src = str(tmp_path / "docs_substr.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "substr_clean")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--strip-dup-substrings", "8"],
        spark=spark,
    )
    assert rc == 0
    kept = spark.read.parquet(out).collect()
    assert kept  # distinct bodies survive dedup once the passage is gone
    for r in kept:
        assert "redistribution" not in r["text"]
        assert f"document body number {r['doc_id']}" in r["text"]


def test_curate_cli_perplexity_tail_cut(spark, tmp_path):
    """--perplexity-tail-pct drops the corpus-LM perplexity tail (the
    garbled docs) before the pipeline; fluent docs survive."""
    from tsne_flink_spark.pipeline.curate_cli import main

    fluent = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog "
            "and runs through the quiet green field", "en")
        for i in range(1, 17)
    ]
    garbled = [
        (100 + i, f"zq{i} xv qq zz vx pq qp zx wv vw jj", "en")
        for i in range(4)
    ]
    docs = spark.createDataFrame(
        fluent + garbled, "doc_id bigint, text string, lang string"
    )
    src = str(tmp_path / "docs_ppl.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "ppl_cut")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--jaccard-threshold", "0.95", "--holdout-mod", "1000",
         "--perplexity-tail-pct", "20"],
        spark=spark,
    )
    assert rc == 0
    kept_ids = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept_ids and not {i for i in kept_ids if i >= 100}, kept_ids


def test_chunk_documents_layout(spark):
    """Sliding-window chunking: full coverage, correct overlap, ragged
    tail, short docs one chunk, empty docs none."""
    from tsne_flink_spark.pipeline.curation import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, words), (1, "a b c"), (2, ""), (3, "solo")],
        "doc_id bigint, text string",
    )
    out = chunk_documents(docs, window=4, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # doc 0 (10 tokens, window 4, stride 2): starts 0,2,4,6,8 -> 5 chunks
    assert sorted(by_doc[0]) == [0, 1, 2, 3, 4]
    assert by_doc[0][0]["chunk_text"] == "w0 w1 w2 w3"
    assert by_doc[0][1]["chunk_text"] == "w2 w3 w4 w5"
    assert by_doc[0][4]["chunk_text"] == "w8 w9"  # ragged tail
    assert by_doc[0][4]["n_tokens"] == 2
    # every token position is covered by at least one chunk
    covered = set()
    for cid, r in by_doc[0].items():
        covered |= set(range(cid * 2, cid * 2 + r["n_tokens"]))
    assert covered == set(range(10))
    # short docs
    assert sorted(by_doc[1]) == [0, 1]  # "a b c": starts 0 and 2
    assert by_doc[1][1]["chunk_text"] == "c"
    assert 2 not in by_doc  # empty doc yields no chunks
    assert by_doc[3][0]["chunk_text"] == "solo"
    # non-overlapping default: stride == window, no shared tokens
    out2 = chunk_documents(docs, window=3).collect()
    d0 = sorted(
        (r["chunk_id"], r["chunk_text"]) for r in out2 if r["doc_id"] == 0
    )
    assert d0 == [
        (0, "w0 w1 w2"), (1, "w3 w4 w5"), (2, "w6 w7 w8"), (3, "w9")
    ]
    with pytest.raises(ValueError):
        chunk_documents(docs, window=0)


def test_curate_cli_perplexity_tail_cut_tokenless_corpus(spark, tmp_path):
    """Regression: a corpus where NO document has a token used to crash
    --perplexity-tail-pct with float(None) (percentile_approx over an empty
    scored frame returns NULL).  The cut is skipped and the run completes."""
    from tsne_flink_spark.pipeline.curate_cli import main

    rows = [(1, "", "en"), (2, "   ", "en"), (3, "\t\n", "en")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    src = str(tmp_path / "docs_tokenless.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "tokenless_clean")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--perplexity-tail-pct", "10"],
        spark=spark,
    )
    assert rc == 0


def test_curate_cli_c4_and_gopher_stages(spark, tmp_path):
    """--c4-clean strips non-sentence lines and kills lorem/brace pages;
    --gopher-filter drops documents failing the Gopher heuristics."""
    from tsne_flink_spark.pipeline.curate_cli import main

    vocab = {
        1: "alpha bravo charlie delta echo foxtrot golf hotel".split(),
        2: "india juliet kilo lima mike november oscar papa".split(),
        3: "quebec romeo sierra tango uniform victor whiskey xray".split(),
    }

    def body(d):
        # disjoint vocabularies: near-dup stages must keep them all apart
        ws = vocab[d]
        return "\n".join(
            "the " + " ".join(ws[(k + j) % 8] for j in range(6))
            + f" line {k} of that have with story ends well."
            for k in range(6)
        )

    rows = [
        (1, body(1) + "\nthis line has no punctuation at all", "en"),
        (2, body(2) + "\nlorem ipsum dolor sit amet.", "en"),  # C4 kill
        (3, body(3), "en"),
        (4, "tiny doc.", "en"),                                 # gopher kill
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    src = str(tmp_path / "docs_c4.parquet")
    docs.write.parquet(src)
    out = str(tmp_path / "c4_clean_out")
    rc = main(
        ["--input", src, "--output", out, "--mode", "filter",
         "--rate", "en=100", "--default-rate", "100", "--quality-min", "0.0",
         "--c4-clean", "--gopher-filter"],
        spark=spark,
    )
    assert rc == 0
    kept = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert 2 not in kept          # lorem ipsum page killed by C4
    assert 4 not in kept          # too-few-words doc killed by Gopher
    assert 1 in kept and 3 in kept
    assert "no punctuation" not in kept[1]["text"]  # line stripped by C4


def test_corpus_diff(spark):
    from tsne_flink_spark.pipeline.curation import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text here"), (2, "will change"), (3, "will vanish")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, "same   TEXT here"),  # whitespace/case-normalized: unchanged
         (2, "has changed"), (4, "brand new")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_near_dup_best_rep_keeps_highest_quality(spark):
    """The representative is the best-quality doc of the family, not the
    min id: a long fluent near-dup must win over a shorter earlier one."""
    from tsne_flink_spark.pipeline.curation import near_dup_best_rep

    shared = "the quick brown fox jumps over the lazy dog again today"
    rows = [
        (1, shared),  # min id, short
        (2, shared + " and it is a fine tale"),
        (3, "a completely different standalone document body here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in near_dup_best_rep(docs).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[2]["quality"] > out[1]["quality"]
    assert out[2]["keep"] == 1 and out[1]["keep"] == 0  # best, not min id
    assert out[3]["keep"] == 1 and out[3]["cluster_id"] == 3


def test_term_drift_surfaces_injected_shift(spark):
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.curation import term_drift

    old = spark.createDataFrame(
        [(i, "alpha beta gamma delta common words here") for i in range(40)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, "alpha beta gamma delta common words here") for i in range(40)]
        + [(100 + i, "flood flood flood boilerplate") for i in range(20)],
        "doc_id long, text string",
    )
    out = term_drift(old, new, top_k=5).collect()
    terms = [r["term"] for r in out]
    # the injected flood terms must rank at the top by |z|
    assert terms[0] == "flood", terms
    assert "boilerplate" in terms[:3]
    top = out[0]
    assert top["c_old"] == 0 and top["c_new"] == 60
    assert top["z"] > 0
    # steady-state vocab drifts NEGATIVE (its relative share is diluted
    # by the flood) and with smaller magnitude than the flood itself
    by_term = {r["term"]: r for r in out}
    if "common" in by_term:
        assert by_term["common"]["z"] < 0
        assert abs(by_term["common"]["z"]) < abs(top["z"])


def test_term_drift_is_symmetric_under_swap(spark):
    from tsne_flink_spark.pipeline.curation import term_drift

    a = spark.createDataFrame(
        [(1, "x y z"), (2, "x y")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(1, "x y z"), (2, "x q q q")], "doc_id long, text string"
    )
    fwd = {r["term"]: r["z"] for r in term_drift(a, b, top_k=10).collect()}
    rev = {r["term"]: r["z"] for r in term_drift(b, a, top_k=10).collect()}
    for t in fwd:
        assert abs(fwd[t] + rev[t]) < 1e-9, (t, fwd[t], rev[t])


def test_decontaminate_fuzzy_catches_paraphrase_exact_misses(spark):
    """The motivating case: a light paraphrase of an eval doc shares NO
    word 5-gram (exact decontaminate misses it) but sits far above 0.5
    shingle-Jaccard (fuzzy flags it)."""
    from tsne_flink_spark.pipeline.curation import (
        decontaminate,
        decontaminate_fuzzy,
        decontaminate_fuzzy_invariants,
    )

    # 40-token eval doc; the paraphrase swaps one word roughly every 12
    # tokens, so no 13-gram (the GPT-3 decontamination window) survives
    # while ~3/4 of the 3-shingles do — Jaccard ~0.6.  (At ngram_n=5 the
    # exact rule is strictly MORE sensitive than fuzzy@0.5: zero shared
    # 5-grams mathematically bounds 3-shingle Jaccard below ~0.5, which
    # is why the realistic pairing is long-n exact + fuzzy.)
    words = [f"w{i}" for i in range(40)]
    eval_text = " ".join(words)
    changed = list(words)
    for pos in (9, 21, 33):
        changed[pos] = f"x{pos}"
    paraphrase = " ".join(changed)
    train = spark.createDataFrame(
        [
            (1, paraphrase),
            (2, "completely unrelated text about database join planning"),
        ],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, holdout, ngram_n=13).collect()
    }
    fuzzy = {
        r["doc_id"]: r
        for r in decontaminate_fuzzy(train, holdout, threshold=0.5).collect()
    }
    assert exact[1] == 0                      # exact 5-gram rule misses it
    assert fuzzy[1]["contaminated_fuzzy"] == 1  # fuzzy catches it
    assert fuzzy[1]["max_jaccard"] > 0.5
    assert fuzzy[2]["contaminated_fuzzy"] == 0
    assert fuzzy[2]["n_holdout_matches"] == 0
    inv = decontaminate_fuzzy_invariants(
        train, holdout, threshold=0.5
    ).collect()[0]
    assert all(v == 0 for v in inv.asDict().values()), inv


def test_leakage_safe_split_families_never_span_splits(spark):
    """The operator's reason to exist: every near-duplicate family lands
    in exactly ONE split (a per-doc random split would leak twins across
    train/test); all docs assigned; deterministic across invocations;
    ratios respected in aggregate on singleton-heavy data."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.curation import leakage_safe_split

    rows = []
    # 30 duplicate families of 3 near-identical docs + 210 singletons
    for f in range(30):
        base = f"shared family text number {f} lorem ipsum dolor sit amet"
        rows += [
            (f * 3, base),
            (f * 3 + 1, base + " extra"),
            (f * 3 + 2, base.replace("lorem", "lorem lorem")),
        ]
    rows += [(1000 + i, f"totally unique document {i} {i * 7} {i * 13}")
             for i in range(210)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = leakage_safe_split(docs, threshold=0.4).collect()
    assert len(out) == len(rows)
    by_family: dict = {}
    for r in out:
        by_family.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_family.values())  # no family spans
    n_fams = len(by_family)
    assert n_fams <= 30 + 210  # families merged, never split
    splits = {s for ss in by_family.values() for s in ss}
    assert splits <= {"train", "val", "test"}
    counts = {s: sum(1 for r in out if r["split"] == s) for s in splits}
    assert counts.get("train", 0) > 0.7 * len(rows)  # ~90% target
    # deterministic replay
    again = {(r["doc_id"], r["split"]) for r in
             leakage_safe_split(docs, threshold=0.4).collect()}
    assert again == {(r["doc_id"], r["split"]) for r in out}


def test_leakage_safe_split_rejects_bad_ratios(spark):
    import pytest as _pytest

    from tsne_flink_spark.pipeline.curation import leakage_safe_split

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(docs, ratios={"train": 0.5, "test": 0.1})
