"""Tests for the training-data-pipeline operators (dedup, similarity, text,
multimodal) on small in-memory corpora."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog", "en", "s0"),
        (1, "The quick brown fox jumps over the lazy dog", "en", "s1"),  # exact dup of 0
        (2, "The quick brown fox leaps over the lazy dog", "en", "s2"),  # near dup of 0
        (3, "Der schnelle braune Fuchs springt und das ist gut", "de", "s0"),
        (4, "Completely different text about spark and data processing", "en", "s1"),
        (5, "the  QUICK   brown fox jumps over the lazy dog", "en", "s3"),  # ws/case dup of 0
        (6, "Le renard brun rapide saute et c'est tres bien pour le chien", "fr", "s2"),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )


def test_exact_dedup(spark, docs):
    from tsne_flink_spark.pipeline.dedup import exact_dedup

    out = exact_dedup(docs)
    ids = {r["doc_id"] for r in out.collect()}
    # 1 and 5 are normalized duplicates of 0; lowest id survives
    assert 0 in ids and 1 not in ids and 5 not in ids
    assert ids == {0, 2, 3, 4, 6}


def test_minhash_lsh_dedup(spark, docs):
    from tsne_flink_spark.pipeline.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(docs, threshold=0.5)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 not in ids  # exact dup caught
    assert 0 in ids
    assert 4 in ids  # unrelated text survives


def test_ngram_jaccard_pairs(spark, docs):
    from tsne_flink_spark.pipeline.dedup import ngram_jaccard_pairs

    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.4, shingle_n=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and 0.4 <= pairs[(0, 2)] < 1.0
    assert (0, 4) not in pairs


def test_simhash_dedup(spark, docs):
    from tsne_flink_spark.pipeline.dedup import simhash_dedup

    out = simhash_dedup(docs, max_hamming=3)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 not in ids  # identical text -> identical simhash
    assert 0 in ids and 4 in ids


def test_simhash_column_values(spark, docs):
    from tsne_flink_spark.pipeline.dedup import simhash, simhash_table

    rows = docs.select("doc_id", simhash(F.col("text")).alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in rows}
    assert by_id[0] == by_id[1]  # same text, same fingerprint
    assert by_id[0] != by_id[4]
    # the bulk explode+groupBy path must agree bit-for-bit with the
    # array-fold Column expression
    bulk = {r["doc_id"]: r["simhash"] for r in simhash_table(docs).collect()}
    assert bulk == by_id


def test_embedding_cosine_dedup(spark):
    from tsne_flink_spark.pipeline.dedup import embedding_cosine_dedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = embedding_cosine_dedup(emb, threshold=0.99, num_planes=8, bands=4)
    ids = {r["vec_id"] for r in out.collect()}
    assert 1 not in ids
    assert ids == {0, 2, 3}


def test_embedding_dedup_recall(spark):
    """Banded sign-LSH candidate recall vs exact all-pairs cosine at the
    dedup threshold (0.95): gate >= 0.9 (VERDICT round-1 item 4)."""
    import numpy as np

    from tsne_flink_spark.pipeline.dedup import embedding_duplicate_pairs

    rng = np.random.default_rng(19)
    base = rng.normal(0, 1, (60, 32))
    rows = []
    vid = 0
    for i in range(60):
        rows.append((vid, base[i].tolist())); vid += 1
        # 2 perturbed near-copies per base vector (cosine mostly >= 0.95)
        for _ in range(2):
            rows.append((vid, (base[i] + rng.normal(0, 0.12, 32)).tolist()))
            vid += 1
    X = np.array([v for _, v in rows])
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    sims = Xn @ Xn.T
    exact = {
        (a, b)
        for a in range(len(rows))
        for b in range(a + 1, len(rows))
        if sims[a, b] >= 0.95
    }
    assert len(exact) >= 60  # the regime is non-trivial
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r["a"], r["b"])
        for r in embedding_duplicate_pairs(emb, threshold=0.95).collect()
    }
    assert got <= exact  # exact verification => precision 1
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, f"embedding dedup recall {recall:.2f}"


def test_brute_force_top_k(spark):
    from tsne_flink_spark.pipeline.similarity import brute_force_top_k

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = brute_force_top_k(emb, emb, k=1)
    best = {r["q"]: r["c"] for r in out.collect()}
    assert best[0] == 1 and best[1] == 0
    assert best[3] == 2  # least-negative cosine among others


def test_lsh_top_k_recall(spark):
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import brute_force_top_k, lsh_top_k

    rng = np.random.default_rng(11)
    # clustered data: the regime ANN is for (iid gaussian has no neighbor
    # structure and any LSH legitimately degrades to chance there)
    centers = rng.normal(0, 1, (8, 16))
    rows = [
        (i, (centers[i % 8] + rng.normal(0, 0.15, 16)).tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {(r["q"], r["c"]) for r in brute_force_top_k(emb, emb, 3).collect()}
    approx = {
        (r["q"], r["c"])
        for r in lsh_top_k(emb, emb, 3, num_planes=10, probe_flips=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall {recall:.2f}"


def test_ivf_top_k_shapes(spark):
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import ivf_top_k

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = ivf_top_k(emb, emb, 2, n_lists=4, n_probe=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q"], []).append(r["c"])
    assert all(len(cs) <= 2 for cs in by_q.values())
    assert len(by_q) >= 40  # nearly every query got candidates


def test_ivf_top_k_n_corpus_hint(spark):
    """A caller-supplied n_corpus skips the count scan and yields the same
    result as the counted path (the count only sizes lists/sampling)."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import ivf_top_k

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    counted = ivf_top_k(emb, emb, 2, n_lists=4, n_probe=2).collect()
    hinted = ivf_top_k(emb, emb, 2, n_lists=4, n_probe=2, n_corpus=50).collect()
    assert sorted(map(tuple, counted)) == sorted(map(tuple, hinted))


def test_ivf_top_k_recall(spark):
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import brute_force_top_k, ivf_top_k

    rng = np.random.default_rng(11)
    # same clustered regime as the LSH recall gate
    centers = rng.normal(0, 1, (8, 16))
    rows = [
        (i, (centers[i % 8] + rng.normal(0, 0.15, 16)).tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {(r["q"], r["c"]) for r in brute_force_top_k(emb, emb, 3).collect()}
    approx = {
        (r["q"], r["c"])
        for r in ivf_top_k(emb, emb, 3, n_lists=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF recall {recall:.2f}"


def test_text_analysis(spark, docs):
    from tsne_flink_spark.pipeline.text import analyze_documents

    out = {r["doc_id"]: r for r in analyze_documents(docs).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[5]["n_tokens"] == 9  # multi-space safe
    assert out[0]["fingerprint"] == out[5]["fingerprint"]  # normalized
    assert out[0]["lang_pred"] == "en"
    assert out[3]["lang_pred"] == "de"
    assert out[6]["lang_pred"] == "fr"
    assert 0.0 <= out[0]["quality"] <= 1.0


def test_multimodal_features(spark, docs):
    from tsne_flink_spark.pipeline.multimodal import (
        attach_binary_payload,
        extract_image_features,
        sample_frames,
    )

    with_payload = attach_binary_payload(docs)
    feats = {r["doc_id"]: r for r in extract_image_features(with_payload).collect()}
    assert set(feats) == {0, 1, 2, 3, 4, 5, 6}
    assert len(feats[0]["features"]) == 16
    # identical text -> identical payload -> identical decode
    assert feats[0]["mean_r"] == feats[1]["mean_r"]
    frames = sample_frames(with_payload, n_frames=3).collect()
    assert len(frames) == 7 * 3


def test_decode_image_roundtrip():
    import numpy as np

    from tsne_flink_spark.pipeline.multimodal import decode_image, encode_ppm

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img)) == img).all()
    gray = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_image(encode_ppm(gray))
    assert out.shape == (5, 9, 3)
    assert (out[:, :, 0] == gray).all() and (out[:, :, 2] == gray).all()


def test_decode_image_header_variants():
    import numpy as np

    from tsne_flink_spark.pipeline.multimodal import decode_image

    # comments + arbitrary whitespace in the header are legal Netpbm
    raster = bytes(range(2 * 2 * 3))
    payload = b"P6 # a comment\n# another\n 2\t2\n255\n" + raster
    img = decode_image(payload)
    assert img.shape == (2, 2, 3)
    assert img.ravel().tolist() == list(raster)
    # 16-bit big-endian maxval scales down to 8-bit
    import struct

    raster16 = struct.pack(">12H", *([65535, 0, 32768] * 4))
    img16 = decode_image(b"P6\n2 2\n65535\n" + raster16)
    assert img16.ravel().tolist() == [255, 0, 127] * 4


def test_decode_image_rejects_unknown_formats():
    from tsne_flink_spark.pipeline.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"\x00\x01")
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")  # real PNG magic: loud, not wrong


def test_decode_image_small_maxval_rescales():
    """Netpbm samples span 0..maxval — a maxval=15 PGM must rescale to the
    full 8-bit range (was ~17x too dark), and maxval=0 is rejected."""
    from tsne_flink_spark.pipeline.multimodal import decode_image

    img = decode_image(b"P5\n2 2\n15\n" + bytes([0, 5, 10, 15]))
    assert img[:, :, 0].ravel().tolist() == [0, 85, 170, 255]
    with pytest.raises(ValueError):
        decode_image(b"P5\n2 2\n0\n" + bytes(4))


def test_tfidf_top_terms(spark, docs):
    import math

    from tsne_flink_spark.pipeline.tfidf import tf_idf, top_terms_per_doc

    scored = {
        (r["doc_id"], r["term"]): r for r in tf_idf(docs).collect()
    }
    # "the" appears twice in doc 0; smoothed idf = ln((1+7)/(1+df)) + 1
    df_the = len({d for (d, t) in scored if t == "the"})
    r = scored[(0, "the")]
    assert r["tf"] == 2
    assert r["idf"] == pytest.approx(math.log(8 / (1 + df_the)) + 1)
    assert r["tfidf"] == pytest.approx(r["tf"] * r["idf"])

    top = top_terms_per_doc(docs, k=3).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 3 for v in by_doc.values())
    # ranks are 1..k and ordered by descending weight
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["rn"])
        ws = [r["tfidf"] for r in rows]
        assert ws == sorted(ws, reverse=True)


def test_tfidf_cosine_pairs(spark, docs):
    from tsne_flink_spark.pipeline.tfidf import tfidf_cosine_pairs

    pairs = {
        (r["a"], r["b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    # identical documents -> cosine 1
    assert pairs[(0, 1)] == pytest.approx(1.0)
    # near-dup scores above the unrelated pair
    assert pairs[(0, 2)] > pairs.get((0, 4), 0.0)
    # symmetric emission is deduplicated: only a < b pairs
    assert all(a < b for (a, b) in pairs)


def test_sliding_user_activity_exact(spark):
    import datetime as dt

    from tsne_flink_spark.streaming.events import sliding_user_activity

    base = dt.datetime(2024, 1, 1, 0, 45, 0)
    rows = [
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=30), 2, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {
        r["window_start"]: r["n_users"]
        for r in sliding_user_activity(ev, "1 hour", "30 minutes", exact=True).collect()
    }
    # event at 00:45 lands in windows starting 00:00 and 00:30; event at
    # 01:15 in 00:30 and 01:00 -> the 00:30 window sees both users
    assert out[dt.datetime(2024, 1, 1, 0, 30)] == 2
    assert out[dt.datetime(2024, 1, 1, 0, 0)] == 1
    assert out[dt.datetime(2024, 1, 1, 1, 0)] == 1


def test_resize_images(spark, docs):
    from tsne_flink_spark.pipeline.multimodal import attach_binary_payload, resize_images

    with_payload = attach_binary_payload(docs)
    out = {r["doc_id"]: r for r in resize_images(with_payload, 4, 6).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6}
    from tsne_flink_spark.pipeline.multimodal import decode_image

    for r in out.values():
        assert r["height"] == 4 and r["width"] == 6
        assert decode_image(bytes(r["payload"])).shape == (4, 6, 3)
    # identical source text -> identical payload -> identical resize
    assert bytes(out[0]["payload"]) == bytes(out[1]["payload"])


def test_rolling_fingerprint(spark, docs):
    from tsne_flink_spark.pipeline.text import rolling_fingerprint

    out = {
        r["doc_id"]: r["fp"]
        for r in docs.select(
            "doc_id", rolling_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    # whitespace/case-normalized duplicates collide; different docs don't
    assert out[0] == out[1] == out[5]
    assert out[0] != out[4]
    # order sensitivity: reversed token stream hashes differently
    rev = spark.createDataFrame(
        [(0, "dog lazy the over jumps fox brown quick The")], "doc_id bigint, text string"
    )
    rfp = rev.select(rolling_fingerprint(F.col("text")).alias("fp")).head()["fp"]
    assert rfp != out[0]
    with pytest.raises(ValueError):
        docs.select(rolling_fingerprint(F.col("text"), mod=2**61 - 1))


def test_winnow_fingerprints(spark):
    from tsne_flink_spark.pipeline.text import winnow_fingerprints

    k, w = 8, 4
    shared = "a distinctive shared passage of text"  # len 36 >= k+w-1
    d = spark.createDataFrame(
        [
            (0, f"first document begins here. {shared}. then diverges xyz"),
            (1, f"totally other opening words! {shared}! unrelated ending"),
            (2, "no overlap with anything else qqqq wwww eeee rrrr tttt"),
            (3, "short"),  # < k+w-1 chars -> no fingerprints
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = winnow_fingerprints(d, k=k, w=w, id_col="doc_id")
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["doc_id"], set()).add(r["fp"])
    # MOSS guarantee: a shared substring of length >= k+w-1 contributes at
    # least one common fingerprint
    assert by_id[0] & by_id[1]
    # an unrelated doc shares nothing with either
    assert not (by_id[2] & by_id[0]) and not (by_id[2] & by_id[1])
    # sub-threshold and empty docs emit no rows
    assert 3 not in by_id and 4 not in by_id
    # (doc_id, fp) rows are distinct (array_distinct before explode)
    assert out.count() == out.distinct().count()
    # hash value parity with the independent reference implementation
    txt = "abcdefghijkl"
    codes = [ord(c) for c in txt]
    grams = []
    for i in range(len(codes) - k + 1):
        h = 0
        for c in codes[i : i + k]:
            h = (h * 257 + c) % 1_000_000_007
        grams.append(h)
    want = set()
    for j in range(len(grams) - w + 1):
        want.add(min(grams[j : j + w]))
    got = {
        r["fp"]
        for r in winnow_fingerprints(
            spark.createDataFrame([(9, txt)], "doc_id bigint, text string"),
            k=k,
            w=w,
            id_col="doc_id",
        ).collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        winnow_fingerprints(d, id_col="doc_id", mod=2**61 - 1)


def test_winnow_overlap_pairs(spark):
    from tsne_flink_spark.pipeline.text import winnow_overlap_pairs

    passage = "an unmistakably shared long passage occurring in two documents"
    d = spark.createDataFrame(
        [
            (0, f"doc zero header. {passage}. zero trailer aaaa"),
            (1, f"doc one intro!! {passage}! one footer bbbb"),
            (2, "entirely disjoint content with nothing in common cccc dddd"),
        ],
        "doc_id bigint, text string",
    )
    out = winnow_overlap_pairs(d, min_shared=2, max_df=None, id_col="doc_id")
    rows = {(r["a"], r["b"]): r["n_shared"] for r in out.collect()}
    assert (0, 1) in rows and rows[(0, 1)] >= 2
    assert all(2 not in pair for pair in rows)
    # stop-fingerprint cap: replicate the passage into every doc -> its
    # fingerprints exceed max_df and the pairs they carried disappear
    d3 = spark.createDataFrame(
        [(i, f"filler {i} text. {passage}. tail {i}") for i in range(4)],
        "doc_id bigint, text string",
    )
    capped = winnow_overlap_pairs(d3, min_shared=2, max_df=2, id_col="doc_id")
    uncapped = winnow_overlap_pairs(d3, min_shared=2, max_df=None, id_col="doc_id")
    assert uncapped.count() == 6  # all 4-choose-2 pairs share the passage
    assert capped.count() == 0


def test_dedup_invariant_checks(spark, docs):
    """The soundness/completeness invariant counters must be exactly (0, 0)
    on any corpus — these back the *_dedup_check driver oracles."""
    from tsne_flink_spark.pipeline.dedup import (
        minhash_dedup_invariants,
        simhash_dedup_invariants,
    )

    r = minhash_dedup_invariants(docs, threshold=0.5).head()
    assert (r["unjustified_kills"], r["missed_candidates"]) == (0, 0)
    r = simhash_dedup_invariants(docs, max_hamming=10).head()
    assert (r["unjustified_kills"], r["missed_candidates"]) == (0, 0)


def test_embedding_dedup_invariant_check(spark):
    import numpy as np

    from tsne_flink_spark.pipeline.dedup import embedding_dedup_invariants

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8))
    # append near-duplicates of the first five vectors
    vecs = np.concatenate([base, base[:5] + rng.normal(0, 1e-3, (5, 8))])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    r = embedding_dedup_invariants(emb, threshold=0.98).head()
    assert (r["unjustified_kills"], r["missed_candidates"]) == (0, 0)


def test_decode_image_malformed_inputs_fail_loudly():
    """Truncated or corrupt Netpbm payloads must raise, never return a
    silently wrong array (the pipeline's multimodal rows are untrusted
    bytes at 100 TB)."""
    import numpy as np
    import pytest as _pytest

    from tsne_flink_spark.pipeline.multimodal import decode_image, encode_ppm

    good = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    for payload in (
        b"",                          # empty
        b"P6",                        # header only
        b"P6\n4 4\n255\n" + b"\x00" * 5,  # truncated raster
        b"P6\n4 4\n999999\n" + b"\x00" * 48,  # invalid maxval
        b"P6\nx y\n255\n",            # non-numeric dims
        good[:-1],                    # one byte short
    ):
        with _pytest.raises(ValueError):
            decode_image(payload)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_dedup_invariants_both_scales(spark, sf_dir):
    """The three LSH dedup operators' zero-row invariants, at the driver's
    correctness scale AND at sf0.1 (VERDICT r4 #8): band mistuning or a
    candidate-spread regression that only bites at larger N should fail CI,
    not wait for the per-round driver check.  Soundness = every killed doc
    has a justifying surviving neighbor (exact similarity recomputed from
    scratch); completeness = no surviving pair both collides and exceeds
    the threshold."""
    import os

    if not os.path.exists(f"{sf_dir}/documents.parquet"):
        pytest.skip("testdata not present")
    from tsne_flink_spark.pipeline.dedup import (
        embedding_dedup_invariants,
        minhash_dedup_invariants,
        simhash_dedup_invariants,
    )
    from tsne_flink_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    for name, df in [
        ("minhash", minhash_dedup_invariants(docs, threshold=0.8)),
        ("simhash", simhash_dedup_invariants(docs)),
        ("embedding", embedding_dedup_invariants(emb, threshold=0.98)),
    ]:
        row = df.head()
        assert row["unjustified_kills"] == 0, (name, sf_dir, row)
        assert row["missed_candidates"] == 0, (name, sf_dir, row)


def test_containment_pairs_finds_quotes_jaccard_misses(spark):
    from tsne_flink_spark.pipeline.dedup import (
        containment_pairs,
        jaccard_similarity,
        shingles,
    )

    long_doc = " ".join(f"tok{i}" for i in range(40))
    quote = " ".join(f"tok{i}" for i in range(12))  # 30% excerpt
    docs = spark.createDataFrame(
        [(1, long_doc), (2, quote), (3, "entirely different words here now")],
        "doc_id long, text string",
    )
    out = {
        (r["container"], r["contained"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) in out and out[(1, 2)] == 1.0   # quote fully contained
    assert (2, 1) not in out                       # asymmetric
    assert all(a != 3 and b != 3 for a, b in out)
    # and symmetric Jaccard really would have missed it
    j = docs.where("doc_id = 1").select(
        shingles(F.col("text")).alias("a")
    ).crossJoin(
        docs.where("doc_id = 2").select(shingles(F.col("text")).alias("b"))
    ).select(jaccard_similarity(F.col("a"), F.col("b")).alias("j")).collect()[0]["j"]
    assert j < 0.5


def test_containment_df_cap_bounds_fanout(spark):
    """Docs sharing ONLY a corpus-common shingle (df > cap) produce no
    candidate pair — the documented stop-shingle trade."""
    from tsne_flink_spark.pipeline.dedup import containment_pairs

    common = "the common boilerplate footer"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words{i} here{i} " + common) for i in range(30)],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, threshold=0.3, max_df=10).collect()
    assert out == []


def test_pq_top_k_recall_and_exact_sims(spark):
    """IVF-PQ on clustered data (the regime ANN serves): decent recall vs
    brute force, and the reported sims must be EXACT cosines — PQ may only
    ever cost recall, never score fidelity (the rerank contract)."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import (
        brute_force_top_k,
        pq_top_k,
        topk_invariants,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (8, 16))
    rows = [
        (i, (centers[i % 8] + rng.normal(0, 0.15, 16)).tolist()) for i in range(80)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {(r["q"], r["c"]) for r in brute_force_top_k(emb, emb, 3).collect()}
    out = pq_top_k(emb, emb, 3, m=4, ksub=16, n_lists=8, n_probe=3)
    got = out.collect()
    approx = {(r["q"], r["c"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"PQ recall {recall:.2f}"
    inv = topk_invariants(
        spark.createDataFrame(got, out.schema), emb, k=3
    ).collect()[0]
    assert (
        inv["bad_sim"] == 0
        and inv["overfull_queries"] == 0
        and inv["self_matches"] == 0
        and inv["dup_pairs"] == 0
    ), inv.asDict()


def test_pq_top_k_m_clipped_to_dimension_divisor(spark):
    """dim=6 with requested m=4 must clip to m=3 (largest divisor) and
    still produce a valid top-k."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import pq_top_k

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(0, 1, 6).tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = pq_top_k(emb, emb, 2, m=4, ksub=8, n_lists=4, n_probe=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q"], []).append(r["c"])
    assert all(len(cs) <= 2 for cs in by_q.values())
    assert len(by_q) >= 30


def test_pq_top_k_tiny_corpus_exhaustive(spark):
    """Degenerate scale: a 3-vector corpus with every list probed must
    return the exact brute-force ranking (the grouped per-list candidate
    arrays and the uint8 code packing have no room to hide edge bugs at
    n=3: single-member lists, ksub clipped to the sample size)."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import (
        brute_force_top_k,
        pq_top_k,
    )

    rng = np.random.default_rng(5)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = sorted(
        (r["q"], r["c"]) for r in brute_force_top_k(emb, emb, 2).collect()
    )
    got = sorted(
        (r["q"], r["c"])
        for r in pq_top_k(
            emb, emb, 2, m=4, n_lists=3, n_probe=3, shortlist=3
        ).collect()
    )
    assert got == exact


def test_pq_top_k_ksub_clamp_warns(spark):
    """ksub > 256 cannot fit the packed-uint8 code path; the clamp must
    be VISIBLE (a warning naming the clamp), not silent, and the result
    must equal an explicit ksub=256 run."""
    import warnings

    import numpy as np

    from tsne_flink_spark.pipeline.similarity import pq_top_k

    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        clamped = pq_top_k(emb, emb, 2, m=4, ksub=1024, n_lists=4, n_probe=4)
        got = sorted((r["q"], r["c"]) for r in clamped.collect())
    assert any("ksub=1024 clamped to 256" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught_ok:
        warnings.simplefilter("always")
        explicit = pq_top_k(emb, emb, 2, m=4, ksub=256, n_lists=4, n_probe=4)
        want = sorted((r["q"], r["c"]) for r in explicit.collect())
    assert not [w for w in caught_ok if "clamped" in str(w.message)]
    assert got == want


def test_ivf_index_persist_lifecycle(spark, tmp_path):
    """build_ivf_index's artifact contract: write both index halves to
    parquet, read them back in fresh DataFrames, serve with
    ivf_query_index — the result must equal the one-shot ivf_top_k
    EXACTLY (array<double> is lossless through parquet, so sims are
    bit-equal), and the index schema must be the documented one."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import (
        build_ivf_index,
        ivf_query_index,
        ivf_top_k,
    )

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    centroids_df, index_df = build_ivf_index(emb, n_corpus=200)
    assert dict(index_df.dtypes) == {
        "vec_id": "bigint",
        "list": "int",
        "vec": "array<double>",
        "norm": "double",
    }
    centroids_df.write.parquet(str(tmp_path / "centroids"))
    index_df.write.parquet(str(tmp_path / "index"))

    served = ivf_query_index(
        emb,
        spark.read.parquet(str(tmp_path / "centroids")),
        spark.read.parquet(str(tmp_path / "index")),
        k=3,
    )
    direct = ivf_top_k(emb, emb, k=3, n_corpus=200)
    got = sorted((r["q"], r["c"], r["sim"]) for r in served.collect())
    want = sorted((r["q"], r["c"], r["sim"]) for r in direct.collect())
    assert got == want  # bit-equal, not approx
    assert len({g[0] for g in got}) >= 190  # nearly every query served


def test_ivf_index_append_lifecycle(spark, tmp_path):
    """append_to_ivf_index's contract: (1) appending rows for a new
    batch against the frozen quantizer equals what a full assignment of
    the union corpus with the SAME centroids would produce (per-row
    assignment is batch-invariant); (2) a query equal to an appended
    vector finds it at top-1 through the served index; (3) an empty
    centroid table raises."""
    import numpy as np
    import pytest as _pytest

    from tsne_flink_spark.pipeline.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_query_index,
    )

    rng = np.random.default_rng(23)
    base = [(i, rng.normal(0, 1, 16).tolist()) for i in range(200)]
    new = [(1000 + i, rng.normal(0, 1, 16).tolist()) for i in range(40)]
    emb = spark.createDataFrame(base, "vec_id bigint, embedding array<double>")
    newdf = spark.createDataFrame(new, "vec_id bigint, embedding array<double>")

    centroids_df, index_df = build_ivf_index(emb, n_corpus=200)
    appended = append_to_ivf_index(centroids_df, newdf)
    # batch-invariance vs assigning the union in one pass
    uni = append_to_ivf_index(centroids_df, emb.unionByName(newdf))
    got = sorted(
        (r["vec_id"], r["list"], tuple(r["vec"]), r["norm"])
        for r in index_df.unionByName(appended).collect()
    )
    want = sorted(
        (r["vec_id"], r["list"], tuple(r["vec"]), r["norm"])
        for r in uni.collect()
    )
    assert got == want

    # an appended vector is served: query with its exact embedding
    probe = spark.createDataFrame([new[0]], "vec_id bigint, embedding array<double>")
    probe = probe.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    served = ivf_query_index(
        probe, centroids_df, index_df.unionByName(appended), k=1
    ).collect()
    assert len(served) == 1 and served[0]["c"] == new[0][0]
    assert served[0]["sim"] == pytest.approx(1.0, abs=1e-9)

    empty = spark.createDataFrame([], "list int, centroid array<double>")
    with _pytest.raises(ValueError):
        append_to_ivf_index(empty, newdf)


def test_pq_index_append_lifecycle(spark):
    """append_to_pq_index's contract: (1) re-encoding the ORIGINAL
    corpus against the frozen model reproduces the build's own codes
    bit-exactly (encoding is per-row and deterministic); (2) a query
    equal to an appended vector retrieves it through the served index;
    (3) an empty model raises."""
    import numpy as np
    import pytest as _pytest

    from tsne_flink_spark.pipeline.similarity import (
        append_to_pq_index,
        build_pq_index,
        pq_query_index,
    )

    rng = np.random.default_rng(29)
    base = [(i, rng.normal(0, 1, 16).tolist()) for i in range(150)]
    new = [(1000 + i, rng.normal(0, 1, 16).tolist()) for i in range(30)]
    emb = spark.createDataFrame(base, "vec_id bigint, embedding array<double>")
    newdf = spark.createDataFrame(new, "vec_id bigint, embedding array<double>")

    model_df, codes_df = build_pq_index(emb, m=4, ksub=16, n_corpus=150)
    # frozen-model re-encode of the base corpus == the build's own codes
    re_enc = append_to_pq_index(model_df, emb)
    got = sorted(
        (r["vec_id"], r["list"], bytes(r["code"]), r["rnorm"])
        for r in re_enc.collect()
    )
    want = sorted(
        (r["vec_id"], r["list"], bytes(r["code"]), r["rnorm"])
        for r in codes_df.collect()
    )
    assert got == want

    appended = append_to_pq_index(model_df, newdf)
    full_corpus = emb.unionByName(newdf)
    probe = spark.createDataFrame(
        [(2_000_000, new[0][1])], "vec_id bigint, embedding array<double>"
    )
    served = pq_query_index(
        probe,
        model_df,
        codes_df.unionByName(appended),
        full_corpus,
        k=1,
    ).collect()
    assert len(served) == 1 and served[0]["c"] == new[0][0]
    assert served[0]["sim"] == pytest.approx(1.0, abs=1e-9)

    empty = spark.createDataFrame(
        [], "part string, a int, b int, vec array<double>"
    )
    with _pytest.raises(ValueError):
        append_to_pq_index(empty, newdf)


def test_pq_index_persist_lifecycle(spark, tmp_path):
    """build_pq_index's artifact contract: write the model (coarse
    centroids + residual codebooks) and the coded corpus to parquet,
    read them back fresh, serve with pq_query_index — the result must
    equal the one-shot pq_top_k EXACTLY (same seed ⇒ same model; floats
    and packed uint8 codes are lossless through parquet)."""
    import numpy as np

    from tsne_flink_spark.pipeline.similarity import (
        build_pq_index,
        pq_query_index,
        pq_top_k,
    )

    rng = np.random.default_rng(17)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(150)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    model_df, codes_df = build_pq_index(emb, m=4, ksub=16, n_corpus=150)
    assert dict(codes_df.dtypes) == {
        "vec_id": "bigint",
        "list": "int",
        "code": "binary",
        "rnorm": "double",
    }
    model_df.write.parquet(str(tmp_path / "model"))
    codes_df.write.parquet(str(tmp_path / "codes"))

    served = pq_query_index(
        emb,
        spark.read.parquet(str(tmp_path / "model")),
        spark.read.parquet(str(tmp_path / "codes")),
        emb,
        k=3,
        n_probe=4,
    )
    direct = pq_top_k(emb, emb, 3, m=4, ksub=16, n_probe=4, n_corpus=150)
    got = sorted((r["q"], r["c"], r["sim"]) for r in served.collect())
    want = sorted((r["q"], r["c"], r["sim"]) for r in direct.collect())
    assert got == want
    assert len({g[0] for g in got}) >= 140


def test_build_pq_index_empty_corpus_raises(spark):
    from tsne_flink_spark.pipeline.similarity import build_pq_index

    import pytest as _pytest

    emb = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    with _pytest.raises(ValueError, match="empty corpus"):
        build_pq_index(emb)
