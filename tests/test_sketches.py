"""Misra-Gries heavy hitters (pipeline/sketches.py): the two-phase
candidate + exact-confirm pipeline must equal the brute-force answer on
any partitioning, and the MG compression must honor its guarantee."""

import numpy as np
import pytest


def _brute(rows, k):
    from collections import Counter

    c = Counter()
    for _, text in rows:
        c.update(text.lower().split())
    n = sum(c.values())
    return {t: m for t, m in c.items() if m * k > n}


@pytest.mark.parametrize("parts", [1, 7])
def test_heavy_hitters_exact_vs_brute(spark, parts):
    from tsne_flink_spark.pipeline.sketches import heavy_hitters

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for d in range(120):
        words = list(rng.choice(vocab, 30))
        # plant genuine heavy hitters
        words += ["hot"] * 20 + (["warm"] * 8 if d % 2 == 0 else [])
        rows.append((d, " ".join(words)))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).repartition(parts)
    for k in (10, 50):
        got = {r["term"]: r["n"] for r in heavy_hitters(docs, k=k).collect()}
        assert got == _brute(rows, k), k


def test_heavy_hitters_boundary_is_strict(spark):
    """n * k == N must NOT qualify (strict >, integer arithmetic)."""
    from tsne_flink_spark.pipeline.sketches import heavy_hitters

    # 10 tokens total, k=5: threshold is n*5 > 10, i.e. n >= 3
    rows = [(0, "a a b b c c d d e f")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert heavy_hitters(docs, k=5).collect() == []
    rows = [(0, "a a a b b c c d e f")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["term"]: r["n"] for r in heavy_hitters(docs, k=5).collect()}
    assert got == {"a": 3}


def test_mg_compress_guarantee():
    """Any term with count > N/k survives a full MG pass regardless of
    interleaving (the pigeonhole half of the module-doc proof)."""
    from tsne_flink_spark.pipeline.sketches import _mg_compress

    rng = np.random.default_rng(3)
    k = 8
    stream = list(rng.choice([f"t{i}" for i in range(100)], 3000))
    stream += ["H"] * 500  # 500 > 3500/8
    rng.shuffle(stream)
    counts: dict = {}
    for i in range(0, len(stream), 97):  # uneven batches
        batch = stream[i : i + 97]
        for t in batch:
            counts[t] = counts.get(t, 0) + 1
        counts = _mg_compress(counts, k)
    assert "H" in counts
    assert len(counts) <= k


def test_heavy_hitters_empty_and_unicode(spark):
    from tsne_flink_spark.pipeline.sketches import heavy_hitters

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "é é é é ok")],
        "doc_id bigint, text string",
    )
    got = {r["term"]: r["n"] for r in heavy_hitters(docs, k=2).collect()}
    assert got == {"é": 4}  # 4*2 > 5


def test_streaming_heavy_hitters_state_merge(spark, tmp_path):
    """Micro-batch MG merge: a term heavy across batches (never dominant
    within one) must survive in the persisted summary; per-state row
    budget stays <= k."""
    import json
    import os
    import time

    from tsne_flink_spark.pipeline.sketches import streaming_heavy_hitters

    in_dir = tmp_path / "docs_in"
    state_dir = str(tmp_path / "hh_state")
    os.makedirs(in_dir)

    stream = spark.readStream.schema("doc_id long, text string").json(
        str(in_dir)
    )
    q = streaming_heavy_hitters(
        stream, state_dir, k=8,
        checkpoint_dir=str(tmp_path / "ckpt_hh"),
    )

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for i, text in rows:
                f.write(json.dumps({"doc_id": i, "text": text}) + "\n")

    try:
        rng_words = [f"w{i}" for i in range(40)]
        write_batch(
            "b1.jsonl",
            [(i, " ".join(rng_words[i % 40 : i % 40 + 6]) + " hot hot")
             for i in range(20)],
        )
        q.processAllAvailable()
        write_batch(
            "b2.jsonl",
            [(100 + i, " ".join(rng_words[(7 * i) % 40 : (7 * i) % 40 + 6])
              + " hot hot hot")
             for i in range(20)],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    batches = sorted(
        int(d.split("=")[1])
        for d in os.listdir(state_dir)
        if d.startswith("batch=")
    )
    assert len(batches) >= 2
    final = {
        r["term"]: r["n"]
        for r in spark.read.parquet(
            f"{state_dir}/batch={batches[-1]}"
        ).collect()
    }
    assert len(final) <= 8
    assert "hot" in final  # 100 occurrences across batches, the global max


def test_sketch_union_equals_single_shot(spark):
    """Re-unioning per-shard HLL sketches must estimate exactly what one
    sketch over all rows estimates (register max is associative over any
    partitioning of the rows), and land on the exact distinct count for a
    small cardinality."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import sketch_shards, sketch_union

    df = spark.range(5000).select(
        "id", (F.col("id") % 3).alias("k"), (F.col("id") % 211).alias("u")
    )
    # shard by row id, NOT by value: the same u lands in several shards,
    # so the union actually has overlapping registers to reconcile
    shards = sketch_shards(df, ["k"], "u", F.pmod(F.col("id"), F.lit(7)))
    assert shards.count() == 21
    merged = {
        r["k"]: (r["n_shards"], r["est_distinct"])
        for r in sketch_union(shards, ["k"]).collect()
    }
    single = {
        r["k"]: r["e"]
        for r in df.groupBy("k")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("u")).alias("e"))
        .collect()
    }
    exact = {
        r["k"]: r["e"]
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("e")).collect()
    }
    for k in exact:
        assert merged[k][0] == 7
        assert merged[k][1] == single[k]          # associativity
        assert merged[k][1] == exact[k]           # small-cardinality exact


def test_sketch_union_survives_parquet_roundtrip(spark, tmp_path):
    """The pattern sketch_shards SELLS — persist kilobyte sketches per
    ingestion shard, re-union them later without rescanning the fact
    rows — exercised end-to-end: write the binary sketch column to
    parquet, read it back in a FRESH DataFrame, union that.  The
    roundtripped union must be bit-identical to the in-plan union
    (parquet must not disturb the DataSketches binary), land within 15%
    of the exact distinct count, and stay register-monotone (>= every
    member shard's estimate)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import sketch_shards, sketch_union

    df = spark.range(20000).select(
        "id", (F.col("id") % 4).alias("k"), (F.col("id") % 997).alias("u")
    )
    # hash-shard, NOT id % 8: that would be correlated with k = id % 4
    # (only 2 residues mod 8 per k), collapsing the shards-per-key count
    shards = sketch_shards(df, ["k"], "u", F.pmod(F.xxhash64("id"), F.lit(8)))
    store = str(tmp_path / "sketch_store")
    shards.write.parquet(store)

    persisted = spark.read.parquet(store)
    assert dict(persisted.dtypes)["sketch"] == "binary"
    in_plan = {
        r["k"]: (r["n_shards"], r["est_distinct"])
        for r in sketch_union(shards, ["k"]).collect()
    }
    from_disk = {
        r["k"]: (r["n_shards"], r["est_distinct"])
        for r in sketch_union(persisted, ["k"]).collect()
    }
    assert from_disk == in_plan  # bit-identical registers after roundtrip

    exact = {
        r["k"]: r["e"]
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("e")).collect()
    }
    shard_max = {
        r["k"]: r["m"]
        for r in persisted.groupBy("k")
        .agg(F.max("shard_estimate").alias("m"))
        .collect()
    }
    for k, e in exact.items():
        n_shards, est = from_disk[k]
        assert n_shards == 8
        assert abs(est - e) / e <= 0.15
        assert est >= shard_max[k]


def test_streaming_sketch_shards_union_matches_exact(spark, tmp_path):
    """Streaming producer for the persisted HLL lifecycle: two JSONL
    micro-batches land as two shard directories; re-unioning the WHOLE
    store gives per-key estimates equal to the exact distinct counts of
    everything ingested (small cardinalities are exact in HLL), with one
    shard row per (key, batch)."""
    import json
    import os
    import time

    from tsne_flink_spark.pipeline.sketches import (
        sketch_union,
        streaming_sketch_shards,
    )

    in_dir = tmp_path / "ev_in"
    store = str(tmp_path / "sketch_store")
    os.makedirs(in_dir)

    stream = spark.readStream.schema("k string, u long").json(str(in_dir))
    q = streaming_sketch_shards(
        stream, store, ["k"], "u",
        checkpoint_dir=str(tmp_path / "ckpt_sk"),
    )

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for k, u in rows:
                f.write(json.dumps({"k": k, "u": u}) + "\n")

    try:
        # batch 1: a 0..39, b 0..19; batch 2 overlaps a 20..59, b 10..29
        write_batch("b1.json", [("a", i) for i in range(40)]
                    + [("b", i) for i in range(20)])
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=0"):
            time.sleep(0.5)
        write_batch("b2.json", [("a", i) for i in range(20, 60)]
                    + [("b", i) for i in range(10, 30)])
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=1"):
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    shards = spark.read.parquet(store)
    assert shards.count() == 4  # 2 keys x 2 batches
    got = {
        r["k"]: (r["n_shards"], r["est_distinct"])
        for r in sketch_union(shards, ["k"]).collect()
    }
    # exact at these cardinalities: a = |0..59| = 60, b = |0..29| = 30
    assert got == {"a": (2, 60), "b": (2, 30)}
