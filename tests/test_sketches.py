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


# ---------------------------------------------------------------------------
# KMV / theta sketches (kmv_sketch / kmv_union / kmv_overlap_estimates)
# ---------------------------------------------------------------------------


def _kmv_rows(spark, values, label="s", parts=4):
    return spark.createDataFrame(
        [(label, int(v)) for v in values], "k string, v long"
    ).repartition(parts)


def test_kmv_exact_below_k(spark):
    """< k distinct values: the sketch holds EVERY distinct hash (the LCG
    is a bijection mod 2^31) and the estimate is exactly the distinct
    count, regardless of duplication."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import kmv_estimate, kmv_sketch

    df = _kmv_rows(spark, list(range(40)) * 3)  # 120 rows, 40 distinct
    sk = kmv_sketch(df, ["k"], "v", k=64)
    row = sk.select(
        F.size("kmv").alias("n"), kmv_estimate(F.col("kmv"), 64).alias("est")
    ).first()
    assert row.n == 40 and row.est == 40.0


@pytest.mark.parametrize("parts", [1, 13])
def test_kmv_partition_independent(spark, parts):
    """The k-minimum statistic is a pure function of the value SET: any
    partitioning (and the per-partition partial pass) yields the
    identical sketch array."""
    from tsne_flink_spark.pipeline.sketches import kmv_sketch

    vals = [v * 7919 % 100003 for v in range(5000)]
    a = kmv_sketch(_kmv_rows(spark, vals, parts=parts), ["k"], "v", k=128)
    b = kmv_sketch(_kmv_rows(spark, vals, parts=32), ["k"], "v", k=128)
    assert a.first().kmv == b.first().kmv


def test_kmv_union_is_lossless_merge(spark):
    """kmv_union of two sketches == the sketch of the concatenated data:
    the k smallest of a union are among each member's k smallest, so the
    merge is exact (array-equal), not approximate."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import kmv_sketch, kmv_union

    va = [v * 31 % 9973 for v in range(3000)]
    vb = [v * 57 % 9973 + 5000 for v in range(3000)]
    sa = kmv_sketch(_kmv_rows(spark, va), ["k"], "v", k=96)
    sb = kmv_sketch(_kmv_rows(spark, vb), ["k"], "v", k=96)
    merged = kmv_union(sa.unionByName(sb), ["k"], k=96).first().kmv
    whole = kmv_sketch(_kmv_rows(spark, va + vb), ["k"], "v", k=96).first().kmv
    assert merged == whole


def test_kmv_estimator_error_bound(spark):
    """Estimator path (distinct >> k): (k-1)/U(k) lands within the
    ~3/sqrt(k) ballpark of truth for the bijective LCG permutation —
    pinned loosely at 15% for k=256 over 50k distinct values."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import kmv_estimate, kmv_sketch

    df = _kmv_rows(spark, range(50_000), parts=8)
    sk = kmv_sketch(df, ["k"], "v", k=256)
    est = sk.select(kmv_estimate(F.col("kmv"), 256).alias("e")).first().e
    assert abs(est - 50_000) / 50_000 < 0.15


def test_kmv_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """The sketch is a plain array<long> column: persist per-shard
    sketches to parquet, read back fresh, merge, and get the identical
    array the in-plan merge produces — the persisted-artifact lifecycle
    the HLL path exercises, without binary blobs."""
    from tsne_flink_spark.pipeline.sketches import kmv_sketch, kmv_union

    va, vb = list(range(0, 4000)), list(range(2000, 6000))
    shards = kmv_sketch(_kmv_rows(spark, va), ["k"], "v", k=64).unionByName(
        kmv_sketch(_kmv_rows(spark, vb), ["k"], "v", k=64)
    )
    store = str(tmp_path / "kmv_store")
    shards.write.mode("overwrite").parquet(store)
    from_disk = kmv_union(spark.read.parquet(store), ["k"], k=64).first().kmv
    in_plan = kmv_union(shards, ["k"], k=64).first().kmv
    assert from_disk == in_plan


def test_kmv_overlap_exact_sets(spark):
    """Both sketches exact (< k distinct): intersection/union/Jaccard
    estimates are EXACT set cardinalities (theta = 1, complete bijective
    hash sets)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        kmv_overlap_estimates,
        kmv_sketch,
    )

    va, vb = list(range(0, 30)), list(range(20, 50))  # inter 10, union 50
    sa = kmv_sketch(_kmv_rows(spark, va, "a"), ["k"], "v", k=64)
    sb = kmv_sketch(_kmv_rows(spark, vb, "b"), ["k"], "v", k=64)
    pair = sa.select(F.col("kmv").alias("ka")).crossJoin(
        sb.select(F.col("kmv").alias("kb"))
    )
    ests = kmv_overlap_estimates(F.col("ka"), F.col("kb"), 64)
    row = pair.select(
        *[v.alias(name) for name, v in ests.items()]
    ).first()
    assert (row.est_a, row.est_b) == (30.0, 30.0)
    assert row.est_inter == 10.0 and row.est_union == 50.0
    assert row.est_jaccard == pytest.approx(0.2)


def test_kmv_overlap_estimator_path(spark):
    """Estimator path on overlapping big sets: per-side/union estimates
    within 15% of truth, intersection within 15% of the UNION size (the
    theta-sketch error frame), and est_inter <= est_union structurally."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        kmv_overlap_estimates,
        kmv_sketch,
    )

    va = list(range(0, 12_000))          # |A| = 12k
    vb = list(range(8_000, 24_000))      # |B| = 16k, inter 4k, union 24k
    sa = kmv_sketch(_kmv_rows(spark, va, "a", 8), ["k"], "v", k=256)
    sb = kmv_sketch(_kmv_rows(spark, vb, "b", 8), ["k"], "v", k=256)
    pair = sa.select(F.col("kmv").alias("ka")).crossJoin(
        sb.select(F.col("kmv").alias("kb"))
    )
    ests = kmv_overlap_estimates(F.col("ka"), F.col("kb"), 256)
    row = pair.select(*[v.alias(name) for name, v in ests.items()]).first()
    assert abs(row.est_a - 12_000) / 12_000 < 0.15
    assert abs(row.est_b - 16_000) / 16_000 < 0.15
    assert abs(row.est_union - 24_000) / 24_000 < 0.15
    assert abs(row.est_inter - 4_000) / 24_000 < 0.15
    assert row.est_inter <= row.est_union


# ---------------------------------------------------------------------------
# mergeable fixed-bin histogram quantiles (histogram_shards / union /
# quantiles)
# ---------------------------------------------------------------------------


def _hist_df(spark, values, parts=4):
    return spark.createDataFrame(
        [("g", float(v)) for v in values], "k string, v double"
    ).repartition(parts)


def test_histogram_union_equals_single_shot(spark):
    """Merging per-shard histograms is EXACT: identical counts array to
    one histogram over all the rows (elementwise sum commutes with the
    bin assignment)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        histogram_shards,
        histogram_union,
    )

    vals = [(v * 37) % 1000 for v in range(4000)]
    df = _hist_df(spark, vals)
    sharded = histogram_union(
        histogram_shards(
            df, ["k"], "v", F.pmod(F.monotonically_increasing_id(), F.lit(5)),
            0.0, 1000.0, 32,
        ),
        ["k"], 32,
    ).first()
    single = histogram_union(
        histogram_shards(df, ["k"], "v", F.lit(0), 0.0, 1000.0, 32),
        ["k"], 32,
    ).first()
    assert sharded.counts == single.counts and sharded.n == single.n == 4000


def test_histogram_quantile_error_bound(spark):
    """Every readout within one bin width of the exact rank quantile,
    and monotone in q."""
    import numpy as np
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        histogram_quantiles,
        histogram_shards,
        histogram_union,
    )

    rng = np.random.default_rng(7)
    vals = rng.normal(500, 150, 20_000).clip(0, 1000)
    df = _hist_df(spark, vals, parts=8)
    qs = [0.1, 0.25, 0.5, 0.9, 0.99]
    hist = histogram_union(
        histogram_shards(df, ["k"], "v", F.lit(0), 0.0, 1000.0, 64),
        ["k"], 64,
    )
    got = {
        r.q: r.est
        for r in histogram_quantiles(hist, ["k"], qs, 0.0, 1000.0, 64).collect()
    }
    binw = 1000.0 / 64
    s = np.sort(vals)
    ests = []
    for q in qs:
        exact = s[int(np.ceil(q * len(s))) - 1]
        assert abs(got[q] - exact) <= binw + 1e-9, (q, got[q], exact)
        ests.append(got[q])
    assert ests == sorted(ests)


def test_histogram_clamps_out_of_range(spark):
    """Values outside [lo, hi] land in the edge bins (counted, never
    dropped) and n reflects every non-null row."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import histogram_shards

    df = _hist_df(spark, [-50.0, -1.0, 5.0, 99.0, 150.0, 2000.0])
    h = histogram_shards(df, ["k"], "v", F.lit(0), 0.0, 100.0, 10).first()
    assert h.n == 6
    assert h.counts[0] == 3  # -50, -1 clamped + 5.0
    assert h.counts[9] == 3  # 99 + 150, 2000 clamped


def test_histogram_survives_parquet_roundtrip(spark, tmp_path):
    """The persisted-synopsis lifecycle: write per-shard histograms to
    parquet, read back fresh, merge — identical to the in-plan merge."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        histogram_shards,
        histogram_union,
    )

    df = _hist_df(spark, [(v * 13) % 500 for v in range(3000)])
    shards = histogram_shards(
        df, ["k"], "v", F.pmod(F.monotonically_increasing_id(), F.lit(4)),
        0.0, 500.0, 32,
    )
    store = str(tmp_path / "hist_store")
    shards.write.mode("overwrite").parquet(store)
    from_disk = histogram_union(spark.read.parquet(store), ["k"], 32).first()
    in_plan = histogram_union(shards, ["k"], 32).first()
    assert from_disk.counts == in_plan.counts and from_disk.n == in_plan.n


def test_streaming_kmv_shards_union_matches_batch(spark, tmp_path):
    """Streaming producer for the persisted KMV lifecycle: two JSONL
    micro-batches land as two shard directories; re-unioning the store
    yields the IDENTICAL k-min array a one-shot batch build over
    everything ingested produces (the merge is lossless, not just
    estimate-equal)."""
    import json
    import os
    import time

    from tsne_flink_spark.pipeline.sketches import (
        kmv_sketch,
        kmv_union,
        streaming_kmv_shards,
    )

    in_dir = tmp_path / "kmv_in"
    store = str(tmp_path / "kmv_store")
    os.makedirs(in_dir)

    stream = spark.readStream.schema("k string, u long").json(str(in_dir))
    q = streaming_kmv_shards(
        stream, store, ["k"], "u", k=32,
        checkpoint_dir=str(tmp_path / "ckpt_kmv"),
    )

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for k, u in rows:
                f.write(json.dumps({"k": k, "u": u}) + "\n")

    b1 = [("a", i * 3) for i in range(300)]
    b2 = [("a", i * 5 + 1) for i in range(300)]
    try:
        write_batch("b1.json", b1)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=0"):
            time.sleep(0.5)
        write_batch("b2.json", b2)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=1"):
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    merged = kmv_union(spark.read.parquet(store), ["k"], k=32).first().kmv
    whole = kmv_sketch(
        spark.createDataFrame(b1 + b2, "k string, u long"), ["k"], "u", k=32
    ).first().kmv
    assert merged == whole


def test_streaming_countmin_shards_union_matches_batch(spark, tmp_path):
    """Streaming producer for the persisted count-min lifecycle: two
    JSONL micro-batches land as two shard directories; the re-unioned
    store is BIT-IDENTICAL to a one-shot build over everything ingested
    (elementwise counter sum is lossless)."""
    import json
    import os
    import time

    from tsne_flink_spark.pipeline.sketches import (
        countmin_sketch,
        countmin_union,
        streaming_countmin_shards,
    )

    in_dir = tmp_path / "cm_in"
    store = str(tmp_path / "cm_store")
    os.makedirs(in_dir)

    stream = spark.readStream.schema("t string").json(str(in_dir))
    q = streaming_countmin_shards(
        stream, store, "t", w=64, d=3,
        checkpoint_dir=str(tmp_path / "ckpt_cm"),
    )

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for t in rows:
                f.write(json.dumps({"t": t}) + "\n")

    b1 = [f"v{i % 9}" for i in range(200)]
    b2 = [f"w{i % 4}" for i in range(100)]
    try:
        write_batch("b1.json", b1)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=0"):
            time.sleep(0.5)
        write_batch("b2.json", b2)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=1"):
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    merged = {
        r["depth"]: list(r["counts"])
        for r in countmin_union(
            spark.read.parquet(store).drop("shard")
        ).collect()
    }
    whole = {
        r["depth"]: list(r["counts"])
        for r in countmin_sketch(
            spark.createDataFrame([(t,) for t in b1 + b2], "t string"),
            "t", w=64, d=3,
        ).collect()
    }
    assert merged == whole


def test_streaming_histogram_shards_union_matches_batch(spark, tmp_path):
    """Streaming producer for the persisted histogram lifecycle: the
    merged streaming store equals a batch histogram over everything
    ingested, counts array and total alike (exact elementwise-sum
    merge)."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.sketches import (
        histogram_shards,
        histogram_union,
        streaming_histogram_shards,
    )

    in_dir = tmp_path / "hist_in"
    store = str(tmp_path / "hist_store")
    os.makedirs(in_dir)

    stream = spark.readStream.schema("k string, v double").json(str(in_dir))
    q = streaming_histogram_shards(
        stream, store, ["k"], "v", 0.0, 100.0, bins=16,
        checkpoint_dir=str(tmp_path / "ckpt_hist"),
    )

    def write_batch(name, rows):
        with open(in_dir / name, "w") as f:
            for k, v in rows:
                f.write(json.dumps({"k": k, "v": v}) + "\n")

    b1 = [("a", float((i * 7) % 100)) for i in range(500)]
    b2 = [("a", float((i * 11) % 120)) for i in range(500)]
    try:
        write_batch("b1.json", b1)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=0"):
            time.sleep(0.5)
        write_batch("b2.json", b2)
        deadline = time.time() + 60
        while time.time() < deadline and not os.path.isdir(f"{store}/batch=1"):
            time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    merged = histogram_union(spark.read.parquet(store), ["k"], 16).first()
    whole = histogram_union(
        histogram_shards(
            spark.createDataFrame(b1 + b2, "k string, v double"),
            ["k"], "v", F.lit(0), 0.0, 100.0, 16,
        ),
        ["k"], 16,
    ).first()
    assert merged.counts == whole.counts and merged.n == whole.n == 1000
