"""Training-data curation operators: the decisions a 100-TB pipeline makes
AFTER analysis — which documents to keep, drop, sample, and how to lay them
out for the trainer.

- near_dup_clusters   — duplicate-pair edges -> connected components ->
                        one canonical document per duplicate CLUSTER
                        (transitive closure; pairwise kill-lists under-merge).
- decontaminate       — flag training documents sharing word n-grams with a
                        held-out evaluation set (the train/test-overlap
                        scrub every benchmark-honest pipeline runs).
- stratified_sample   — deterministic per-stratum downsampling (domain /
                        language mixing) via an explicit integer LCG so the
                        SAME rows are selected by any engine, any run.
- pack_sequences      — concatenate-and-chunk layout: assign each document
                        a (pack, offset) in fixed-capacity token windows,
                        per source shard — the standard pre-training
                        sequence-packing bookkeeping.

All four are exact and deterministic (DuckDB-oracle-backed); none uses a
Python UDF.  Candidate generation for clustering reuses the lossless
prefix-filtered pair miner from ``pipeline.dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsne_flink_spark.operators.graph import connected_components
from tsne_flink_spark.pipeline.dedup import ngram_jaccard_pairs, shingles
from tsne_flink_spark.pipeline.text import bpe_ish_token_count


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 2,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(id, cluster_id, keep) for every document: ``cluster_id`` is the
    minimum doc id of the document's near-duplicate connected component
    (its own id when it has no near-dup), ``keep`` marks the one canonical
    representative per cluster.

    Pairwise dedup policies (drop b when a~b, a<b) under-merge: with a~b
    and b~c but a!~c, they keep {a, c} even though all three are one
    duplicate family.  Clustering the pair graph with connected components
    (operators/graph.py) gives the transitive closure; the canonical
    survivor set is then one row per component.

    Edges default to the EXACT lossless miner (``ngram_jaccard_pairs``,
    DuckDB-verifiable); pass ``pairs`` (an (a, b) DataFrame, e.g. from
    ``dedup.minhash_dup_pairs``) to cluster LSH-bounded candidates instead
    — the usual trade at 100-TB scale.
    """
    from tsne_flink_spark.operators.optimize import materialize

    # checkpoint the mined pairs: connected_components reads its edge set
    # twice (node seed + symmetrize) before its own checkpoint — without
    # this the whole miner would execute twice
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            docs, text_col=text_col, id_col=id_col,
            threshold=threshold, shingle_n=shingle_n,
        )
    pairs = materialize(pairs.select("a", "b"))
    comps = connected_components(pairs, "a", "b").withColumnRenamed("id", id_col)
    return (
        docs.select(id_col)
        .join(comps, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "keep", (F.col("cluster_id") == F.col(id_col)).cast("int")
        )
    )


def decontaminate(
    train: DataFrame,
    holdout: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Per-training-document eval-set overlap report: (id, n_shared_grams,
    n_holdout_docs, contaminated).

    A document is contaminated when it shares at least ``min_hits`` distinct
    word ``ngram_n``-grams with ANY held-out document — the n-gram-overlap
    decontamination rule used by public LLM data pipelines (e.g. GPT-3
    appendix C uses 13-grams; default 5 here because the synthetic docs are
    short).  Every training row is emitted, clean ones with zero counts, so
    the output is a total annotation, not a filter.

    Scale: the holdout gram table is tiny relative to training (benchmarks
    are MBs, training sets are TBs) — it is explicitly ``broadcast()`` so
    the overlap join is map-side against the full training scan; the only
    shuffle is the per-document count aggregation, O(matches).
    """
    tr_grams = train.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), ngram_n)).alias("__g")
    )
    ev_grams = (
        holdout.select(
            F.col(id_col).alias("__ev_id"),
            F.explode(shingles(F.col(text_col), ngram_n)).alias("__g"),
        )
        .distinct()
    )
    hits = (
        tr_grams.join(F.broadcast(ev_grams), "__g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("__g").alias("n_shared_grams"),
            F.countDistinct("__ev_id").alias("n_holdout_docs"),
        )
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            F.coalesce("n_holdout_docs", F.lit(0)).alias("n_holdout_docs"),
        )
        .withColumn(
            "contaminated",
            (F.col("n_shared_grams") >= F.lit(min_hits)).cast("int"),
        )
    )


# Two rounds of the classic glibc LCG over a pre-folded key, kept inside
# int64 by a 2^31 modulus: the key is first reduced mod 2^31 (otherwise
# ``key * A`` overflows int64 — and RAISES under Spark's default ANSI mode —
# for keys above ~8.4e9, a realistic doc-id range at corpus scale), then
# (2^31 - 1) * 1103515245 + 12345 < 2.4e18 < 2^63 keeps every later step
# exact in ANY engine's 64-bit integers — the point.  Engine-native hashes
# (xxhash64, DuckDB hash()) differ across engines and versions; a sampling
# decision that must be reproducible everywhere needs explicit arithmetic.
# The fold aliases keys 2^31 apart onto one bucket stream — harmless for
# sampling (bucket uniformity is what matters, not key injectivity).
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 1 << 31


def leakage_safe_split(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 2,
    pairs: DataFrame | None = None,
    buckets: int = 100,
) -> DataFrame:
    """(id, cluster_id, split): train/val/test assignment where whole
    NEAR-DUPLICATE FAMILIES go to one split — a per-document random
    split leaks test content into train whenever a test document has a
    near-dup twin (boilerplate variants, re-crawls, quotes), which is
    exactly what eval decontamination exists to prevent; splitting by
    family id closes that hole by construction.

    Families come from :func:`near_dup_clusters` (exact transitive
    closure of the n-gram-Jaccard pair graph; pass ``pairs`` to split on
    LSH-bounded candidates at scale).  Assignment is the deterministic
    LCG bucket of the FAMILY id against cumulative ``ratios`` thresholds
    — the same arithmetic as :func:`stratified_sample`, so any engine
    replays the identical split (DuckDB-verifiable), re-splitting is
    reproducible, and singleton families (the common case) spread
    uniformly.  ``ratios`` values must sum to 1; insertion order defines
    the bucket layout (default train 0.9 / val 0.05 / test 0.05)."""
    if ratios is None:
        ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(ratios.values()) - 1.0) > 1e-9 or any(
        v <= 0 for v in ratios.values()
    ):
        raise ValueError(f"ratios must be positive and sum to 1: {ratios}")
    clusters = near_dup_clusters(
        docs, text_col=text_col, id_col=id_col,
        threshold=threshold, shingle_n=shingle_n, pairs=pairs,
    )
    b = _lcg_bucket(F.col("cluster_id"), buckets)
    # CASE over cumulative thresholds: earlier entries take lower buckets
    cum = 0.0
    conds = []
    for name, frac in ratios.items():
        cum += frac
        conds.append((name, int(round(cum * buckets))))
    expr = None
    for name, hi in conds[:-1]:
        c = b < F.lit(hi)
        expr = F.when(c, F.lit(name)) if expr is None else expr.when(c, F.lit(name))
    expr = (
        expr.otherwise(F.lit(conds[-1][0]))
        if expr is not None
        else F.lit(conds[-1][0])
    )
    return clusters.select(id_col, "cluster_id", expr.alias("split"))


def _lcg_bucket(key: Column, buckets: int = 100) -> Column:
    h = F.pmod(key, F.lit(_LCG_M))
    h = (h * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    h = (h * F.lit(_LCG_A) + F.lit(_LCG_C)) % F.lit(_LCG_M)
    return h % F.lit(buckets)


def lcg_bucket_sql(key_expr: str, buckets: int = 100) -> str:
    """The DuckDB/ANSI spelling of ``_lcg_bucket`` — exported so oracles and
    downstream SQL users select the exact same rows.  Assumes a
    non-negative key (doc ids); the Spark side uses pmod, which agrees with
    ``%`` on non-negatives."""
    h0 = f"(({key_expr}) % {_LCG_M})"
    h1 = f"(({h0}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}"
    h2 = f"(({h1}) * {_LCG_A} + {_LCG_C}) % {_LCG_M}"
    return f"(({h2}) % {buckets})"


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 5,
) -> DataFrame:
    """Deterministic stratified sampling: keep a document iff its LCG bucket
    (0-99, derived from ``id_col`` alone) falls below its stratum's
    percentage rate — the domain/language-mixing primitive.

    Because membership depends only on the row's own id, the operator is a
    narrow map + filter (no shuffle, no state), resampling with a changed
    rate table keeps maximal row overlap (nested samples: rate 10 is a
    subset of rate 20), and any engine that can do int64 arithmetic selects
    the identical rows.  Rates are percentages in [0, 100].
    """
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        if not 0 <= r <= 100:
            raise ValueError(f"rate for {stratum!r} must be in [0, 100], got {r}")
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return (
        docs.withColumn("sample_bucket", _lcg_bucket(F.col(id_col)))
        .where(F.col("sample_bucket") < rate)
    )


def stratified_take(
    docs: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rows ranked within each
    stratum by their LCG hash order (id tie-break), first ``k`` kept — the
    fixed-budget complement to rate-based ``stratified_sample`` (eval-set
    carving, per-domain caps).  Equivalent to a uniform without-replacement
    sample, reproducible in any engine.  One window rank per stratum; same
    parallelism note as ``pack_sequences``."""
    from pyspark.sql import Window

    order = _lcg_bucket(F.col(id_col), 1 << 30)
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight: Column,
    id_col: str = "doc_id",
    key_col: str = "sample_key",
) -> DataFrame:
    """Weighted without-replacement sample of ``k`` rows: each row's
    inclusion probability is proportional to its ``weight`` — the
    quality-weighted corpus-downsampling primitive (keep 1M documents,
    favoring long/high-scoring ones, in ONE pass with no weight
    normalization or global state).

    Algorithm A-ES (Efraimidis & Spirtakis 2006): draw u_i uniform in
    (0, 1), keep the k largest keys u_i^(1/w_i) — provably equivalent
    to sequential weighted draws without replacement.  The key is
    computed in the monotone-equivalent log domain ln(u)/w (one libm
    call instead of pow) and u_i comes from the explicit LCG over the
    row id (same arithmetic as :func:`stratified_sample`), so ANY
    engine selects the identical rows: no RNG state, resampling is
    reproducible, and a DuckDB oracle replays the selection exactly.

    Scale: a narrow map to compute keys, then top-k — Spark plans the
    orderBy+limit as TakeOrderedAndProject (per-partition partial
    top-k, driver merges k rows per partition; no global sort, no
    shuffle of the corpus).  Weights must be strictly positive; ties
    at the k-th key break by ``id_col``."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    u = (_lcg_bucket(F.col(id_col), 1 << 30).cast("double") + 0.5) / float(1 << 30)
    key = F.log(u) / weight.cast("double")
    return (
        docs.withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_key_sql(id_expr: str, weight_expr: str) -> str:
    """The DuckDB/ANSI spelling of :func:`weighted_sample`'s A-ES key —
    exported so oracles rank by the exact same double."""
    b = lcg_bucket_sql(id_expr, 1 << 30)
    return f"ln((({b})::DOUBLE + 0.5) / {float(1 << 30)!r}) / ({weight_expr})::DOUBLE"


def weighted_sample_by(
    docs: DataFrame,
    by: list[str],
    k: int,
    weight: Column,
    id_col: str = "doc_id",
    key_col: str = "sample_key",
) -> DataFrame:
    """Weighted without-replacement sample of ``k`` rows PER GROUP —
    "keep the 10k best documents per language, inclusion probability
    proportional to quality" — the stratified form of
    :func:`weighted_sample` (same A-ES key, same explicit LCG, so the
    selection is engine-replayable and a DuckDB oracle ranks by the
    identical double).

    Scale: the global TakeOrderedAndProject trick doesn't apply per
    group, so this is the standard one-shuffle form — a rank window
    partitioned BY the group keys (never a global window; partition
    count = group-key cardinality, AQE-balanced), then the rank <= k
    filter.  Ties at the k-th key break by ``id_col``."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    u = (_lcg_bucket(F.col(id_col), 1 << 30).cast("double") + 0.5) / float(
        1 << 30
    )
    key = F.log(u) / weight.cast("double")
    w = Window.partitionBy(*by).orderBy(
        F.col(key_col).desc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn(key_col, key)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def curation_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    holdout_mod: int = 10,
    jaccard_threshold: float = 0.5,
    shingle_n: int = 2,
    decon_ngram_n: int = 5,
    quality_min: float = 0.55,
    rates: dict[str, int] | None = None,
    default_rate: int = 5,
    pair_miner: str = "exact",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """The full curation pass, end-to-end: every document annotated with the
    FIRST stage that eliminated it —

    ``holdout``      — reserved as the evaluation split (id % holdout_mod == 0),
    ``exact_dup``    — normalized-text fingerprint duplicate of a lower id,
    ``near_dup``     — non-canonical member of a near-dup connected component,
    ``contaminated`` — shares a word n-gram with the holdout split,
    ``low_quality``  — heuristic quality score below ``quality_min``,
    ``not_sampled``  — clean but outside its stratum's sampling rate,
    ``kept``         — in the final training set.

    Stages apply sequentially, each only to the survivors of the previous
    one (the order every production pipeline uses: cheap exact kills before
    expensive pair mining, contamination and quality before sampling so
    rates apply to the clean pool).  Deterministic end to end — exact dedup,
    exact-Jaccard clustering, exact gram overlap, closed-form quality and
    LCG sampling — so the whole pipeline is one DuckDB-checkable query.

    ``pair_miner="minhash"`` swaps the near-dup edge source for the
    LSH-bounded verified pairs (``dedup.minhash_dup_pairs``, same
    ``jaccard_threshold``) — the corpus-scale trade (B24): still
    deterministic, no longer SQL-reproducible.

    ``pairs`` (r15): a pre-mined pair graph over the SAME corpus at the
    SAME (threshold, shingle_n) — e.g. a shared miner output reused
    across a query suite.  Jaccard is pairwise, so restricting the full
    graph's edges to the current survivor set is EXACTLY the edge set
    mining the survivors directly would produce; the restriction here is
    two semi-joins on slim id columns.  Output is bit-identical to the
    self-mined path.

    Output is a total annotation (one row per input document, columns
    ``(id_col, stage)``): the "why was my document dropped" audit table, not
    just the surviving subset.
    """
    from pyspark.sql import Window

    from tsne_flink_spark.operators.optimize import materialize
    from tsne_flink_spark.pipeline.text import fingerprint, quality_score

    if rates is None:
        rates = {"en": 50, "de": 30, "fr": 20, "es": 10}
    base_cols = [id_col, text_col, stratum_col]

    holdout = docs.where(F.col(id_col) % holdout_mod == 0)
    train = docs.where(F.col(id_col) % holdout_mod != 0)

    # Every kill set below is checkpointed: each one is a slim id list that
    # BOTH the survivor chain and the final stage-assembly joins consume,
    # and (worse) each later stage's lineage contains every earlier stage —
    # unmaterialized, the assembly would re-execute the pair miner and the
    # gram joins once per downstream reference (measured ~2x on the whole
    # pipeline at sf0.1).  The survivor frames stay lazy: they are cheap
    # anti-joins of the scan against checkpointed ids.
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    fp = train.select(*base_cols).withColumn(
        "__fp", fingerprint(F.col(text_col))
    ).withColumn("__rn", F.row_number().over(w))
    exact_kill = materialize(fp.where(F.col("__rn") > 1).select(id_col))
    surv1 = train.select(*base_cols).join(exact_kill, id_col, "left_anti")

    if pairs is not None:
        # restrict the pre-mined full-corpus graph to the survivor set:
        # both endpoints must have survived exact dedup + holdout
        ids1 = surv1.select(id_col)
        mined = pairs.select("a", "b").join(
            ids1.withColumnRenamed(id_col, "a"), "a", "left_semi"
        ).join(ids1.withColumnRenamed(id_col, "b"), "b", "left_semi")
    elif pair_miner == "minhash":
        from tsne_flink_spark.pipeline.dedup import minhash_dup_pairs

        mined = minhash_dup_pairs(
            surv1, text_col=text_col, id_col=id_col,
            threshold=jaccard_threshold, shingle_n=max(shingle_n, 2),
        )
    elif pair_miner == "exact":
        mined = None
    else:
        raise ValueError(f"pair_miner must be 'exact' or 'minhash', got {pair_miner!r}")
    clusters = near_dup_clusters(
        surv1, text_col=text_col, id_col=id_col,
        threshold=jaccard_threshold, shingle_n=shingle_n, pairs=mined,
    )
    near_kill = materialize(
        clusters.where(F.col("keep") == 0).select(id_col)
    )
    surv2 = surv1.join(near_kill, id_col, "left_anti")

    decon = decontaminate(
        surv2, holdout, text_col=text_col, id_col=id_col,
        ngram_n=decon_ngram_n, min_hits=1,
    )
    cont_kill = materialize(
        decon.where(F.col("contaminated") == 1).select(id_col)
    )
    surv3 = surv2.join(cont_kill, id_col, "left_anti")

    scored = surv3.withColumn("__q", quality_score(F.col(text_col)))
    lowq_kill = materialize(
        scored.where(F.col("__q") < quality_min).select(id_col)
    )
    surv4 = scored.where(F.col("__q") >= quality_min).select(*base_cols)

    kept = materialize(
        stratified_sample(
            surv4, rates, stratum_col=stratum_col, id_col=id_col,
            default_rate=default_rate,
        ).select(id_col)
    )

    def mark(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.col(id_col), F.lit(name).alias("__lbl"))

    # The five kill/keep sets are DISJOINT by construction (each stage
    # applies only to the previous stage's survivors), so the assembly
    # needs ONE left join of docs against their labeled union instead of
    # five chained left joins (r15, guide §2.4: 6 Exchanges + 5
    # SortMergeJoins -> 2 Exchanges + 1 join; same rows bit-for-bit).
    # Holdout ids never appear in any set (all sets are subsets of
    # train), so the when-precedence of the old chain is preserved.
    labels = (
        mark(exact_kill, "exact_dup")
        .unionByName(mark(near_kill, "near_dup"))
        .unionByName(mark(cont_kill, "contaminated"))
        .unionByName(mark(lowq_kill, "low_quality"))
        .unionByName(mark(kept, "kept"))
    )
    ann = docs.select(id_col).join(labels, id_col, "left")
    stage = (
        F.when(F.col(id_col) % holdout_mod == 0, F.lit("holdout"))
        .when(F.col("__lbl").isNotNull(), F.col("__lbl"))
        .otherwise(F.lit("not_sampled"))
    )
    return ann.select(id_col, stage.alias("stage"))


def mixture_weights(
    docs: DataFrame,
    targets: dict[str, float] | None = None,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mixture rebalancing weights — the static reweighting step
    a pre-training pipeline runs to hit a target domain mixture (the
    fixed-weight special case of DoReMi, Xie et al., arXiv:2305.10429:
    published mixtures are token-share tables exactly like this).

    For each source: document/token counts, the ACTUAL token share, the
    TARGET share (``targets`` by name, else uniform over the observed
    sources), ``weight = target / actual``, and ``sample_rate`` =
    weight normalized so the largest is 1 — i.e. downsample-only rates
    directly usable as ``stratified_sample`` percentages.

    One per-source aggregation plus unpartitioned window totals over the
    tiny aggregate (source cardinality rows — at 100 TB still just one
    row per corpus source, so the window's single-partition exchange
    moves a handful of rows).  Division order is written identically in
    the DuckDB oracle, so the rounded shares match bit-for-bit.
    """
    from pyspark.sql import Window

    toks = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    )
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    # staged projections: window functions cannot nest, so totals, then the
    # weight, then the max-weight normalizer are separate select steps (the
    # oracle mirrors this CTE-by-CTE, keeping FP operation order identical)
    tot = per.withColumn("__total", F.sum("n_tokens").over(w)).withColumn(
        "__k", F.count(F.lit(1)).over(w)
    )
    if targets:
        tgt = None
        for s, share in sorted(targets.items()):
            if tgt is None:
                tgt = F.when(F.col(source_col) == s, F.lit(float(share)))
            else:
                tgt = tgt.when(F.col(source_col) == s, F.lit(float(share)))
        tgt = tgt.otherwise(F.lit(0.0))
    else:
        tgt = F.lit(1.0) / F.col("__k")
    wt = tot.withColumn("__tgt", tgt).withColumn(
        "__weight",
        F.col("__tgt") / (F.col("n_tokens") / F.col("__total")),
    )
    return wt.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__total"), 6).alias("actual_share"),
        F.round(F.col("__tgt"), 6).alias("target_share"),
        F.round(F.col("__weight"), 6).alias("weight"),
        F.round(
            F.col("__weight") / F.max("__weight").over(w), 6
        ).alias("sample_rate"),
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: within each shard, documents
    are laid end-to-end in id order and cut into fixed ``capacity``-token
    context windows; each document is annotated with its first pack, offset
    in that pack, and how many packs it spans.

    This is the layout bookkeeping of the standard pre-training "pack then
    split at window boundaries" scheme (documents cross pack boundaries;
    nothing is padded or dropped).  Expressed as one window cumulative sum
    per shard — the window partitions by ``shard_col``, so parallelism is
    the shard count: at 100 TB, shards are file-sized units (here the
    20-source testdata stands in), and a pipeline with giant shards salts
    them into sub-shards first, exactly like any windowed sessionization.
    Token counts use the BPE-ish estimator from ``pipeline.text``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        id_col,
        shard_col,
        bpe_ish_token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    cum = toks.withColumn("__cum", F.sum("n_tokens").over(w))
    start = F.col("__cum") - F.col("n_tokens")
    # a zero-token doc sits AT `start`: its last pack is its first pack
    last_tok = F.col("__cum") - F.when(F.col("n_tokens") > 0, 1).otherwise(0)
    return cum.select(
        id_col,
        shard_col,
        "n_tokens",
        F.floor(start / capacity).alias("pack_id"),
        (start % capacity).alias("pack_offset"),
        (
            F.greatest(F.floor(last_tok / capacity), F.floor(start / capacity))
            - F.floor(start / capacity)
            + 1
        ).alias("n_packs"),
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking: (id, chunk_id, n_tokens,
    chunk_text) rows of ``window`` whitespace tokens each, starting every
    ``stride`` tokens (default window — non-overlapping; stride < window
    gives the overlapping RAG-retrieval layout).

    The last chunk of a document is the ragged remainder (never empty,
    never padded); documents shorter than one window yield exactly one
    chunk.  Pure Column expressions — tokenize once, bind the array with
    a higher-order-function let (projection-collapse-immune, see
    text._let), posexplode the per-chunk slices: zero joins, zero Python,
    one narrow codegen stage, embarrassingly parallel at any corpus size.
    """
    if stride is None:
        stride = window
    if window < 1 or stride < 1:
        raise ValueError(f"window/stride must be >= 1: {window}/{stride}")
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    spread = docs.select(id_col, text_col).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    with_t = spread.select(
        id_col, toks.alias("__t")
    ).withColumn("__n", F.size("__t"))
    # chunk starts 0, stride, 2*stride, ... while start < n (>= 1 chunk
    # for non-empty docs); each chunk is slice(start+1, window)
    n_chunks = F.when(
        F.col("__n") <= 0, F.lit(0)
    ).otherwise(F.floor((F.col("__n") - 1) / stride).cast("int") + 1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.slice("__t", (k * stride + 1).cast("int"), window),
    )
    return (
        with_t.where(F.col("__n") > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_id", "__c"))
        .select(
            id_col,
            "chunk_id",
            F.size("__c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per doc id in
    either snapshot with status 'added' / 'removed' / 'changed' /
    'unchanged' (changed = same id, different normalized-text md5 — the
    exact-dedup fingerprint).

    The ingestion regression check: diffing yesterday's curated corpus
    against today's catches silent upstream rewrites (changed), loss
    (removed), and unexpected growth (added) in ONE full-outer equi-join
    on the id — O(N) shuffled rows on both sides, no text comparison
    beyond the fingerprint column.
    """
    from tsne_flink_spark.pipeline.text import fingerprint

    o = old.select(
        F.col(id_col).alias("__id"),
        fingerprint(F.col(text_col)).alias("__fp_old"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        fingerprint(F.col(text_col)).alias("__fp_new"),
    )
    j = o.join(n, "__id", "full_outer")
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("__id").alias(id_col), status.alias("status"))


def near_dup_best_rep(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    shingle_n: int = 2,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(id, cluster_id, quality, keep): near-dup clusters with the
    BEST-QUALITY document as the representative — what a production
    pipeline actually keeps, vs ``near_dup_clusters``'s min-id canonical.

    Representative = argmax(quality rounded to 6, tie -> min id) within
    the cluster: ranking on the ROUNDED score keeps the choice exact
    across engines (float last-bit order flips would otherwise make the
    keep flag unhashable).  One extra window partitioned by cluster_id —
    clusters are duplicate families, so partitions stay small at any
    corpus size."""
    from pyspark.sql.window import Window

    from tsne_flink_spark.pipeline.text import quality_score

    clusters = near_dup_clusters(
        docs, text_col=text_col, id_col=id_col,
        threshold=threshold, shingle_n=shingle_n, pairs=pairs,
    ).drop("keep")
    q = docs.select(
        id_col, F.round(quality_score(F.col(text_col)), 6).alias("quality")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return (
        clusters.join(q, id_col)
        .withColumn("keep", (F.row_number().over(w) == 1).cast("int"))
        .select(id_col, "cluster_id", "quality", "keep")
    )


def term_drift(
    old: DataFrame,
    new: DataFrame,
    top_k: int = 50,
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Term-distribution drift between two corpus snapshots: the top_k
    most-shifted terms by smoothed log-odds-ratio z-score (Monroe,
    Colaresi & Quinn 2008, "Fightin' Words").

    For each term w with counts c_o / c_n out of totals T_o / T_n:

        delta(w) = ln((c_n + a) / (T_n - c_n + a))
                 - ln((c_o + a) / (T_o - c_o + a))
        z(w)     = delta(w) / sqrt(1/(c_n + a) + 1/(c_o + a))

    The variance term damps rare-word noise, so the ranking surfaces
    REAL distribution shifts (an ingestion bug flooding boilerplate, a
    source dropping out) rather than singleton churn — the monitoring
    twin of corpus_diff's membership check.

    Shuffle profile: one tokenize-explode + vocab-bounded groupBy per
    snapshot (map-side combinable), a full-outer join on the term key
    (vocab-sized, NOT corpus-sized), two 1-row total aggregates joined
    as broadcast side-inputs, and a top_k sort of vocab rows.  Nothing
    scales with document count except the two counting scans.

    Returns (term, c_old, c_new, delta, z) — top_k by |z| descending,
    term ascending for determinism.
    """

    def counts(df: DataFrame, out: str) -> DataFrame:
        toks = df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("term")
        )
        return toks.groupBy("term").agg(
            F.count(F.lit(1)).cast("double").alias(out)
        )

    co = counts(old, "c_old")
    cn = counts(new, "c_new")
    to = co.agg(F.sum("c_old").alias("t_old"))
    tn = cn.agg(F.sum("c_new").alias("t_new"))
    j = (
        co.join(cn, "term", "full_outer")
        .na.fill({"c_old": 0.0, "c_new": 0.0})
        .crossJoin(F.broadcast(to))
        .crossJoin(F.broadcast(tn))
    )
    a = F.lit(alpha)
    delta = F.log(
        (F.col("c_new") + a) / (F.col("t_new") - F.col("c_new") + a)
    ) - F.log((F.col("c_old") + a) / (F.col("t_old") - F.col("c_old") + a))
    z = delta / F.sqrt(
        1.0 / (F.col("c_new") + a) + 1.0 / (F.col("c_old") + a)
    )
    return (
        j.select(
            "term",
            F.col("c_old").cast("long").alias("c_old"),
            F.col("c_new").cast("long").alias("c_new"),
            delta.alias("delta"),
            z.alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), F.col("term").asc())
        .limit(top_k)
    )


def decontaminate_fuzzy(
    train: DataFrame,
    holdout: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate eval-set contamination: the fuzzy complement of
    :func:`decontaminate` — exact n-gram overlap misses light paraphrase
    (reordered sentences, small insertions), which shingle-Jaccard
    similarity above ``threshold`` still catches.

    MinHash-LSH banding BETWEEN the train and holdout signature tables
    generates candidates (never a self-join: the holdout side — an eval
    benchmark, MBs against training TBs — is banded once and BROADCAST,
    so candidate generation is a map-side join over the train scan);
    candidates are then verified with EXACT shingle Jaccard against the
    broadcast holdout shingle sets, so precision against the threshold
    is 1.0 by construction and only recall rides the S-curve.

    Returns every train row annotated: (id, max_jaccard,
    n_holdout_matches, contaminated_fuzzy) — the same total-annotation
    kill-set convention as the exact variant.
    """
    from tsne_flink_spark.pipeline.dedup import (
        _auto_bands,
        _spread,
        jaccard_similarity,
        minhash_signatures_table,
        shingles,
    )

    bands = _auto_bands(num_hashes, threshold)
    rows_per_band = num_hashes // bands

    def banded(signed: DataFrame, idc: str) -> DataFrame:
        return signed.select(
            F.col(idc),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda bnd: F.xxhash64(
                        F.slice(
                            F.col("__sig"),
                            bnd * rows_per_band + 1,
                            rows_per_band,
                        ).cast("string")
                    ),
                )
            ).alias("__band", "__bucket"),
        )

    tr_sh = _spread(train.select(id_col, text_col), F.col(id_col)).select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    ho_sh = holdout.select(
        F.col(id_col).alias("__ev_id"),
        shingles(F.col(text_col), shingle_n).alias("__ev_sh"),
    )
    tr_sig = minhash_signatures_table(
        tr_sh, id_col, num_hashes, seed, spread=False
    )
    ho_sig = minhash_signatures_table(
        ho_sh.withColumnRenamed("__ev_sh", "__sh"),
        "__ev_id",
        num_hashes,
        seed,
        spread=False,
    )
    cands = (
        banded(tr_sig, id_col)
        .join(F.broadcast(banded(ho_sig, "__ev_id")), ["__band", "__bucket"])
        .select(id_col, "__ev_id")
        .dropDuplicates([id_col, "__ev_id"])
    )
    verified = (
        cands.join(tr_sh, id_col)
        .join(F.broadcast(ho_sh), "__ev_id")
        .select(
            id_col,
            jaccard_similarity(F.col("__sh"), F.col("__ev_sh")).alias("__j"),
        )
        .where(F.col("__j") >= threshold)
    )
    hits = verified.groupBy(id_col).agg(
        F.max("__j").alias("max_jaccard"),
        F.count(F.lit(1)).cast("long").alias("n_holdout_matches"),
    )
    # contaminated_fuzzy is defined as "at least one holdout match with
    # UNROUNDED Jaccard >= threshold" (the `verified` filter above), so
    # the flag is match existence — never re-derived from the rounded
    # display value, whose 6-decimal rounding could otherwise show
    # max_jaccard == threshold (0.4999996 -> 0.5) beside a 0 flag.
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.round(F.coalesce("max_jaccard", F.lit(0.0)), 6).alias(
                "max_jaccard"
            ),
            F.coalesce("n_holdout_matches", F.lit(0)).alias(
                "n_holdout_matches"
            ),
            (F.coalesce("n_holdout_matches", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated_fuzzy"),
        )
    )


def decontaminate_fuzzy_invariants(
    train: DataFrame,
    holdout: DataFrame,
    threshold: float = 0.5,
    margin: float = 0.35,
    shingle_n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row, all zeros iff :func:`decontaminate_fuzzy` is sound and
    complete against the EXACT ground truth.

    Unlike the self-join dedups (whose exact truth is quadratic), the
    holdout side here is broadcast-small, so the true per-train-doc max
    Jaccard is computable exactly with one map-side
    broadcast-nested-loop pass — the check compares against the real
    answer, not a proxy:

    - false_flags: flagged docs whose true max < threshold (must be 0 —
      candidates are exact-verified);
    - overstated_scores: reported max_jaccard above the true max (must
      be 0 — reported scores ARE exact Jaccards of a candidate subset;
      both sides rounded to the output's 6 decimals before comparing,
      since round() is monotone but can round the reported value UP past
      the unrounded truth);
    - missed_strong: unflagged docs whose true max >= threshold+margin,
      far above the LSH S-curve knee where the per-pair miss
      probability is ~(1-j^r)^b ~ 1e-5 (b=16, r=4, j=0.85);
    - row_count_delta: output rows minus train rows (total annotation).
    """
    from tsne_flink_spark.pipeline.dedup import (
        _spread,
        jaccard_similarity,
        shingles,
    )

    out = decontaminate_fuzzy(
        train,
        holdout,
        threshold=threshold,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        seed=seed,
        text_col=text_col,
        id_col=id_col,
    )
    tr_sh = _spread(train.select(id_col, text_col), F.col(id_col)).select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("__sh")
    )
    ho_sh = holdout.select(
        shingles(F.col(text_col), shingle_n).alias("__ev_sh")
    )
    truth = (
        tr_sh.join(F.broadcast(ho_sh))
        .select(
            id_col,
            jaccard_similarity(F.col("__sh"), F.col("__ev_sh")).alias("__j"),
        )
        .groupBy(id_col)
        .agg(F.max("__j").alias("__true_max"))
    )
    n_train = train.count()
    j = out.join(truth, id_col, "left").withColumn(
        "__t", F.coalesce("__true_max", F.lit(0.0))
    )
    return j.agg(
        (F.count(F.lit(1)) - F.lit(n_train)).cast("long").alias(
            "row_count_delta"
        ),
        F.sum(
            (
                (F.col("contaminated_fuzzy") == 1)
                & (F.col("__t") < F.lit(threshold))
            ).cast("long")
        ).alias("false_flags"),
        F.sum(
            (
                F.col("max_jaccard") > F.round(F.col("__t"), 6) + F.lit(1e-9)
            ).cast("long")
        ).alias("overstated_scores"),
        F.sum(
            (
                (F.col("contaminated_fuzzy") == 0)
                & (F.col("__t") >= F.lit(threshold + margin))
            ).cast("long")
        ).alias("missed_strong"),
    )
