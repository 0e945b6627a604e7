"""Similarity search over embedding columns (ARRAY<FLOAT/DOUBLE>).

- ``brute_force_top_k``  — exact cosine top-k: crossJoin + Column-expression
  dot products + window top-k.  The correctness baseline; reuses the kNN
  machinery's shape (it IS kNN with metric=cosine-similarity, descending).
- ``lsh_top_k``          — random-hyperplane LSH with multi-probe buckets:
  candidates from bucket collisions only, then exact re-rank.  The scale
  path: shuffle O(rows x probes), never O(rows^2).
- ``ivf_top_k``          — IVF-style: k-means-ish coarse centroids sampled
  driver-side, each vector assigned to its nearest centroid partition,
  queries probe the ``n_probe`` nearest centroids.  Broadcast centroids,
  equi-join on centroid id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_similarity_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every query row.

    Output: (q INT, c INT, sim DOUBLE), k rows per query, ties broken by c.
    Self-matches (same id) are excluded.  Norms are computed once per row
    BEFORE the cross join (not per pair), and with a known ``dim`` the dot
    product unrolls into whole-stage codegen.
    """
    from tsne_flink_spark.functions.metrics import dot_unrolled

    if dim is None:
        head = corpus.select(vec_col).head()
        dim = len(head[0]) if head else None

    q = queries.select(
        F.col(id_col).alias("q"), _as_double(F.col(vec_col)).alias("__vq")
    ).withColumn("__nq", norm_expr(F.col("__vq")))
    c = corpus.select(
        F.col(id_col).alias("c"), _as_double(F.col(vec_col)).alias("__vc")
    ).withColumn("__nc", norm_expr(F.col("__vc")))
    dot = (
        dot_unrolled(F.col("__vq"), F.col("__vc"), dim)
        if dim is not None and dim <= 256
        else dot_expr(F.col("__vq"), F.col("__vc"))
    )
    scored = (
        q.crossJoin(c)
        .where(F.col("q") != F.col("c"))
        .select("q", "c", (dot / (F.col("__nq") * F.col("__nc"))).alias("sim"))
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("c").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _proj_expr(vec: Column, w: np.ndarray) -> Column:
    """Dot product against a constant vector, unrolled per index so it stays
    in whole-stage codegen (the HOF form is evaluated interpreted), CSE-
    chunked so the generated method stays JIT-compilable (see
    metrics._chunked_sum)."""
    from tsne_flink_spark.functions.metrics import _chunked_sum

    return _chunked_sum([vec[k] * float(w[k]) for k in range(len(w))])


def _hyperplane_bucket(vec: Column, planes: np.ndarray) -> Column:
    """The base sign-bucket: one bit per plane, packed into a LONG."""
    bucket = F.lit(0).cast("long")
    for p in range(len(planes)):
        proj = _proj_expr(vec, planes[p])
        bucket = bucket + (proj > 0).cast("long") * F.lit(2**p)
    return bucket


def _probe_array(bucket: Column, num_planes: int, probe_flips: int) -> Column:
    """Bucket plus single-bit-flip probes (multi-probe LSH) for recall
    without extra tables.

    MUST be applied to a MATERIALIZED bucket column, not the bucket
    expression itself: inlining the 12-plane projection tree once per probe
    grows the generated code past Janino's 64 KB method limit, and the whole
    stage silently falls back to interpreted evaluation (observed 10x).
    """
    probes = [bucket]
    for p in range(min(probe_flips, num_planes)):
        probes.append(bucket.bitwiseXOR(F.lit(2**p)))
    return F.array(*probes)


def lsh_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 12,
    probe_flips: int = 6,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via multi-probe random-hyperplane LSH."""
    if dim is None:
        dim = len(corpus.select(vec_col).head()[0])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(num_planes, dim))

    from tsne_flink_spark.functions.metrics import dot_unrolled

    # materialize the cast-to-double vector, then the base bucket, then the
    # probe explode — each in its own projection, so the plane-projection
    # tree is generated exactly once (see _probe_array)
    q = (
        queries.select(
            F.col(id_col).alias("q"), _as_double(F.col(vec_col)).alias("__vq")
        )
        .withColumn("__b0", _hyperplane_bucket(F.col("__vq"), planes))
        .select(
            "q",
            "__vq",
            F.explode(
                _probe_array(F.col("__b0"), num_planes, probe_flips)
            ).alias("__bucket"),
        )
        .withColumn("__nq", norm_expr(F.col("__vq")))
    )
    c = (
        corpus.select(
            F.col(id_col).alias("c"), _as_double(F.col(vec_col)).alias("__vc")
        )
        .select(
            "c",
            "__vc",
            # corpus rows sit in their base bucket only; queries multi-probe
            _hyperplane_bucket(F.col("__vc"), planes).alias("__bucket"),
        )
        .withColumn("__nc", norm_expr(F.col("__vc")))
    )
    # norms once per row pre-join; per-pair only the codegen-unrolled dot.
    # sim is computed BEFORE dropDuplicates so the dedup aggregates only
    # (q, c, sim) scalars — deduping with the vector arrays still attached
    # forces first(ARRAY) into a sort-based aggregation over the full
    # candidate volume (observed as a 90 s single-task stage).
    scored = (
        q.join(c, "__bucket")
        .where(F.col("q") != F.col("c"))
        .select(
            "q",
            "c",
            (
                dot_unrolled(F.col("__vq"), F.col("__vc"), dim)
                / (F.col("__nq") * F.col("__nc"))
            ).alias("sim"),
        )
        .dropDuplicates(["q", "c"])
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("c").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k.

    Coarse centroids are a deterministic sample of the corpus (k-means++-ish
    seeding without the iterations — adequate as a partitioner); every corpus
    vector joins its nearest list, every query probes its n_probe nearest
    lists.  Centroids are broadcast; the candidate join is an equi-join on
    list id.
    """
    sample = corpus.select(vec_col).limit(max(n_lists * 20, 200)).collect()
    X = np.array([list(r[0]) for r in sample], dtype=np.float64)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(X), size=min(n_lists, len(X)), replace=False)
    centroids = X[idx]
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1)[:, None], 1e-12)

    def nearest_lists(vec: Column, n: int) -> Column:
        sims = F.array(*[_proj_expr(vec, cent) for cent in centroids])
        pairs = F.transform(
            sims, lambda s, i: F.struct(s.alias("s"), i.alias("list_id"))
        )
        top = F.slice(F.reverse(F.array_sort(pairs)), 1, n)
        return F.transform(top, lambda t: t["list_id"])

    from tsne_flink_spark.functions.metrics import dot_unrolled

    dim = int(centroids.shape[1])
    # materialize the cast-to-double vector first so the centroid projections
    # index a column, not a re-derived transform expression
    c = (
        corpus.select(
            F.col(id_col).alias("c"), _as_double(F.col(vec_col)).alias("__vc")
        )
        .select("c", "__vc", nearest_lists(F.col("__vc"), 1)[0].alias("__list"))
        .withColumn("__nc", norm_expr(F.col("__vc")))
    )
    q = (
        queries.select(
            F.col(id_col).alias("q"), _as_double(F.col(vec_col)).alias("__vq")
        )
        .select(
            "q",
            "__vq",
            F.explode(nearest_lists(F.col("__vq"), n_probe)).alias("__list"),
        )
        .withColumn("__nq", norm_expr(F.col("__vq")))
    )
    # norms once per row pre-join; per-pair only the codegen-unrolled dot.
    # sim computed BEFORE dropDuplicates — see lsh_top_k for why.
    scored = (
        q.join(c, "__list")
        .where(F.col("q") != F.col("c"))
        .select(
            "q",
            "c",
            (
                dot_unrolled(F.col("__vq"), F.col("__vc"), dim)
                / (F.col("__nq") * F.col("__nc"))
            ).alias("sim"),
        )
        .dropDuplicates(["q", "c"])
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("c").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
