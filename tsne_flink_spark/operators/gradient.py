"""t-SNE gradient: attractive forces from sparse P, repulsive forces exact or
Barnes-Hut, combined as ``attr - rep/sumQ`` (no x4 factor — reference quirk
Q3, TsneHelpers.scala:311-317, compensated by the default learning rate).

Reference: TsneHelpers.scala:221-318.

Spark-first redesign (SURVEY §2.4): the reference broadcasts the FULL
embedding into the attractive-force map every iteration
(TsneHelpers.scala:307) — its scalability ceiling.  Here the attractive force
is a pair of equi-joins on the COO P edges plus a per-point aggregation:
O(N*k) rows shuffled, no O(N) per-task state.  Repulsive forces:

- theta == 0: exact, pure-DataFrame — crossJoin + Column-expression math
  (equals the quadtree degenerate case; used by the golden tests).
- theta > 0: Barnes-Hut — tree built driver-side or distributed
  (``tree_build``), broadcast, and forces evaluated in a vectorized
  ``mapInPandas`` (the reference does the same tree broadcast,
  TsneHelpers.scala:234-264); or ``tree_build="summary"`` — the 100-TB
  scale path that replaces the O(N) per-iteration tree broadcast with a
  depth-capped far-field summary + near-field shuffle (operators/farfield.py,
  BASELINE.md B14).
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsne_flink_spark.functions.metrics import metric_expr, sqeuclidean
from tsne_flink_spark.operators.quadtree import (
    build_quadtree,
    build_quadtree_distributed,
)


def _repulsive_exact(embedding: DataFrame, n_components: int) -> DataFrame:
    """Exact repulsive forces: for each i, sum over j with y_j != y_i of
    Q^2 * (y_i - y_j), and sum_q_i = sum of Q, where Q = 1/(1 + ||y_i-y_j||^2).

    Value-inequality (not id-inequality) matches the quadtree's handling of
    coincident points (QuadTree.scala:128): a bit-equal point contributes 0.
    The tree always uses squared Euclidean distance regardless of the kNN
    metric (QuadTree.scala:133) — replicated.
    """
    a = embedding.select(F.col("id"), F.col("y").alias("__yi"))
    b = embedding.select(F.col("y").alias("__yj"))
    pairs = a.crossJoin(b).where(~(F.col("__yi") == F.col("__yj")))
    q = F.lit(1.0) / (F.lit(1.0) + sqeuclidean(F.col("__yi"), F.col("__yj")))
    terms = pairs.select(
        "id",
        q.alias("__q"),
        *[
            (F.col("__yi")[c] - F.col("__yj")[c]).alias(f"__d{c}")
            for c in range(n_components)
        ],
    )
    return terms.groupBy("id").agg(
        F.array(
            *[
                F.sum(F.col("__q") * F.col("__q") * F.col(f"__d{c}"))
                for c in range(n_components)
            ]
        ).alias("rep"),
        F.sum("__q").alias("sumq"),
    )


def _bounds_with_count(embedding: DataFrame):
    """7-value bounds/mean/count aggregate — the only per-iteration driver
    round-trip the summary and auto paths need."""
    return embedding.agg(
        F.min(F.col("y")[0]).alias("x0"),
        F.max(F.col("y")[0]).alias("x1"),
        F.min(F.col("y")[1]).alias("y0"),
        F.max(F.col("y")[1]).alias("y1"),
        F.avg(F.col("y")[0]).alias("mx"),
        F.avg(F.col("y")[1]).alias("my"),
        F.count(F.lit(1)).alias("n"),
    ).first()


def _repulsive_summary(
    embedding: DataFrame,
    theta: float,
    fix_bounds_mean: bool,
    bh_condition: str,
    summary_depth: int | None = None,
    bounds=None,
) -> DataFrame | None:
    """Barnes-Hut repulsion WITHOUT the per-iteration O(N) tree broadcast
    (BASELINE.md B11): broadcast a depth-capped cell-aggregate pyramid
    (O(4^D) bytes, constant in N) and shuffle each point only to the query
    blocks within a theta-derived halo.  See operators/farfield.py for the
    decomposition and its accuracy argument.

    Returns None when the regime calls for the full-tree path instead
    (degenerate extent, tiny N, or halo ~ grid — e.g. the reference's
    non-scale-invariant condition on a compressed embedding, which
    degenerates to exact evaluation by design).
    """
    from tsne_flink_spark.operators import farfield
    from tsne_flink_spark.operators.quadtree import build_quadtree

    spark = embedding.sparkSession
    b = bounds if bounds is not None else _bounds_with_count(embedding)
    if b is None or b["x0"] is None:
        return None
    mx, my = (float(b["mx"]), float(b["my"])) if fix_bounds_mean else (0.0, 0.0)
    half = max(float(b["x1"] - b["x0"]), float(b["y1"] - b["y0"]))
    plan = farfield.plan_summary(
        int(b["n"]), half, theta, bh_condition, mx, my,
        summary_depth=summary_depth,
    )
    if plan is None:
        return None

    grid, cellw, rc = plan.grid, plan.cellw, plan.rc
    block, bpa = 1 << plan.block_bits, plan.blocks_per_axis
    x_origin, y_origin = mx - half, my - half

    def cell_ix(col: str, origin: float):
        return F.least(
            F.greatest(F.floor((F.col(col) - F.lit(origin)) / F.lit(cellw)),
                       F.lit(0)),
            F.lit(grid - 1),
        ).cast("long")

    pts = embedding.select(
        "id", F.col("y")[0].alias("px"), F.col("y")[1].alias("py")
    ).withColumn("ix", cell_ix("px", x_origin)).withColumn(
        "iy", cell_ix("py", y_origin)
    )

    # mass side: replicate the full-tree root containment (insert drops
    # points outside the root cell — reference behavior)
    mass = pts.where(
        (F.abs(F.col("px") - F.lit(mx)) <= F.lit(half))
        & (F.abs(F.col("py") - F.lit(my)) <= F.lit(half))
    )

    # depth-D cell aggregates (map-side combined, <= 4^D rows shuffled) ->
    # per-partition partial pyramids -> executor-side treeReduce merge.  The
    # driver receives only the FINISHED pyramid (O(4^D), the object it must
    # hold to broadcast anyway) — no per-iteration row collect and no
    # driver-side pyramid build (was a .toPandas() of up to 4^D rows).
    agg = mass.groupBy((F.col("ix") * grid + F.col("iy")).alias("cell")).agg(
        F.count(F.lit(1)).alias("cum"),
        F.sum("px").alias("sx"),
        F.sum("py").alias("sy"),
    )

    def part_pyramid(rows):
        cells, cums, sxs, sys = [], [], [], []
        for r in rows:
            cells.append(r["cell"])
            cums.append(r["cum"])
            sxs.append(r["sx"])
            sys.append(r["sy"])
        yield farfield.build_pyramid(
            np.asarray(cells, dtype=np.int64),
            np.asarray(cums, dtype=np.int64),
            np.asarray(sxs, dtype=np.float64),
            np.asarray(sys, dtype=np.float64),
            plan,
        )

    parts = agg.rdd.mapPartitions(part_pyramid)
    if parts.getNumPartitions() == 0:
        # all points outside the root cell (reference drop semantics): AQE
        # collapses the empty aggregate to a zero-partition RDD treeReduce
        # cannot reduce — the pyramid is simply empty
        z = np.zeros(0, dtype=np.int64)
        levels = farfield.build_pyramid(z, z, z.astype(float), z.astype(float), plan)
    else:
        levels = parts.treeReduce(farfield.merge_pyramids, depth=2)
    bc = spark.sparkContext.broadcast(levels)

    # Explicitly repartition both cogroup sides on the block key: the
    # cogroup's own exchange gets AQE-coalesced by SIZE (a few bytes/row),
    # which serialized the CPU-heavy eval_block Python stage onto ~14 tasks
    # at N=1M; an explicit repartition is exempt from coalescing and
    # Catalyst elides the redundant second exchange.
    n_eval = spark.sparkContext.defaultParallelism * 2
    qdf = pts.withColumn(
        "bkey",
        (F.shiftright(F.col("ix"), plan.block_bits) * bpa
         + F.shiftright(F.col("iy"), plan.block_bits)),
    ).select("id", "px", "py", "bkey").repartition(n_eval, "bkey")

    # near-field shipping: a point in cell (ix, iy) is essential for every
    # block whose halo rectangle [block*b - rc, block*b + block-1 + rc]
    # contains the cell — a 1-4 block range per axis for typical rc
    def block_range(col: str):
        lo = F.greatest(
            F.floor((F.col(col) - F.lit(rc)) / F.lit(float(block))), F.lit(0)
        ).cast("long")
        hi = F.least(
            F.floor((F.col(col) + F.lit(rc)) / F.lit(float(block))),
            F.lit(bpa - 1),
        ).cast("long")
        return F.sequence(lo, hi)

    # NOTE: the point side shares lineage with qdf; same-name attributes on
    # both cogroup sides get silently deduplicated away (observed: the right
    # side arrives with only the grouping key), so alias to distinct names
    pmass = (
        mass.withColumn("bx", F.explode(block_range("ix")))
        .withColumn("by", F.explode(block_range("iy")))
        .select(
            F.col("px").alias("nx"),
            F.col("py").alias("ny"),
            (F.col("bx") * bpa + F.col("by")).alias("nbkey"),
        )
        .repartition(n_eval, "nbkey")
    )

    def eval_block(key, qpdf: pd.DataFrame, ppdf: pd.DataFrame):
        if not len(qpdf):
            return pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "rep": pd.Series([], dtype=object),
                 "sumq": pd.Series([], dtype="float64")}
            )
        bx, by = divmod(int(key[0]), bpa)
        qx = qpdf["px"].to_numpy(np.float64)
        qy = qpdf["py"].to_numpy(np.float64)
        halo = (
            bx * block - rc, bx * block + block - 1 + rc,
            by * block - rc, by * block + block - 1 + rc,
        )
        qbbox = (qx.min(), qx.max(), qy.min(), qy.max())
        w, comx, comy = farfield.far_masses(bc.value, plan, halo, qbbox)
        forces, sumq = farfield.eval_far(qx, qy, w, comx, comy)
        if len(ppdf):
            P = np.stack(
                [ppdf["nx"].to_numpy(np.float64), ppdf["ny"].to_numpy(np.float64)],
                axis=1,
            )
            ltree = build_quadtree(P, fix_bounds_mean=True)
            Q = np.stack([qx, qy], axis=1)
            nf, ns = ltree.repulsive_forces(Q, theta, condition=bh_condition)
            forces += nf
            sumq += ns
        return pd.DataFrame(
            {"id": qpdf["id"].to_numpy(), "rep": list(forces), "sumq": sumq}
        )

    return (
        qdf.groupby("bkey")
        .cogroup(pmass.groupby("nbkey"))
        .applyInPandas(eval_block, schema="id int, rep array<double>, sumq double")
    )


# Auto-mode policy constants (BASELINE.md B14): the pickled full quadtree
# measured 213 MB at N=1M, so ~220 bytes/point with headroom; above a 64 MB
# per-iteration broadcast budget the summary far-field path is selected.
# The d-dim NDTree's per-point bytes are dominated by the 2^d-wide child
# table: 55 * 2^d reproduces both measured values (220 B/pt at d=2, B14;
# 440 B/pt at d=3, N=1M, tools/probe_summary_nd.py round 7).
_TREE_BYTES_PER_POINT = 220
_AUTO_BROADCAST_BUDGET = 64 << 20  # => auto switches to summary at N ~ 305k
# Below this N the auto policy builds the tree ON THE DRIVER from one
# collect instead of the distributed build (r15, guide §2.4/§5): the
# full-tree regime broadcasts the finished tree from the driver either
# way, so at small N the distributed build's extra per-iteration jobs
# (bounds aggregate + df.rdd pickle pass + depth-2 treeReduce = 3 driver
# round-trips) buy nothing over one bounded collect (<= 64k rows * ~50 B
# = ~3 MB, far under the 64 MB tree-broadcast budget that already caps
# this regime).  Measured on the flagship (N=2k, 20 iterations, sf0.1):
# 37.5 -> 28.9 s at equal host calibration.  Above this N the
# construction cost itself matters and the executor-merged build keeps
# the win (B14/B20).
_AUTO_DRIVER_BUILD_MAX_N = 1 << 16


def _nd_tree_bytes_per_point(d: int) -> int:
    return 55 << d


def _bounds_with_count_nd(embedding: DataFrame, d: int):
    """d-dim bounds/mean/count aggregate (min_k / max_k / mean_k / n) — the
    only per-iteration driver round-trip the d-dim summary path needs.
    Row shape matches build_ndtree_distributed's ``bounds`` parameter."""
    aggs = []
    for k in range(d):
        aggs += [
            F.min(F.col("y")[k]).alias(f"min_{k}"),
            F.max(F.col("y")[k]).alias(f"max_{k}"),
            F.avg(F.col("y")[k]).alias(f"mean_{k}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("n"))
    return embedding.agg(*aggs).first()


def _repulsive_summary_nd(
    embedding: DataFrame,
    theta: float,
    d: int,
    fix_bounds_mean: bool,
    bh_condition: str,
    summary_depth: int | None = None,
    bounds=None,
) -> DataFrame | None:
    """d-dimensional far-field summary repulsion — the 100-TB path for
    n_components != 2 (generalizes :func:`_repulsive_summary`, which remains
    the tuned 2-D surface): broadcast a depth-capped 2^d-ary cell-aggregate
    pyramid (O(2^(d*D)) bytes, constant in N) and shuffle each point only to
    the query blocks within a theta-derived chebyshev halo.  Near field is
    evaluated with a local NDTree per block (full leaf-level accuracy incl.
    coincident-point semantics); far field as guaranteed-accepted cell
    masses.  Returns None in regimes the full-tree path should handle."""
    from tsne_flink_spark.operators import farfield
    from tsne_flink_spark.operators.ndtree import build_ndtree

    spark = embedding.sparkSession
    b = bounds if bounds is not None else _bounds_with_count_nd(embedding, d)
    if b is None or b["min_0"] is None:
        return None
    center = np.array(
        [float(b[f"mean_{k}"]) for k in range(d)]
        if fix_bounds_mean
        else [0.0] * d
    )
    half = max(float(b[f"max_{k}"] - b[f"min_{k}"]) for k in range(d))
    plan = farfield.plan_summary_nd(
        int(b["n"]), d, half, theta, bh_condition, center=tuple(center),
        summary_depth=summary_depth,
    )
    if plan is None:
        return None

    grid, cellw, rc = plan.grid, plan.cellw, plan.rc
    block, bpa = 1 << plan.block_bits, plan.blocks_per_axis
    origin = center - half

    def cell_ix(col: str, org: float):
        return F.least(
            F.greatest(F.floor((F.col(col) - F.lit(org)) / F.lit(cellw)),
                       F.lit(0)),
            F.lit(grid - 1),
        ).cast("long")

    pts = embedding.select(
        "id", *[F.col("y")[k].alias(f"p{k}") for k in range(d)]
    )
    for k in range(d):
        pts = pts.withColumn(f"i{k}", cell_ix(f"p{k}", float(origin[k])))

    # mass side: replicate the full-tree root containment (insert drops
    # points outside the root cell — reference behavior)
    contained = F.lit(True)
    for k in range(d):
        contained = contained & (
            F.abs(F.col(f"p{k}") - F.lit(float(center[k]))) <= F.lit(half)
        )
    mass = pts.where(contained)

    # depth-D cell aggregates -> per-partition partial pyramids ->
    # executor-side treeReduce merge (same protocol as the 2-D path)
    cell_expr = F.lit(0).cast("long")
    for k in range(d):
        cell_expr = cell_expr + F.col(f"i{k}") * F.lit(grid ** k)
    agg = mass.groupBy(cell_expr.alias("cell")).agg(
        F.count(F.lit(1)).alias("cum"),
        *[F.sum(f"p{k}").alias(f"s{k}") for k in range(d)],
    )

    def part_pyramid(rows):
        cells, cums, svals = [], [], []
        for r in rows:
            cells.append(r["cell"])
            cums.append(r["cum"])
            svals.append([r[f"s{k}"] for k in range(d)])
        yield farfield.build_pyramid_nd(
            np.asarray(cells, dtype=np.int64),
            np.asarray(cums, dtype=np.int64),
            np.asarray(svals, dtype=np.float64).reshape(len(cells), d),
            plan,
        )

    parts = agg.rdd.mapPartitions(part_pyramid)
    if parts.getNumPartitions() == 0:
        z = np.zeros(0, dtype=np.int64)
        levels = farfield.build_pyramid_nd(
            z, z, np.zeros((0, d)), plan
        )
    else:
        levels = parts.treeReduce(farfield.merge_pyramids_nd, depth=2)
    bc = spark.sparkContext.broadcast(levels)

    # explicit block-key repartition on both cogroup sides (AQE coalesces
    # by bytes and would serialize the CPU-heavy Python stage — B14)
    n_eval = spark.sparkContext.defaultParallelism * 2
    bkey_expr = F.lit(0).cast("long")
    for k in range(d):
        bkey_expr = bkey_expr + (
            F.shiftright(F.col(f"i{k}"), plan.block_bits) * F.lit(bpa ** k)
        )
    qdf = pts.withColumn("bkey", bkey_expr).select(
        "id", *[f"p{k}" for k in range(d)], "bkey"
    ).repartition(n_eval, "bkey")

    def block_range(col: str):
        lo = F.greatest(
            F.floor((F.col(col) - F.lit(rc)) / F.lit(float(block))), F.lit(0)
        ).cast("long")
        hi = F.least(
            F.floor((F.col(col) + F.lit(rc)) / F.lit(float(block))),
            F.lit(bpa - 1),
        ).cast("long")
        return F.sequence(lo, hi)

    pm = mass
    for k in range(d):
        pm = pm.withColumn(f"b{k}", F.explode(block_range(f"i{k}")))
    nbkey_expr = F.lit(0).cast("long")
    for k in range(d):
        nbkey_expr = nbkey_expr + F.col(f"b{k}") * F.lit(bpa ** k)
    # alias to distinct names: same-name attributes on both cogroup sides
    # get silently deduplicated away (see the 2-D path's note)
    pmass = pm.select(
        *[F.col(f"p{k}").alias(f"n{k}") for k in range(d)],
        nbkey_expr.alias("nbkey"),
    ).repartition(n_eval, "nbkey")

    halo_lo_off = np.full(d, -rc, dtype=np.int64)
    halo_hi_off = np.full(d, block - 1 + rc, dtype=np.int64)

    def eval_block(key, qpdf: pd.DataFrame, ppdf: pd.DataFrame):
        if not len(qpdf):
            return pd.DataFrame(
                {"id": pd.Series([], dtype="int64"),
                 "rep": pd.Series([], dtype=object),
                 "sumq": pd.Series([], dtype="float64")}
            )
        rem = int(key[0])
        bidx = np.zeros(d, dtype=np.int64)
        for k in range(d):
            bidx[k] = rem % bpa
            rem //= bpa
        Qp = np.stack(
            [qpdf[f"p{k}"].to_numpy(np.float64) for k in range(d)], axis=1
        )
        halo_lo = bidx * block + halo_lo_off
        halo_hi = bidx * block + halo_hi_off
        q_lo, q_hi = Qp.min(axis=0), Qp.max(axis=0)
        w, com = farfield.far_masses_nd(
            bc.value, plan, halo_lo, halo_hi, q_lo, q_hi
        )
        forces, sumq = farfield.eval_far_nd(Qp, w, com)
        if len(ppdf):
            P = np.stack(
                [ppdf[f"n{k}"].to_numpy(np.float64) for k in range(d)], axis=1
            )
            ltree = build_ndtree(P, fix_bounds_mean=True)
            nf, ns = ltree.repulsive_forces(Qp, theta, condition=bh_condition)
            forces += nf
            sumq += ns
        return pd.DataFrame(
            {"id": qpdf["id"].to_numpy(), "rep": list(forces), "sumq": sumq}
        )

    return (
        qdf.groupby("bkey")
        .cogroup(pmass.groupby("nbkey"))
        .applyInPandas(eval_block, schema="id int, rep array<double>, sumq double")
    )


def _repulsive_barnes_hut(
    embedding: DataFrame,
    theta: float,
    n_components: int,
    fix_bounds_mean: bool = False,
    bh_condition: str = "reference",
    tree_build: str = "auto",
    n_hint: int | None = None,
) -> tuple[DataFrame, bool]:
    """Barnes-Hut repulsive forces.  Returns ``(rep, used_summary)`` —
    callers materialize the heavy cogroup pipeline only when the summary
    path actually ran.

    ``tree_build="auto"`` (default) picks the path from the data: the
    full-tree broadcast costs ~``_TREE_BYTES_PER_POINT * N`` bytes per
    iteration (213 MB measured at N=1M, B14); when the estimate exceeds
    ``_AUTO_BROADCAST_BUDGET`` the O(1)-broadcast far-field summary path is
    selected, else the reference-parity full tree.  ``"distributed"`` builds
    per-partition subtrees and merges them executor-side
    (``build_quadtree_distributed``): the driver sees only a 6-value bounds
    aggregate and the finished tree.  ``"driver"`` keeps the legacy
    collect-and-build path (useful for small N and equivalence tests; the
    reference broadcasts the full tree the same way,
    TsneHelpers.scala:234-264).  ``"summary"`` forces the far-field summary
    (falls back to full-tree in degenerate regimes).
    """
    if tree_build not in ("auto", "driver", "stub", "distributed", "summary"):
        raise ValueError(
            f"tree_build must be one of 'auto', 'driver', 'stub', "
            f"'distributed', 'summary'; got {tree_build!r}"
        )
    if n_components != 2:
        # the reference's BH path is a 2-D quadtree only (QuadTree.scala)
        # even though its CLI accepts --nComponents; the d-dimensional
        # NDTree closes that surface (beyond-reference, same semantics),
        # with its own auto policy: the d-dim far-field summary replaces
        # the O(N) NDTree broadcast above the budget.
        return _repulsive_barnes_hut_nd(
            embedding, theta, n_components, fix_bounds_mean, bh_condition,
            tree_build, n_hint=n_hint,
        )
    bounds = None
    if tree_build == "auto" and n_hint is not None:
        # the caller told us N (the iteration loop counts the working set
        # once — row count is loop-invariant); decide without the bounds
        # aggregate.  A wrong hint only changes WHICH build path runs —
        # every path builds from the actual rows — so correctness never
        # depends on it.
        tree_build = (
            "summary"
            if n_hint * _TREE_BYTES_PER_POINT > _AUTO_BROADCAST_BUDGET
            else "driver"
            if n_hint <= _AUTO_DRIVER_BUILD_MAX_N
            else "distributed"
        )
    if tree_build in ("auto", "summary"):
        bounds = _bounds_with_count(embedding)
        if tree_build == "auto":
            n = int(bounds["n"]) if bounds is not None and bounds["n"] is not None else 0
            tree_build = (
                "summary"
                if n * _TREE_BYTES_PER_POINT > _AUTO_BROADCAST_BUDGET
                else "driver"
                if n <= _AUTO_DRIVER_BUILD_MAX_N
                else "distributed"
            )
    if tree_build == "summary":
        res = _repulsive_summary(
            embedding, theta, fix_bounds_mean, bh_condition, bounds=bounds
        )
        if res is not None:
            return res, True
        tree_build = "distributed"  # degenerate regime: full-tree fallback
    if tree_build == "driver":
        rows = embedding.select("id", "y").collect()
        Y = np.array([r["y"] for r in rows], dtype=np.float64)
        tree = build_quadtree(Y, fix_bounds_mean=fix_bounds_mean)
    elif tree_build == "stub":
        # plan-only mode: broadcast an empty tree so the full physical plan
        # (including the mapInPandas force stage) can be built and explained
        # WITHOUT running any job — the reference's --executionPlan dumps the
        # lazily assembled graph unexecuted (Tsne.scala:89-95)
        from tsne_flink_spark.operators.quadtree import QuadTree

        tree = QuadTree(0.0, 0.0, 1.0)
    else:
        tree = build_quadtree_distributed(
            embedding, fix_bounds_mean=fix_bounds_mean, bounds=bounds
        )
    bc = embedding.sparkSession.sparkContext.broadcast(tree)

    def eval_forces(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            Q = np.array([np.asarray(v) for v in pdf["y"]], dtype=np.float64)
            forces, sumq = t.repulsive_forces(Q, theta, condition=bh_condition)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "rep": list(forces),
                    "sumq": sumq,
                }
            )

    return (
        embedding.mapInPandas(
            eval_forces, schema="id int, rep array<double>, sumq double"
        ),
        False,
    )


def _repulsive_barnes_hut_nd(
    embedding: DataFrame,
    theta: float,
    n_components: int,
    fix_bounds_mean: bool,
    bh_condition: str,
    tree_build: str,
    n_hint: int | None = None,
) -> tuple[DataFrame, bool]:
    """Barnes-Hut repulsion for n_components != 2 via the d-dimensional
    NDTree (octree at d=3) — driver or executor-merged build + broadcast +
    vectorized mapInPandas evaluation, mirroring the 2-D paths, including
    the auto policy: above the broadcast budget the d-dim far-field summary
    (``_repulsive_summary_nd``) replaces the O(N) NDTree broadcast."""
    from tsne_flink_spark.operators.ndtree import (
        NDTree,
        build_ndtree,
        build_ndtree_distributed,
    )

    d = n_components
    bounds = None
    if tree_build == "auto" and n_hint is not None:
        # see _repulsive_barnes_hut: loop-invariant N skips the bounds job
        tree_build = (
            "summary"
            if n_hint * _nd_tree_bytes_per_point(d) > _AUTO_BROADCAST_BUDGET
            else "driver"
            if n_hint <= _AUTO_DRIVER_BUILD_MAX_N
            else "distributed"
        )
    if tree_build in ("auto", "summary"):
        bounds = _bounds_with_count_nd(embedding, d)
        if tree_build == "auto":
            n = (
                int(bounds["n"])
                if bounds is not None and bounds["n"] is not None
                else 0
            )
            tree_build = (
                "summary"
                if n * _nd_tree_bytes_per_point(d) > _AUTO_BROADCAST_BUDGET
                else "driver"
                if n <= _AUTO_DRIVER_BUILD_MAX_N
                else "distributed"
            )
    if tree_build == "summary":
        res = _repulsive_summary_nd(
            embedding, theta, d, fix_bounds_mean, bh_condition, bounds=bounds
        )
        if res is not None:
            return res, True
        tree_build = "distributed"  # degenerate regime: full-tree fallback
    if tree_build == "driver":
        rows = embedding.select("id", "y").collect()
        Y = np.array([r["y"] for r in rows], dtype=np.float64).reshape(-1, d)
        tree = build_ndtree(Y, fix_bounds_mean=fix_bounds_mean)
    elif tree_build == "stub":
        tree = NDTree(np.zeros(d), 1.0)
    else:
        tree = build_ndtree_distributed(
            embedding, d, fix_bounds_mean=fix_bounds_mean, bounds=bounds
        )
    bc = embedding.sparkSession.sparkContext.broadcast(tree)

    def eval_forces(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            Q = np.array([np.asarray(v) for v in pdf["y"]], dtype=np.float64)
            forces, sumq = t.repulsive_forces(Q, theta, condition=bh_condition)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "rep": list(forces), "sumq": sumq}
            )

    return (
        embedding.mapInPandas(
            eval_forces, schema="id int, rep array<double>, sumq double"
        ),
        False,
    )


def gradient(
    p_coo: DataFrame,
    embedding: DataFrame,
    metric: str = "sqeuclidean",
    theta: float = 0.0,
    n_components: int = 2,
    compute_loss: bool = False,
    fix_bounds_mean: bool = False,
    bh_condition: str = "reference",
    tree_build: str = "auto",
    n_hint: int | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """One gradient evaluation.

    Returns ``(grad, loss)``: grad is (id, dy ARRAY<DOUBLE>); loss is a 1-row
    (loss DOUBLE) DataFrame when ``compute_loss`` (KL divergence
    sum p*log(p / (q/sumQ)), TsneHelpers.scala:297-300) else None.
    """
    if theta == 0.0:
        rep = _repulsive_exact(embedding, n_components)
        if os.environ.get("TSNE_SPARK_PIN_REP") == "1":
            from tsne_flink_spark.operators.optimize import materialize

            rep = materialize(rep)
    else:
        rep, used_summary = _repulsive_barnes_hut(
            embedding,
            theta,
            n_components,
            fix_bounds_mean=fix_bounds_mean,
            bh_condition=bh_condition,
            tree_build=tree_build,
            n_hint=n_hint,
        )
        if used_summary or os.environ.get("TSNE_SPARK_PIN_REP") == "1":
            # rep feeds BOTH the sum_q aggregate and the grad join; without
            # pinning it, the whole summary pipeline (near-field shuffle +
            # per-block Python evaluation) runs twice per iteration, and the
            # two evaluations could rebuild local trees from different
            # shuffle row orders (last-bit rep/sumq inconsistency).  The
            # full-tree paths (including the summary path's own degenerate-
            # regime fallback) re-evaluate only a cheap broadcast-tree
            # mapInPandas, so they keep the lazy form.
            # TSNE_SPARK_PIN_REP=1 pins the full-tree rep too (A/B probe,
            # tools/ab_rep_materialize.py).
            from tsne_flink_spark.operators.optimize import materialize

            rep = materialize(rep)

    sum_q = rep.agg(F.sum("sumq").alias("__sum_q"))

    # NOTE (r15, measured): broadcast-hinting the N-row join sides here
    # (yi/yj/rep and the update join's dy) to skip AQE's shuffle-stage
    # materialization was tried and REJECTED — alternating revision A/B
    # read the hinted build 1.5-1.9x SLOWER warm (57-62 s vs 32-41 s at
    # equal np calibration).  Every hinted side sits above a fresh
    # Python-eval subtree, so each broadcast build serializes that
    # subtree through a single driver collect per iteration; AQE's
    # sub-jobs are cheaper than the forced driver round-trips (the same
    # conclusion as round 1's "AQE off is 4x worse" probe).

    # attractive forces: P edges joined with both endpoint embeddings
    yi = embedding.select(F.col("id").alias("i"), F.col("y").alias("__yi"))
    yj = embedding.select(F.col("id").alias("j"), F.col("y").alias("__yj"))
    edges = (
        p_coo.join(yi, "i")
        .join(yj, "j")
        .withColumn(
            "__q",
            F.lit(1.0)
            / (F.lit(1.0) + metric_expr(metric, F.col("__yi"), F.col("__yj"))),
        )
    )
    attr = edges.groupBy("i").agg(
        F.array(
            *[
                F.sum(F.col("v") * F.col("__q") * (F.col("__yi")[c] - F.col("__yj")[c]))
                for c in range(n_components)
            ]
        ).alias("attr")
    )

    grad = (
        attr.withColumnRenamed("i", "id")
        .join(rep, "id")
        .crossJoin(F.broadcast(sum_q))
        .select(
            "id",
            F.zip_with(
                "attr",
                F.transform(F.col("rep"), lambda r: r / F.col("__sum_q")),
                lambda a, r: a - r,
            ).alias("dy"),
        )
    )

    loss = None
    if compute_loss:
        loss = (
            edges.crossJoin(F.broadcast(sum_q))
            .agg(
                F.sum(
                    F.col("v")
                    * F.log(F.col("v") / (F.col("__q") / F.col("__sum_q")))
                ).alias("loss")
            )
        )
    return grad, loss
