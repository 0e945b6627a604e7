"""Distributed Pareto frontier (skyline): the rows of a DataFrame not
STRICTLY dominated on a set of criteria columns — "largest AND most
recent orders", "cheapest AND closest suppliers" — the multi-criteria
top that no single ORDER BY can express.

Dominance: p dominates o iff p >= o on every criterion and p > o on at
least one (after direction normalization).  Ties/duplicate points are
all kept — equal points do not dominate each other — matching the
NOT EXISTS relational definition the DuckDB oracle uses.

Scale design: the skyline is MERGEABLE — a row dominated within any
subset is dominated globally — so phase 1 computes a local skyline per
partition with an Arrow-batched numpy kernel (no shuffle of the fact
table), and phase 2 merges only the per-partition survivors on a single
task.  For d criteria over n random rows the expected skyline is
O((ln n)^(d-1)) — the survivor set is tiny next to the input (8 rows
from 15k orders at sf0.01) — and the phase-2 input is bounded by
(#partitions x local skyline size), not by n.  Worst case
(anti-correlated criteria) the skyline itself is O(n); no engine can
return it without materializing it, and the same kernel degrades
gracefully (it is O(s) per row, s = running skyline size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _as_float(s: pd.Series) -> np.ndarray:
    """Criterion column as float64 for vectorized dominance tests.
    Numeric columns pass through; date/timestamp columns map to their
    epoch nanoseconds (order-preserving; day/µs-granular values are far
    above float64's ~256 ns resolution at epoch scale)."""
    if np.issubdtype(s.dtype, np.number):
        return s.to_numpy(dtype="float64")
    return (
        pd.to_datetime(s)
        .to_numpy(dtype="datetime64[ns]")
        .astype("int64")
        .astype("float64")
    )


def _skyline_2d(pts: np.ndarray) -> np.ndarray:
    """2-criteria skyline, fully vectorized O(n log n): after a
    descending lexicographic sort of the DISTINCT points, a point is
    non-dominated iff its second coordinate strictly exceeds the running
    max of every point before it (ties on the first coordinate resolve
    correctly — the higher-second-coordinate twin precedes and raises
    the running max past its sibling); exact duplicates are deduped
    first and re-expanded, since equal points do not dominate each
    other.  This keeps the SINGLE-TASK merge linear even when the
    frontier itself is huge (anti-correlated data), where a
    test-against-kept sweep would be O(n·s)."""
    uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
    u = uniq[::-1]  # descending lex by (c0, c1)
    runmax_before = np.concatenate(
        ([-np.inf], np.maximum.accumulate(u[:-1, 1]))
    )
    keep_desc = u[:, 1] > runmax_before
    mask = keep_desc[::-1][inverse]
    return np.nonzero(mask)[0].astype(np.int64)


def _skyline_3d(pts: np.ndarray) -> np.ndarray:
    """3-criteria skyline via the classic sweep (Kung-Luccio-Preparata
    1975 step for d=3, O(n log s)): iterate DISTINCT points in
    descending lexicographic order — every earlier point e satisfies
    e0 >= p0 (at the first differing column e is larger), so p is
    dominated iff some earlier point also has e1 >= p1 AND e2 >= p2,
    i.e. iff the (c1, c2) projection of p falls under the Pareto
    STAIRCASE of the earlier points' projections.  The staircase (xs
    ascending, ys strictly descending) answers that in one bisect: among
    entries with x >= p1, the max y sits at the FIRST such x.  Distinct
    points make every staircase hit a STRICT dominance (equality on all
    three dims is impossible after dedup).  Survivors insert their
    projection, evicting envelope entries they dominate — total
    insertions + evictions are O(n), so the sweep stays O(n log s) even
    in the anti-correlated worst case where the frontier IS the input
    and the d>=4 test-against-kept sweep degrades to O(n^2)."""
    import bisect

    uniq, inverse = np.unique(pts, axis=0, return_inverse=True)
    u = uniq[::-1]  # descending lex by (c0, c1, c2)
    xs: list[float] = []  # staircase c1, ascending
    ys: list[float] = []  # staircase c2, strictly descending along xs
    keep_desc = np.zeros(len(u), dtype=bool)
    for i in range(len(u)):
        c1, c2 = u[i, 1], u[i, 2]
        j = bisect.bisect_left(xs, c1)
        if j < len(xs) and ys[j] >= c2:
            continue  # strictly dominated by an earlier point
        keep_desc[i] = True
        # insert (c1, c2); evict envelope entries it dominates (those
        # with x <= c1 and y <= c2 — contiguous just before position j)
        lo = j
        while lo > 0 and ys[lo - 1] <= c2:
            lo -= 1
        xs[lo:j] = [c1]
        ys[lo:j] = [c2]
    mask = keep_desc[::-1][inverse]
    return np.nonzero(mask)[0].astype(np.int64)


def _skyline_indices(pts: np.ndarray) -> np.ndarray:
    """Row indices of the non-dominated points (maximize all columns).

    d == 2 dispatches to the vectorized running-max sweep, d == 3 to
    the staircase sweep (both O(n log n) regardless of frontier size).
    For d >= 4: descending lexicographic order — a point can never
    dominate one that sorts before it (the earlier point is >= on the
    first differing column), so the kept set only grows and each
    candidate needs one vectorized test against it — O(n·s·d) with s
    the skyline size (fine for the O((ln n)^(d-1)) expected frontier;
    the anti-correlated worst case at d >= 4 has no known
    sub-quadratic practical kernel).
    """
    if len(pts) == 0:
        return np.empty(0, dtype=np.int64)
    if pts.shape[1] == 2:
        return _skyline_2d(pts)
    if pts.shape[1] == 3:
        return _skyline_3d(pts)
    order = np.lexsort(
        tuple(pts[:, c] for c in range(pts.shape[1] - 1, -1, -1))
    )[::-1]
    kept_idx: list[int] = []
    mat = np.empty((0, pts.shape[1]))  # bulk of the kept set
    tail: list[np.ndarray] = []  # recent keeps, folded in batches of 256

    def dominated_by(block: np.ndarray, p: np.ndarray) -> bool:
        ge = (block >= p).all(axis=1)
        return bool(ge.any() and (block[ge] > p).any(axis=1).any())

    for i in order:
        p = pts[i]
        if mat.shape[0] and dominated_by(mat, p):
            continue
        if tail and dominated_by(np.vstack(tail), p):
            continue
        kept_idx.append(int(i))
        tail.append(p)
        if len(tail) >= 256:
            mat = np.vstack([mat, *tail])
            tail = []
    return np.array(sorted(kept_idx), dtype=np.int64)


def pareto_frontier(
    df: DataFrame,
    cols: list[str],
    maximize: list[bool] | None = None,
    merge: bool = True,
    by: list[str] | None = None,
) -> DataFrame:
    """All rows of ``df`` not strictly dominated on ``cols``.

    ``maximize[i]`` False minimizes that criterion (sign flip).  Criteria
    must be numeric or date/timestamp; NULL criteria rows are dropped
    (NULL is not comparable under dominance).  Output schema == input
    schema; row order is not defined (a skyline is a SET).

    ``merge=False`` stops after phase 1 and returns the per-partition
    LOCAL skylines — a superset of the global skyline that is
    MERGEABLE: persist shards per ingestion batch and
    ``pareto_frontier(union_of_shards, ...)`` later without rescanning
    the batches (the same shard-then-merge lifecycle as the HLL
    sketches), or feed the probe that measures the phase-1 reduction.

    ``by`` computes one skyline PER GROUP ("best orders per region"):
    one shuffle on the group keys, then the same kernel per group via
    applyInPandas — each group must fit one Arrow batch, the standard
    grouped-map caveat (for corpus-sized groups, run the ungrouped
    two-phase form per group value instead).
    """
    if not cols:
        raise ValueError("pareto_frontier needs at least one criterion")
    if maximize is None:
        maximize = [True] * len(cols)
    if len(maximize) != len(cols):
        raise ValueError(f"maximize must match cols: {maximize} vs {cols}")
    sign = np.array([1.0 if m else -1.0 for m in maximize])
    schema = df.schema

    if by:
        def group_skyline(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.dropna(subset=cols)
            if not len(pdf):
                return pdf
            pts = np.column_stack([_as_float(pdf[c]) for c in cols]) * sign
            return pdf.iloc[_skyline_indices(pts)]

        return df.groupBy(by).applyInPandas(group_skyline, schema)

    def local(batches):
        # amortized geometric folding: buffer incoming Arrow batches and
        # re-run the kernel only once the buffer outgrows the running
        # frontier (>= max(|kept|, 64k) rows).  A per-batch refold is
        # O(#batches x s log s) — quadratic-ish when the frontier is
        # huge (anti-correlated criteria: the 1M-row single-task merge
        # spent 2 minutes refolding ~100 times); folding geometrically
        # keeps total kernel work O(n log n) while peak memory stays
        # O(s + buffer), never the whole partition when the frontier is
        # small.
        kept: pd.DataFrame | None = None
        pending: list[pd.DataFrame] = []
        pending_rows = 0

        def fold() -> pd.DataFrame:
            frames = ([kept] if kept is not None else []) + pending
            cand = (
                frames[0]
                if len(frames) == 1
                else pd.concat(frames, ignore_index=True)
            )
            pts = np.column_stack([_as_float(cand[c]) for c in cols]) * sign
            return cand.iloc[_skyline_indices(pts)].reset_index(drop=True)

        for pdf in batches:
            pdf = pdf.dropna(subset=cols)
            if not len(pdf):
                continue
            pending.append(pdf)
            pending_rows += len(pdf)
            if pending_rows >= max(
                0 if kept is None else len(kept), 65_536
            ):
                kept = fold()
                pending, pending_rows = [], 0
        if pending:
            kept = fold()
        if kept is not None and len(kept):
            yield kept

    local_sky = df.dropna(subset=cols).mapInPandas(local, schema)
    if not merge:
        return local_sky
    # phase 2: merge the per-partition survivors on one task — input is
    # (#partitions x local skyline), not n; an explicit single-partition
    # exchange, not a global sort
    return local_sky.repartition(1).mapInPandas(local, schema)
