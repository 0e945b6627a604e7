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


def _skyline_indices(pts: np.ndarray) -> np.ndarray:
    """Row indices of the non-dominated points (maximize all columns).

    Descending lexicographic sweep: a point can never dominate one that
    sorts before it (the earlier point is >= on the first differing
    column), so the kept set only grows and each candidate needs one
    vectorized test against it — O(n·s·d) with s the skyline size.
    """
    if len(pts) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort(
        tuple(pts[:, c] for c in range(pts.shape[1] - 1, -1, -1))
    )[::-1]
    kept_idx: list[int] = []
    kept = np.empty((0, pts.shape[1]))
    for i in order:
        p = pts[i]
        ge = (kept >= p).all(axis=1)
        if ge.any() and (kept[ge] > p).any(axis=1).any():
            continue
        kept_idx.append(int(i))
        kept = np.concatenate([kept, p[None, :]])
    return np.array(sorted(kept_idx), dtype=np.int64)


def pareto_frontier(
    df: DataFrame,
    cols: list[str],
    maximize: list[bool] | None = None,
) -> DataFrame:
    """All rows of ``df`` not strictly dominated on ``cols``.

    ``maximize[i]`` False minimizes that criterion (sign flip).  Criteria
    must be numeric or date/timestamp; NULL criteria rows are dropped
    (NULL is not comparable under dominance).  Output schema == input
    schema; row order is not defined (a skyline is a SET).
    """
    if not cols:
        raise ValueError("pareto_frontier needs at least one criterion")
    if maximize is None:
        maximize = [True] * len(cols)
    if len(maximize) != len(cols):
        raise ValueError(f"maximize must match cols: {maximize} vs {cols}")
    sign = np.array([1.0 if m else -1.0 for m in maximize])
    schema = df.schema

    def local(batches):
        kept: pd.DataFrame | None = None
        for pdf in batches:
            pdf = pdf.dropna(subset=cols)
            if not len(pdf):
                continue
            cand = (
                pdf
                if kept is None
                else pd.concat([kept, pdf], ignore_index=True)
            )
            pts = np.column_stack([_as_float(cand[c]) for c in cols]) * sign
            kept = cand.iloc[_skyline_indices(pts)].reset_index(drop=True)
        if kept is not None and len(kept):
            yield kept

    local_sky = df.dropna(subset=cols).mapInPandas(local, schema)
    # phase 2: merge the per-partition survivors on one task — input is
    # (#partitions x local skyline), not n; an explicit single-partition
    # exchange, not a global sort
    return local_sky.repartition(1).mapInPandas(local, schema)
