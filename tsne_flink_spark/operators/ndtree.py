"""Barnes-Hut tree for arbitrary dimensionality (octree at d=3), the
d-dimensional generalization of the 2-D flat-array quadtree
(operators/quadtree.py).

The reference implements only a 2-D quadtree (QuadTree.scala — its CLI still
accepts --nComponents, which its BH path then cannot serve); this module
closes that surface for d != 2 with the SAME semantics the 2-D tree
replicates:

- node capacity 1; coincident (bit-equal) points accumulate in one leaf,
  re-seated with full accumulated weight on split (order-independent — the
  documented divergence from QuadTree.scala:59 that makes distributed builds
  merge-equivalent);
- cubic cells: every child is sized by half the parent's half-extent on ALL
  axes (QuadTree.scala:80-81 generalized), so per-node extents are
  (root half) * 2^-depth exactly;
- root centered at the origin (reference quirk Q1 — the "mean" is zero by
  construction) or at the true mean, half-extent = max per-axis span
  (TsneHelpers.scala:246-248);
- summary condition ``extent / D < theta`` with D the SQUARED distance
  ("reference", QuadTree.scala:133-134 quirk Q2) or ``extent / sqrt(D) <
  theta`` ("scaled", canonical Barnes-Hut);
- a leaf bit-equal to the query contributes nothing (QuadTree.scala:128).

Layout matches the quadtree's compact form (coordinates as (n, d) arrays,
uint8 depth instead of extents, int32 children) so the per-iteration
broadcast stays small; the batched frontier evaluation and the
level-synchronous vectorized merge are direct generalizations of the 2-D
code paths, with 2^d children per node.
"""

from __future__ import annotations

import numpy as np

_MAX_DEPTH = 64  # guard against pathological near-coincident points


class NDTree:
    """Flat-array 2^d-ary Barnes-Hut tree over d-dimensional points."""

    def __init__(self, center, half_extent: float, capacity_hint: int = 64):
        center = np.asarray(center, dtype=np.float64)
        d = len(center)
        self.d = d
        self.nc = 1 << d  # children per node
        # child c offset sign on axis k: +1 if bit k of c is set else -1
        self._offs = np.array(
            [[1.0 if (c >> k) & 1 else -1.0 for k in range(d)]
             for c in range(self.nc)]
        )
        n = max(capacity_hint, 16)
        self.c = np.zeros((n, d))
        self.c[0] = center
        self.half = float(half_extent)
        self.depth = np.zeros(n, dtype=np.uint8)
        self.cum = np.zeros(n, dtype=np.int64)
        self.s = np.zeros((n, d))  # running sum of inserted points
        self.children = np.full((n, self.nc), -1, dtype=np.int32)
        self.has_point = np.zeros(n, dtype=bool)
        self.p = np.zeros((n, d))
        self.n_nodes = 1

    def _half_of(self, node: int) -> float:
        return self.half / (1 << int(self.depth[node]))

    # -- construction -------------------------------------------------------

    def _grow(self, need: int) -> None:
        cap = len(self.c)
        if self.n_nodes + need <= cap:
            return
        new = max(cap * 2, self.n_nodes + need)

        def grow2d(arr, fill=0.0):
            out = np.full((new,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[: len(arr)] = arr
            return out

        self.c = grow2d(self.c)
        self.s = grow2d(self.s)
        self.p = grow2d(self.p)
        self.depth = np.resize(self.depth, new)
        self.cum = np.resize(self.cum, new)
        self.has_point = grow2d(self.has_point, fill=False)
        self.children = grow2d(self.children, fill=-1)

    def _contains(self, node: int, x: np.ndarray) -> bool:
        h = self._half_of(node)
        return bool(np.all(np.abs(x - self.c[node]) <= h))

    def _subdivide(self, node: int) -> None:
        nw = 0.5 * self._half_of(node)
        base = self.n_nodes
        self._grow(self.nc)
        idx = base + np.arange(self.nc)
        self.c[idx] = self.c[node] + nw * self._offs
        self.depth[idx] = self.depth[node] + 1
        self.cum[idx] = 0
        self.s[idx] = 0.0
        self.children[idx] = -1
        self.has_point[idx] = False
        self.children[node] = idx.astype(np.int32)
        self.n_nodes += self.nc

    def _child_for(self, node: int, x: np.ndarray) -> int:
        for ch in self.children[node]:
            if ch >= 0 and self._contains(int(ch), x):
                return int(ch)
        return -1

    def insert(self, x) -> bool:
        x = np.asarray(x, dtype=np.float64)
        if not self._contains(0, x):
            return False
        node = 0
        for _ in range(_MAX_DEPTH):
            self.s[node] += x
            self.cum[node] += 1
            if self.children[node, 0] == -1:  # leaf
                if not self.has_point[node]:
                    self.has_point[node] = True
                    self.p[node] = x
                    return True
                if np.array_equal(self.p[node], x):
                    return True  # coincident: accumulate in this leaf
                if self.depth[node] >= _MAX_DEPTH - 1:
                    # terminal depth: treat the distinct point as coincident
                    # (accumulate only, keep the seated point, NO subdivide —
                    # a last-level split would strand mass in children that
                    # repulsive_forces expands into and drops as empty)
                    return True
                # re-seat the old point one level down with its FULL
                # accumulated weight (same rule as QuadTree.insert)
                ox = self.p[node].copy()
                ow = int(self.cum[node]) - 1
                osum = self.s[node] - x
                self._subdivide(node)
                self.has_point[node] = False
                oc = self._child_for(node, ox)
                if oc >= 0:
                    self.s[oc] += osum
                    self.cum[oc] += ow
                    self.has_point[oc] = True
                    self.p[oc] = ox
            nxt = self._child_for(node, x)
            if nxt == -1:
                return False
            node = nxt
        return True  # depth guard: treat as coincident with leaf reached

    def __getstate__(self):
        self.trim()
        return self.__dict__

    def trim(self) -> "NDTree":
        n = self.n_nodes
        for name in ("c", "s", "p", "depth", "cum", "has_point", "children"):
            setattr(self, name, getattr(self, name)[:n].copy())
        return self

    # -- query --------------------------------------------------------------

    def repulsive_forces(
        self, Q: np.ndarray, theta: float, condition: str = "reference"
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched Barnes-Hut evaluation for query points Q (m, d); returns
        (forces (m, d), sum_q (m,)).  Same frontier expansion as
        QuadTree.repulsive_forces with 2^d-way splits."""
        m = len(Q)
        forces = np.zeros((m, self.d))
        sumq = np.zeros(m)
        if m == 0 or self.cum[0] == 0:
            return forces, sumq

        nodes = np.zeros(m, dtype=np.int64)
        queries = np.arange(m, dtype=np.int64)

        while len(nodes):
            leaf = self.children[nodes, 0] == -1
            empty = leaf & (self.cum[nodes] == 0)
            q_pts = Q[queries]  # (k, d)
            self_leaf = leaf & self.has_point[nodes] & np.all(
                self.p[nodes] == q_pts, axis=1
            )
            drop = empty | self_leaf

            com = self.s[nodes] / np.maximum(self.cum[nodes], 1)[:, None]
            delta = q_pts - com  # (k, d)
            D = (delta * delta).sum(axis=1)
            denom = np.sqrt(D) if condition == "scaled" else D
            extent = self.half * np.exp2(-self.depth[nodes].astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                summary = extent / denom < theta
            accept = ~drop & (leaf | summary)

            if accept.any():
                a = np.flatnonzero(accept)
                q = 1.0 / (1.0 + D[a])
                mult = self.cum[nodes[a]] * q
                qa = queries[a]
                sumq += np.bincount(qa, weights=mult, minlength=m)
                mq = mult * q
                for k in range(self.d):
                    forces[:, k] += np.bincount(
                        qa, weights=mq * delta[a, k], minlength=m
                    )

            expand = ~drop & ~accept
            if expand.any():
                e = np.flatnonzero(expand)
                nodes = self.children[nodes[e]].astype(np.int64).ravel()
                queries = np.repeat(queries[e], self.nc)
            else:
                break
        return forces, sumq


def _bulk_build(tree: NDTree, Y: np.ndarray) -> NDTree:
    """Vectorized level-synchronous construction into a FRESH (root-only)
    tree — equivalent to inserting every row of ``Y`` sequentially (same
    structure: a node subdivides iff >= 2 distinct points fall in it; same
    cum/s totals; coincident rows accumulate in one leaf), but each descent
    level is one batch of numpy ops instead of a per-point Python loop.

    Equivalence argument: insertion order only ever mattered through the
    re-seat-with-full-weight rule, which this module already makes
    order-independent (see class docstring); the per-node mass totals are
    order-free sums, and the child of a point is a pure function of the
    point and the cell (tie on a split plane -> negative side, matching
    ``_child_for``'s first-containing-child scan).  Gated by
    tests/test_ndtree.py::test_bulk_build_equals_sequential_insert.
    """
    d = tree.d
    if not len(Y):
        return tree
    inside = np.all(np.abs(Y - tree.c[0]) <= tree.half, axis=1)
    X = Y[inside]
    if not len(X):
        return tree
    # coincident rows collapse to one weighted point (insert's accumulate
    # rule); they would never separate however deep the descent goes
    pts, counts = np.unique(X, axis=0, return_counts=True)
    w = counts.astype(np.int64)
    ws = pts * counts[:, None]
    cur = np.zeros(len(pts), dtype=np.int64)
    for lvl in range(_MAX_DEPTH):
        np.add.at(tree.cum, cur, w)
        np.add.at(tree.s, cur, ws)
        uniq, inv, cnt = np.unique(cur, return_inverse=True, return_counts=True)
        alone = cnt[inv] == 1
        if alone.any():
            sn = cur[alone]
            tree.has_point[sn] = True
            tree.p[sn] = pts[alone]
        keep = ~alone
        cur, pts, w, ws = cur[keep], pts[keep], w[keep], ws[keep]
        if not len(cur):
            break
        if lvl == _MAX_DEPTH - 1:
            # terminal depth: accumulate-only leaves (matching insert's
            # terminal rule — no massless last-level subdivide).  Seat the
            # lexicographically-first point of each survivor group, the
            # order-independent counterpart of insert seating whichever
            # point arrived first.
            order = np.lexsort(tuple(pts.T[::-1]) + (cur,))
            sc, sp = cur[order], pts[order]
            first = np.r_[True, sc[1:] != sc[:-1]]
            tree.has_point[sc[first]] = True
            tree.p[sc[first]] = sp[first]
            break
        # all remaining nodes hold >= 2 distinct points: split and descend.
        # They are fresh same-depth leaves (level-synchronous invariant).
        # _children_for replicates insert's first-containing-child scan
        # exactly, including the 1-ulp no-containing-child drop edge.
        _bulk_subdivide(tree, np.unique(cur))
        nxt = _children_for(tree, cur, pts)
        v = nxt >= 0
        cur, pts, w, ws = nxt[v], pts[v], w[v], ws[v]
    return tree


def build_ndtree(Y: np.ndarray, fix_bounds_mean: bool = False) -> NDTree:
    """Build the tree for an N x d embedding (root-cell construction as
    TsneHelpers.scala:228-248, generalized to d axes); vectorized bulk
    construction, insert-equivalent (see :func:`_bulk_build`)."""
    Y = np.asarray(Y, dtype=np.float64)
    if Y.ndim != 2:
        raise ValueError(f"expected (n, d) array, got shape {Y.shape}")
    d = Y.shape[1]
    if fix_bounds_mean and len(Y):
        center = Y.mean(axis=0)
    else:
        center = np.zeros(d)
    half = float((Y.max(axis=0) - Y.min(axis=0)).max()) if len(Y) else 1.0
    tree = NDTree(center, half, capacity_hint=(1 << d) * max(len(Y), 16))
    return _bulk_build(tree, Y)


# -- vectorized merge machinery (generalizes quadtree.py's 2-D versions) ----

def _bulk_subdivide(tree: NDTree, nodes: np.ndarray) -> None:
    k = len(nodes)
    if k == 0:
        return
    base = tree.n_nodes
    tree._grow(tree.nc * k)
    nw = tree.half * np.exp2(-(tree.depth[nodes].astype(np.float64) + 1.0))
    child_idx = (
        base
        + tree.nc * np.arange(k, dtype=np.int64)[:, None]
        + np.arange(tree.nc)[None, :]
    )
    flat = child_idx.ravel()
    # (k, nc, d) = parent center + nw * offset sign
    tree.c[flat] = (
        tree.c[nodes][:, None, :] + nw[:, None, None] * tree._offs[None, :, :]
    ).reshape(-1, tree.d)
    tree.depth[flat] = np.repeat(tree.depth[nodes] + 1, tree.nc)
    tree.cum[flat] = 0
    tree.s[flat] = 0.0
    tree.has_point[flat] = False
    tree.children[flat] = -1
    tree.children[nodes] = child_idx.astype(np.int32)
    tree.n_nodes += tree.nc * k


def _children_for(tree: NDTree, nodes: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Vectorized first-containing-child lookup; ``nodes`` all internal."""
    ch = tree.children[nodes].astype(np.int64)  # (k, nc)
    h = tree.half * np.exp2(-tree.depth[ch[:, 0]].astype(np.float64))  # (k,)
    centers = tree.c[ch]  # (k, nc, d)
    cont = np.all(
        np.abs(X[:, None, :] - centers) <= h[:, None, None], axis=2
    )  # (k, nc)
    first = np.argmax(cont, axis=1)
    rows = np.arange(len(nodes))
    return np.where(cont[rows, first], ch[rows, first], -1)


def _bulk_insert_weighted(
    tree: NDTree,
    starts: np.ndarray,
    X: np.ndarray,
    ws: np.ndarray,
    wsums: np.ndarray,
) -> None:
    """Batched weighted descents; callers guarantee disjoint subtrees."""
    cur = starts.astype(np.int64).copy()
    for _ in range(_MAX_DEPTH):
        if not len(cur):
            return
        tree.cum[cur] += ws
        tree.s[cur] += wsums
        leaf = tree.children[cur, 0] == -1
        done = np.zeros(len(cur), dtype=bool)
        if leaf.any():
            l = np.flatnonzero(leaf)
            ln = cur[l]
            no_pt = ~tree.has_point[ln]
            seat = l[no_pt]
            sn = cur[seat]
            tree.has_point[sn] = True
            tree.p[sn] = X[seat]
            done[seat] = True
            occ = l[~no_pt]
            on = cur[occ]
            coinc = np.all(tree.p[on] == X[occ], axis=1)
            done[occ[coinc]] = True
            split = occ[~coinc]
            if len(split):
                # terminal depth: accumulate only, never subdivide (same
                # rule as insert/_bulk_build)
                term = tree.depth[cur[split]] >= _MAX_DEPTH - 1
                done[split[term]] = True
                split = split[~term]
            if len(split):
                snodes = cur[split]
                ow = tree.cum[snodes] - ws[split]
                osum = tree.s[snodes] - wsums[split]
                op = tree.p[snodes].copy()
                _bulk_subdivide(tree, snodes)
                tree.has_point[snodes] = False
                oc = _children_for(tree, snodes, op)
                v = oc >= 0
                ocv = oc[v]
                tree.cum[ocv] += ow[v]
                tree.s[ocv] += osum[v]
                tree.has_point[ocv] = True
                tree.p[ocv] = op[v]
        keep = ~done
        cur, X, ws, wsums = cur[keep], X[keep], ws[keep], wsums[keep]
        if not len(cur):
            return
        nxt = _children_for(tree, cur, X)
        v = nxt >= 0
        cur, X, ws, wsums = nxt[v], X[v], ws[v], wsums[v]


def merge_ndtrees(a: NDTree, b: NDTree) -> NDTree:
    """Structurally merge ``b`` into ``a`` — the d-dimensional counterpart
    of quadtree.merge_quadtrees (level-synchronous vectorized frontier)."""
    if b.cum[0] == 0:
        return a
    if a.cum[0] == 0:
        return b
    if a.n_nodes < b.n_nodes:
        a, b = b, a
    na = np.zeros(1, dtype=np.int64)
    nb = np.zeros(1, dtype=np.int64)
    ins: list[tuple[np.ndarray, ...]] = []
    while len(na):
        live = b.cum[nb] > 0
        na, nb = na[live], nb[live]
        if not len(na):
            break
        bleaf = b.children[nb, 0] == -1
        c3 = bleaf & b.has_point[nb]
        if c3.any():
            i = np.flatnonzero(c3)
            ins.append(
                (na[i], b.p[nb[i]].copy(), b.cum[nb[i]].copy(), b.s[nb[i]].copy())
            )
        rest = ~bleaf
        na, nb = na[rest], nb[rest]
        if not len(na):
            break
        aleaf = a.children[na, 0] == -1
        if aleaf.any():
            ln = na[aleaf]
            cum0 = a.cum[ln].copy()
            s0 = a.s[ln].copy()
            haspt = a.has_point[ln].copy()
            op = a.p[ln].copy()
            _bulk_subdivide(a, ln)
            hn = ln[haspt]
            if len(hn):
                a.has_point[hn] = False
                oc = _children_for(a, hn, op[haspt])
                v = oc >= 0
                ocv = oc[v]
                a.cum[ocv] += cum0[haspt][v]
                a.s[ocv] += s0[haspt][v]
                a.has_point[ocv] = True
                a.p[ocv] = op[haspt][v]
        a.cum[na] += b.cum[nb]
        a.s[na] += b.s[nb]
        na = a.children[na].astype(np.int64).ravel()
        nb = b.children[nb].astype(np.int64).ravel()
    if ins:
        _bulk_insert_weighted(
            a,
            np.concatenate([t[0] for t in ins]),
            np.concatenate([t[1] for t in ins]),
            np.concatenate([t[2] for t in ins]),
            np.concatenate([t[3] for t in ins]),
        )
    return a


def build_ndtree_distributed(embedding, n_components: int,
                             fix_bounds_mean: bool = False,
                             bounds=None) -> NDTree:
    """Cluster-side build: per-partition subtrees + treeReduce merge (the
    pattern of quadtree.build_quadtree_distributed, d-dimensional).

    ``bounds``: optional precomputed row with per-axis mins/maxs/means as
    produced by the aggregate below (keys min_k / max_k / mean_k).
    """
    import pyspark.sql.functions as F

    d = n_components
    if bounds is None:
        aggs = []
        for k in range(d):
            aggs += [
                F.min(F.col("y")[k]).alias(f"min_{k}"),
                F.max(F.col("y")[k]).alias(f"max_{k}"),
                F.avg(F.col("y")[k]).alias(f"mean_{k}"),
            ]
        bounds = embedding.agg(*aggs).first()
    if bounds is None or bounds["min_0"] is None:
        return NDTree(np.zeros(d), 1.0)
    center = (
        np.array([float(bounds[f"mean_{k}"]) for k in range(d)])
        if fix_bounds_mean
        else np.zeros(d)
    )
    half = max(
        float(bounds[f"max_{k}"] - bounds[f"min_{k}"]) for k in range(d)
    )

    def build_part(rows):
        pts = [r["y"] for r in rows]
        if not pts:
            return
        t = NDTree(center, half, capacity_hint=(1 << d) * max(len(pts), 16))
        _bulk_build(t, np.asarray(pts, dtype=np.float64).reshape(-1, d))
        yield t.trim()

    trees = embedding.select("y").rdd.mapPartitions(build_part)
    return trees.treeReduce(merge_ndtrees, depth=2)
