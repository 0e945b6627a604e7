"""Round-12 second-batch operators against pure-python references:
label propagation (operators/graph.label_propagation), Adamic-Adar link
prediction (operators/graph.adamic_adar), A-ES weighted sampling
(pipeline/curation.weighted_sample), and SCD2 state history
(streaming/events.state_history)."""

import math
from collections import Counter, defaultdict
from datetime import datetime
from itertools import combinations

import pytest


def _ref_lpa(edges, iters):
    """Synchronous LPA, min-label tie-break, distinct-neighbor votes."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, ns in adj.items():
            cnt = Counter(labels[u] for u in ns)
            mc = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == mc)
        labels = new
    return labels


def _ref_adamic_adar(edges, max_degree=None):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    scores = defaultdict(float)
    for z, ns in adj.items():
        if max_degree is not None and deg[z] > max_degree:
            continue
        for x, y in combinations(sorted(ns), 2):
            if y not in adj[x]:
                scores[(x, y)] += 1.0 / math.log(deg[z])
    return dict(scores)


def test_label_propagation_two_communities(spark):
    """Two triangles joined by one bridge resolve into two communities
    (a single component — exactly what connected_components CANNOT
    separate), matching the synchronous reference round for round."""
    from tsne_flink_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    for iters in (1, 2, 4):
        got = {
            r["id"]: r["community"]
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _ref_lpa(edges, iters), f"iters={iters}"
    got4 = {
        r["id"]: r["community"]
        for r in label_propagation(df, iters=4).collect()
    }
    assert len(set(got4.values())) == 2
    assert len(set(got4[v] for v in (1, 2, 3))) == 1
    assert len(set(got4[v] for v in (4, 5, 6))) == 1
    # ...while the component operator sees one blob
    comp = connected_components(df).collect()
    assert len({r["component"] for r in comp}) == 1


def test_label_propagation_determinism_and_edges(spark):
    """Partitioning-independent; self-loops and duplicate/reversed edges
    are harmless; empty input yields empty output."""
    from tsne_flink_spark.operators.graph import label_propagation

    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 4), (4, 1), (9, 10)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    a = sorted(map(tuple, label_propagation(df, iters=3).collect()))
    b = sorted(map(tuple, label_propagation(df.repartition(7), iters=3).collect()))
    assert a == b
    assert a == sorted(_ref_lpa(edges, 3).items())
    empty = spark.createDataFrame([], "a bigint, b bigint")
    assert label_propagation(empty, iters=2).collect() == []


def test_adamic_adar_matches_reference(spark):
    """Scores, adjacency exclusion, and (score desc, x, y) top-k order
    against the brute-force reference on a hub-ish random graph."""
    import numpy as np

    from tsne_flink_spark.operators.graph import adamic_adar

    rng = np.random.default_rng(7)
    edges = [(1, k) for k in range(2, 12)]  # hub center
    edges += [
        tuple(sorted(rng.choice(25, size=2, replace=False) + 1))
        for _ in range(60)
    ]
    edges += [(2, 2), (3, 4), (4, 3)]  # self edge + duplicate reversed
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a bigint, b bigint"
    )
    ref = _ref_adamic_adar(edges)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [((r["x"], r["y"]), r["score"]) for r in adamic_adar(df, k=10).collect()]
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)
    # no predicted pair may already be an edge
    adj = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    assert not adj & {p for p, _ in got}


def test_adamic_adar_max_degree_drops_hub_centers(spark):
    from tsne_flink_spark.operators.graph import adamic_adar

    edges = [(1, k) for k in range(2, 12)] + [(2, 3), (3, 5), (5, 7)]
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    ref = _ref_adamic_adar(edges, max_degree=5)
    got = {
        (r["x"], r["y"]): r["score"]
        for r in adamic_adar(df, k=1000, max_degree=5).collect()
    }
    assert set(got) == set(ref)
    for p in ref:
        assert got[p] == pytest.approx(ref[p], abs=1e-9)


def test_adamic_adar_sqrt_cap_sentinel(spark):
    """max_degree="sqrt" derives ceil(sqrt(m)) from the normalized edge
    count — equivalent to passing the explicit integer cap."""
    import math

    from tsne_flink_spark.operators.graph import adamic_adar

    edges = [(1, k) for k in range(2, 12)] + [(2, 3), (3, 5), (5, 7), (7, 9)]
    m = len({tuple(sorted(e)) for e in edges if e[0] != e[1]})
    cap = math.ceil(math.sqrt(m))
    df = spark.createDataFrame(edges, "a bigint, b bigint")
    ref = _ref_adamic_adar(edges, max_degree=cap)
    got = {
        (r["x"], r["y"]): r["score"]
        for r in adamic_adar(df, k=1000, max_degree="sqrt").collect()
    }
    assert set(got) == set(ref)
    for p in ref:
        assert got[p] == pytest.approx(ref[p], abs=1e-9)
    # the sqrt cap (here 4) must actually drop the degree-10 hub center:
    # uncapped scores differ on at least one pair
    unc = _ref_adamic_adar(edges)
    assert got != {p: unc.get(p) for p in got}


_A, _C, _M = 1103515245, 12345, 1 << 31


def _ref_ws_key(key_id, w):
    h = key_id % _M
    h = (h * _A + _C) % _M
    h = (h * _A + _C) % _M
    u = ((h % (1 << 30)) + 0.5) / float(1 << 30)
    return math.log(u) / w


def test_weighted_sample_matches_reference(spark):
    """Exact selection + order parity with the python A-ES reference;
    k >= n returns everything."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.curation import weighted_sample

    rows = [(i, float(1 + (i * 13) % 47)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    want = sorted(
        rows, key=lambda r: (-_ref_ws_key(r[0], r[1]), r[0])
    )[:25]
    got = weighted_sample(df, 25, F.col("w")).collect()
    assert [r["doc_id"] for r in got] == [i for i, _ in want]
    for r in got:
        assert r["sample_key"] == pytest.approx(
            _ref_ws_key(r["doc_id"], dict(rows)[r["doc_id"]]), rel=1e-12
        )
    assert weighted_sample(df, 10_000, F.col("w")).count() == len(rows)
    with pytest.raises(ValueError):
        weighted_sample(df, 0, F.col("w"))


def test_weighted_sample_weight_bias(spark):
    """A 100x-heavier stratum must win most sample slots — the property
    the operator exists for (quality-weighted downsampling)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.curation import weighted_sample

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = weighted_sample(df, 100, F.col("w")).collect()
    heavy = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert heavy >= 90


def _ref_skyline(rows, sign):
    """Brute-force NOT EXISTS strict dominance."""
    pts = [tuple(s * v for s, v in zip(sign, r)) for r in rows]
    out = []
    for i, p in enumerate(pts):
        dominated = any(
            all(qv >= pv for qv, pv in zip(q, p))
            and any(qv > pv for qv, pv in zip(q, p))
            for j, q in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append(i)
    return out


def test_pareto_frontier_matches_bruteforce(spark):
    """Random 2D and 3D point sets incl. exact duplicates, against the
    NOT EXISTS reference; multi-partition result identical to
    single-partition."""
    import numpy as np

    from tsne_flink_spark.operators.skyline import pareto_frontier

    rng = np.random.default_rng(5)
    for d in (2, 3):
        pts = rng.integers(0, 12, size=(300, d)).astype(float).tolist()
        pts += pts[:10]  # exact duplicates: all copies must be kept
        rows = [(i, *p) for i, p in enumerate(pts)]
        cols = [f"c{j}" for j in range(d)]
        schema = "id bigint, " + ", ".join(f"{c} double" for c in cols)
        df = spark.createDataFrame(rows, schema)
        want = sorted(rows[i][0] for i in _ref_skyline(pts, [1] * d))
        got = sorted(
            r["id"] for r in pareto_frontier(df, cols).collect()
        )
        assert got == want, f"d={d}"
        got_multi = sorted(
            r["id"]
            for r in pareto_frontier(df.repartition(13), cols).collect()
        )
        assert got_multi == want, f"d={d} multi-partition"


def test_pareto_frontier_minimize_nulls_errors(spark):
    from tsne_flink_spark.operators.skyline import pareto_frontier

    rows = [(1, 1.0, 5.0), (2, 2.0, 7.0), (3, None, 0.0), (4, 3.0, 7.0)]
    df = spark.createDataFrame(rows, "id bigint, a double, b double")
    # maximize a, MINIMIZE b: (1,5) survives vs (2,7)? 2>1 but 7>5 ->
    # incomparable; (4,7) dominates (2,7); null-a row dropped
    got = sorted(
        r["id"] for r in pareto_frontier(df, ["a", "b"], [True, False]).collect()
    )
    assert got == [1, 4]
    with pytest.raises(ValueError):
        pareto_frontier(df, [])
    with pytest.raises(ValueError):
        pareto_frontier(df, ["a"], [True, False])


def test_pareto_frontier_dates(spark):
    """Date criteria map to order-preserving epoch floats."""
    from datetime import date

    from tsne_flink_spark.operators.skyline import pareto_frontier

    rows = [
        (1, 10.0, date(2024, 1, 1)),
        (2, 5.0, date(2024, 6, 1)),
        (3, 10.0, date(2024, 6, 1)),  # dominates 1 and 2
        (4, 1.0, date(2023, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id bigint, v double, d date")
    got = sorted(r["id"] for r in pareto_frontier(df, ["v", "d"]).collect())
    assert got == [3]


def test_pareto_frontier_grouped(spark):
    """by= computes one skyline per group, matching per-group brute
    force — including a group whose frontier is everything."""
    import numpy as np

    from tsne_flink_spark.operators.skyline import pareto_frontier

    rng = np.random.default_rng(9)
    rows = []
    for g in ("r1", "r2", "r3"):
        for i, (x, y) in enumerate(rng.integers(0, 20, size=(120, 2))):
            rows.append((g, len(rows), float(x), float(y)))
    rows.append(("lone", 10_000, 1.0, 1.0))
    df = spark.createDataFrame(rows, "g string, id bigint, a double, b double")
    got = {}
    for r in pareto_frontier(df, ["a", "b"], by=["g"]).collect():
        got.setdefault(r["g"], []).append(r["id"])
    for g in ("r1", "r2", "r3", "lone"):
        grp = [r for r in rows if r[0] == g]
        want = sorted(grp[i][1] for i in _ref_skyline([r[2:] for r in grp], [1, 1]))
        assert sorted(got[g]) == want, g


def test_pareto_frontier_shard_lifecycle(spark, tmp_path):
    """merge=False local skylines are a persistable, MERGEABLE superset:
    write per-batch shards to parquet, read them back, merge — identical
    to the one-shot frontier over the union (the HLL shard/union
    lifecycle, for skylines)."""
    import numpy as np

    from tsne_flink_spark.operators.skyline import pareto_frontier

    rng = np.random.default_rng(3)
    batches = [
        [(int(1000 * b + i), float(x), float(y)) for i, (x, y) in
         enumerate(rng.integers(0, 50, size=(400, 2)))]
        for b in range(3)
    ]
    store = str(tmp_path / "sky_shards")
    for rows in batches:
        df = spark.createDataFrame(rows, "id bigint, a double, b double")
        pareto_frontier(df, ["a", "b"], merge=False).write.mode(
            "append"
        ).parquet(store)

    merged = pareto_frontier(spark.read.parquet(store), ["a", "b"])
    all_rows = [r for rows in batches for r in rows]
    one_shot = pareto_frontier(
        spark.createDataFrame(all_rows, "id bigint, a double, b double"),
        ["a", "b"],
    )
    assert sorted(r["id"] for r in merged.collect()) == sorted(
        r["id"] for r in one_shot.collect()
    )
    # shards are a real reduction, not a passthrough
    n_shard = spark.read.parquet(store).count()
    assert n_shard < len(all_rows)


def test_collocation_pmi_reference(spark):
    """Hand corpus: PMI values and (pmi desc, w1, w2) order against an
    exact python computation; min_count filters rare pairs."""
    docs = [
        (1, "new york new york new york is big"),
        (2, "new york has new york style"),
        (3, "the cat and the dog and the cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    toks = [d[1].split(" ") for d in docs]
    uni = Counter(w for t in toks for w in t)
    bi = Counter((a, b) for t in toks for a, b in zip(t, t[1:]))
    T = sum(uni.values())
    B = sum(bi.values())
    want = {
        p: math.log(((c * T) * T) / ((B * uni[p[0]]) * uni[p[1]]))
        for p, c in bi.items()
        if c >= 2
    }
    from tsne_flink_spark.pipeline.scrub import collocation_pmi

    got = collocation_pmi(df, min_count=2, k=100).collect()
    assert {(r["w1"], r["w2"]) for r in got} == set(want)
    for r in got:
        assert r["pmi"] == pytest.approx(want[(r["w1"], r["w2"])], abs=1e-6)
        assert r["n"] == bi[(r["w1"], r["w2"])]
    order = [(r["w1"], r["w2"]) for r in got]
    assert order == [
        p for p, _ in sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    ]


def test_state_history_islands(spark):
    """A,A,B,A for one user -> three intervals with half-open bounds
    chaining valid_to == next valid_from, NULL-terminated; same-ts
    events order by event_id."""
    from tsne_flink_spark.streaming.events import state_history

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(0), 7, "A", 1.0),
        (2, t(10), 7, "A", 1.0),
        (3, t(20), 7, "B", 1.0),
        (4, t(30), 7, "A", 1.0),
        # user 8: two events at the SAME ts; event_id orders them B,A
        (5, t(5), 8, "B", 1.0),
        (6, t(5), 8, "A", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )
    out = sorted(
        state_history(df).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u7 = [r for r in out if r["user_id"] == 7]
    assert [(r["event_type"], r["n_events"]) for r in u7] == [
        ("A", 2), ("B", 1), ("A", 1)
    ]
    assert u7[0]["valid_from"] == t(0)
    assert u7[0]["valid_to"] == t(20) == u7[1]["valid_from"]
    assert u7[1]["valid_to"] == t(30) == u7[2]["valid_from"]
    assert u7[2]["valid_to"] is None
    u8 = [r for r in out if r["user_id"] == 8]
    assert [(r["event_type"], r["n_events"]) for r in u8] == [
        ("B", 1), ("A", 1)
    ]
    # events partition exactly into intervals
    assert sum(r["n_events"] for r in out) == len(rows)


def test_state_history_invariants_on_real_events(spark):
    """On the sf0.001 events table: intervals per user chain without
    gaps or overlaps, exactly one NULL valid_to per user, and n_events
    sums to the event count."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.streaming.events import state_history

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = state_history(ev).collect()
    assert sum(r["n_events"] for r in out) == ev.count()
    by_user = defaultdict(list)
    for r in out:
        by_user[r["user_id"]].append(r)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["valid_from"])
        assert sum(r["valid_to"] is None for r in rows) == 1
        assert rows[-1]["valid_to"] is None
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
            # consecutive intervals never share a state (else one island)
            assert prev["event_type"] != nxt["event_type"]


# ---------------------------------------------------------------------------
# k-core decomposition (operators/graph.k_core)
# ---------------------------------------------------------------------------


def _kcore_reference(edges, k):
    """Brute synchronous peel."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    while True:
        bad = [v for v, ns in adj.items() if len(ns) < k]
        if not bad:
            return {v: len(ns) for v, ns in adj.items()}
        for v in bad:
            for n in adj[v]:
                adj[n].discard(v)
            del adj[v]


def test_k_core_triangle_with_tail(spark):
    """2-core of a triangle with a pendant chain = the triangle alone;
    the chain peels (multi-round: the chain's outer node first, then the
    newly exposed one)."""
    from tsne_flink_spark.operators.graph import k_core

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)], "a long, b long"
    )
    got = sorted((r.id, r.deg) for r in k_core(e, 2).collect())
    assert got == [(1, 2), (2, 2), (3, 2)]


def test_k_core_empty_when_fully_peeled(spark):
    """A pure chain has no 2-core: peeling consumes everything and the
    operator returns an empty frame with the (id, deg) schema."""
    from tsne_flink_spark.operators.graph import k_core

    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    out = k_core(e, 2)
    assert out.columns == ["id", "deg"] and out.count() == 0


@pytest.mark.parametrize("k", [2, 3])
def test_k_core_matches_reference_random(spark, k):
    """Random sparse graph vs the brute peel reference, both k values;
    duplicate and reversed edges are normalized away."""
    from tsne_flink_spark.operators.graph import k_core

    rnd = [( (i * 7919) % 60, (i * 104729) % 60) for i in range(150)]
    edges = [(a, b) for a, b in rnd if a != b]
    df = spark.createDataFrame(
        edges + [(b, a) for a, b in edges[:30]], "a long, b long"
    ).repartition(7)
    want = _kcore_reference(edges, k)
    got = {r.id: r.deg for r in k_core(df, k).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# deterministic random walks (operators/graph.random_walks)
# ---------------------------------------------------------------------------


def test_random_walks_are_valid_paths(spark):
    """Every walk starts at its walk_id, has walk_len+1 steps, and every
    consecutive (node, next) pair is an edge of the symmetrized graph."""
    from tsne_flink_spark.operators.graph import random_walks

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    rows = random_walks(df, walk_len=5, seed=3).collect()
    eset = {(a, b) for a, b in edges} | {(b, a) for a, b in edges}
    by_walk = defaultdict(dict)
    for r in rows:
        by_walk[r.walk_id][r.step] = r.node
    assert set(by_walk) == {1, 2, 3, 4}
    for wid, steps in by_walk.items():
        assert sorted(steps) == list(range(6))
        assert steps[0] == wid
        for t in range(5):
            assert (steps[t], steps[t + 1]) in eset


@pytest.mark.parametrize("parts", [1, 9])
def test_random_walks_deterministic(spark, parts):
    """Same seed => identical walk corpus on any partitioning; a
    different seed changes at least one step (the choice hash mixes the
    seed in)."""
    from tsne_flink_spark.operators.graph import random_walks

    edges = [((i * 13) % 30, (i * 7 + 1) % 30) for i in range(60)]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "a long, b long"
    ).repartition(parts)
    key = lambda rows: sorted((r.walk_id, r.step, r.node) for r in rows)
    w1 = key(random_walks(df, walk_len=4, seed=1).collect())
    w1b = key(random_walks(df.repartition(17), walk_len=4, seed=1).collect())
    w2 = key(random_walks(df, walk_len=4, seed=2).collect())
    assert w1 == w1b
    assert w1 != w2
