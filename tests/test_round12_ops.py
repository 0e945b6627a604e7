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
