"""Unit tests for pipeline/profile.profile_table on a crafted frame."""

from tsne_flink_spark.pipeline.profile import profile_table


def test_profile_table_mixed_types(spark):
    df = spark.createDataFrame(
        [
            (1, 2.0, "x"),
            (2, None, "y"),
            (3, 4.0, None),
            (3, 6.0, "y"),
        ],
        "k long, v double, s string",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "v", "s"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"], k["mean_num"]) == (1.0, 3.0, 2.25)
    assert k["min_str"] is None and k["max_str"] is None
    v = out["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 3)
    assert (v["min_num"], v["max_num"], v["mean_num"]) == (2.0, 6.0, 4.0)
    s = out["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("x", "y")
    assert s["min_num"] is None and s["mean_num"] is None


def test_profile_table_column_subset(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    rows = profile_table(df, columns=["s"]).collect()
    assert [r["column"] for r in rows] == ["s"]


def test_referential_orphans_counts(spark):
    """Handcrafted parent/child: orphans, null FKs, and clean rows are
    counted into their separate buckets."""
    from tsne_flink_spark.pipeline.profile import referential_orphans

    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    child = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 9), (13, None), (14, 1)],
        "id long, fk long",
    )
    row = referential_orphans(child, parent, "fk", "pk", "c->p").first()
    assert (row.relation, row.n_child, row.n_orphans, row.n_null_fk) == (
        "c->p", 5, 1, 1,
    )


def test_key_skew_metrics(spark):
    """Handcrafted skew: one hot key of 6 rows among 4 keys / 12 rows
    gives skew_ratio 2.0 and a hot-2 share of 9/12."""
    from tsne_flink_spark.pipeline.profile import key_skew

    rows = [(1,)] * 6 + [(2,)] * 3 + [(3,)] * 2 + [(4,)] * 1
    df = spark.createDataFrame(rows, "k long").repartition(5)
    r = key_skew(df, "k", top=2).first()
    assert (r.n_keys, r.n_rows, r.max_per_key) == (4, 12, 6)
    assert r.mean_per_key == 3.0 and r.skew_ratio == 2.0
    assert r.top_share == 0.75


def test_table_diff_statuses(spark):
    """added / removed / changed (NULL-safe both directions) / unchanged
    dropped; default compare_cols = shared non-key columns."""
    from tsne_flink_spark.pipeline.profile import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", 30), (5, "e", 50)],
        "id long, s string, v int",
    )
    got = {(r["id"], r["status"]) for r in table_diff(old, new, ["id"]).collect()}
    assert got == {
        (2, "changed"),   # s differs
        (3, "changed"),   # NULL -> 30
        (4, "removed"),
        (5, "added"),
    }
    # restricting compare_cols hides the s-only change
    got_v = {
        (r["id"], r["status"])
        for r in table_diff(old, new, ["id"], ["v"]).collect()
    }
    assert got_v == {(3, "changed"), (4, "removed"), (5, "added")}


def test_table_diff_empty_and_validation(spark):
    import pytest as _pytest

    from tsne_flink_spark.pipeline.profile import table_diff

    df = spark.createDataFrame([(1, "a")], "id long, s string")
    assert table_diff(df, df, ["id"]).collect() == []
    with _pytest.raises(ValueError):
        table_diff(df, df, [])


def test_categorical_association_extremes(spark):
    """Independent columns -> mi ~ 0, cramers_v ~ 0; a determined column
    (b = f(a)) -> nmi = 1 and cramers_v = 1; values match a scipy-free
    numpy reference on a random contingency table."""
    import math

    import numpy as np

    from tsne_flink_spark.pipeline.profile import categorical_association

    # perfectly independent: balanced product design
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = categorical_association(df, "a", "b").first()
    assert (r["n"], r["k_a"], r["k_b"]) == (100, 2, 2)
    assert r["mi"] == 0.0 and r["cramers_v"] == 0.0 and r["nmi"] == 0.0

    # b determined by a
    rows = [("x", "u")] * 30 + [("y", "v")] * 20 + [("z", "w")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = categorical_association(df, "a", "b").first()
    assert r["nmi"] == 1.0 and r["cramers_v"] == 1.0

    # reference check on an arbitrary table
    counts = {("x", "u"): 12, ("x", "v"): 3, ("y", "u"): 5, ("y", "v"): 20}
    rows = [(a, b) for (a, b), c in counts.items() for _ in range(c)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = categorical_association(df, "a", "b").first()
    n = sum(counts.values())
    ca = {"x": 15, "y": 25}
    cb = {"u": 17, "v": 23}
    mi = sum(
        (c / n) * math.log(c * n / (ca[a] * cb[b]))
        for (a, b), c in counts.items()
    )
    chi2 = sum(
        (c - ca[a] * cb[b] / n) ** 2 / (ca[a] * cb[b] / n)
        for (a, b), c in counts.items()
    )
    ha = -sum((v / n) * math.log(v / n) for v in ca.values())
    hb = -sum((v / n) * math.log(v / n) for v in cb.values())
    assert r["mi"] == round(mi, 6)
    assert r["nmi"] == round(mi / min(ha, hb), 6)
    assert r["cramers_v"] == round(math.sqrt(chi2 / (n * 1)), 6)
