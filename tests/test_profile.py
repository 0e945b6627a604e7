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
