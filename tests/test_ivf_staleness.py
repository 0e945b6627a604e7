"""ivf_index_staleness audit operator (the B83 rebuild trigger)."""

from __future__ import annotations


def test_ivf_index_staleness_balanced_vs_crowded(spark):
    from tsne_flink_spark.pipeline.similarity import ivf_index_staleness

    cents = spark.createDataFrame(
        [(i, [0.0]) for i in range(4)], "list int, centroid array<double>"
    )
    balanced = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "vec_id bigint, list int"
    )
    row = ivf_index_staleness(cents, balanced).collect()[0]
    assert (
        row["n_lists"],
        row["n_vectors"],
        row["empty_lists"],
        row["max_per_list"],
    ) == (4, 40, 0, 10)
    assert row["skew_ratio"] == 1.0

    # every appended vector crowds list 0; lists 2/3 go empty
    crowded = spark.createDataFrame(
        [(i, 0) for i in range(30)] + [(100 + i, 1) for i in range(10)],
        "vec_id bigint, list int",
    )
    row = ivf_index_staleness(cents, crowded).collect()[0]
    assert row["empty_lists"] == 2
    assert row["max_per_list"] == 30
    assert row["skew_ratio"] == 3.0  # 30 / (40/4)


def test_ivf_index_staleness_empty_index(spark):
    from tsne_flink_spark.pipeline.similarity import ivf_index_staleness

    cents = spark.createDataFrame(
        [(i, [0.0]) for i in range(3)], "list int, centroid array<double>"
    )
    empty = spark.createDataFrame([], "vec_id bigint, list int")
    row = ivf_index_staleness(cents, empty).collect()[0]
    assert (
        row["n_lists"],
        row["n_vectors"],
        row["empty_lists"],
        row["max_per_list"],
        row["mean_per_list"],
        row["skew_ratio"],
    ) == (3, 0, 3, 0, 0.0, 0.0)
