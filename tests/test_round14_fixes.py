"""Round-14 regression tests for the five r13 ADVICE findings.

Each test pins the FIXED behavior:
1. transition_feed / state_history_streaming sort the whole micro-batch
   group, not each Arrow chunk independently (chunking appears when a
   group exceeds spark.sql.execution.arrow.maxRecordsPerBatch);
2. winsorize passes NULL values through unchanged instead of clipping
   them to the low bound;
3. categorical_association is complete-case: NULL categories are
   excluded up front, so nmi(x, x) == 1 even with NULLs present;
4. adamic_adar rejects unknown max_degree strings instead of silently
   returning an empty result;
5. countmin_estimate derives the bucket width from the sketch itself,
   so probe hashing can never disagree with build-time hashing.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F


def _run_stream(spark, out, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_transition_feed_multi_chunk_group(spark, tmp_path):
    """One user's 40-event micro-batch split into many Arrow chunks must
    still emit transitions in global (ts, id) order — a per-chunk sort
    would interleave wrong pairs."""
    from tsne_flink_spark.streaming.events import transition_feed

    base = dt.datetime(2024, 1, 1)
    rng = random.Random(7)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, f"T{i % 5}")
        for i in range(40)
    ]
    rng.shuffle(rows)  # file order != time order
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ev = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "tf_chunks")
    ev.coalesce(1).write.parquet(path)

    def norm(df):
        return sorted(
            map(
                tuple,
                df.select(
                    "user_id", "from_type", "to_type",
                    F.col("ts").cast("string"),
                ).collect(),
            )
        )

    want = norm(transition_feed(ev))
    assert len(want) == 39
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(ev.schema).parquet(path)
        got = norm(_run_stream(spark, transition_feed(stream), "tf_chunks"))
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == want


def test_state_history_streaming_multi_chunk_group(spark, tmp_path):
    """Same chunking hazard in the SCD2 feed: closed intervals must
    reflect the globally-sorted event order."""
    from tsne_flink_spark.streaming.events import state_history_streaming

    base = dt.datetime(2024, 1, 1)
    rng = random.Random(11)
    # runs of equal state so n_events > 1 intervals exist
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, f"S{(i // 4) % 3}")
        for i in range(36)
    ]
    rng.shuffle(rows)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ev = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "sh_chunks")
    ev.coalesce(1).write.parquet(path)

    def norm(df):
        return sorted(
            map(
                tuple,
                df.select(
                    "user_id", "event_type",
                    F.col("valid_from").cast("string"),
                    F.col("valid_to").cast("string"),
                    "n_events",
                ).collect(),
            )
        )

    want = norm(state_history_streaming(ev))
    assert want
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(ev.schema).parquet(path)
        got = norm(
            _run_stream(
                spark, state_history_streaming(stream), "sh_chunks"
            )
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == want


def test_winsorize_null_passthrough(spark):
    from tsne_flink_spark.pipeline.quality import winsorize

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 1000.0), (5, None)],
        "id bigint, v double",
    )
    out = {
        r["id"]: r["v_w"]
        for r in winsorize(df, "v", lo=0.25, hi=0.75).collect()
    }
    assert out[5] is None  # NULL stays NULL, not the low clip bound
    assert out[1] == pytest.approx(17.5)  # clipped up to p25
    assert out[4] == pytest.approx(272.5)  # clipped down to p75
    assert out[2] == pytest.approx(20.0)


def test_categorical_association_null_complete_case(spark):
    from tsne_flink_spark.pipeline.profile import categorical_association

    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "b"), ("c", "c"),
         (None, "a"), ("b", None), (None, None)],
        "x string, y string",
    )
    row = categorical_association(df, "x", "y").collect()[0]
    # complete-case: only the 4 fully-observed rows count
    assert row["n"] == 4
    assert row["k_a"] == 3 and row["k_b"] == 3
    # identical columns => perfect association, mi >= 0
    assert row["nmi"] == pytest.approx(1.0)
    assert row["cramers_v"] == pytest.approx(1.0)
    assert row["mi"] >= 0.0


def test_adamic_adar_rejects_unknown_string(spark):
    from tsne_flink_spark.operators.graph import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "a bigint, b bigint"
    )
    with pytest.raises(ValueError, match="max_degree"):
        adamic_adar(edges, max_degree="srqt")  # typo'd cap
    # the sanctioned spelling still works
    assert adamic_adar(edges, max_degree="sqrt").count() >= 0


def test_countmin_estimate_w_derived_from_sketch(spark):
    from tsne_flink_spark.pipeline.sketches import (
        countmin_estimate,
        countmin_sketch,
    )

    vals = [("x",)] * 7 + [("y",)] * 3 + [("z",)] * 1
    df = spark.createDataFrame(vals, "t string")
    # non-default width: estimates must still never underestimate,
    # proving the probe hash uses the sketch's own w
    sk = countmin_sketch(df, "t", w=37, d=4)
    probes = spark.createDataFrame([("x",), ("y",), ("z",)], "t string")
    est = {
        r["t"]: r["est"] for r in countmin_estimate(sk, probes, "t").collect()
    }
    assert est["x"] >= 7 and est["y"] >= 3 and est["z"] >= 1
    # signature no longer accepts an independent w
    import inspect

    assert "w" not in inspect.signature(countmin_estimate).parameters
