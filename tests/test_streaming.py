"""Event-stream operator tests: batch semantics + streaming-mode wiring."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by a 2-hour gap
    for i, mins in enumerate([0, 5, 10, 130, 135]):
        rows.append((i, base + dt.timedelta(minutes=mins), 1, "click", 1.0, "{}"))
    # user 2: one session
    for i, mins in enumerate([3, 8]):
        rows.append((10 + i, base + dt.timedelta(minutes=mins), 2, "view", 2.0, "{}"))
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_windowed_event_counts(spark, events):
    from tsne_flink_spark.streaming.events import windowed_event_counts

    out = windowed_event_counts(events, "1 hour").collect()
    rows = {(r["window_start"].hour, r["event_type"]): r["n_events"] for r in out}
    assert rows[(0, "click")] == 3
    assert rows[(0, "view")] == 2
    assert rows[(2, "click")] == 2


def test_sessionize(spark, events):
    from tsne_flink_spark.streaming.events import sessionize

    out = sessionize(events, gap_minutes=30).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2  # two sessions (2-hour gap)
    assert sorted(s["n_events"] for s in by_user[1]) == [2, 3]
    assert len(by_user[2]) == 1


def test_sessionize_streaming_batch_equivalence(spark, events):
    from tsne_flink_spark.streaming.events import sessionize_streaming

    out = sessionize_streaming(events, gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert len(by_user[2]) == 1


def test_dedup_events_batch(spark, events):
    from tsne_flink_spark.streaming.events import dedup_events

    doubled = events.union(events)
    assert dedup_events(doubled).count() == events.count()


def test_running_user_totals_batch(spark, events):
    from tsne_flink_spark.streaming.events import running_user_totals

    out = {r["user_id"]: r for r in running_user_totals(events).collect()}
    assert out[1]["n_events"] == 5 and out[2]["n_events"] == 2
    assert out[2]["sum_value"] == pytest.approx(4.0)


def test_running_user_totals_streaming(spark, tmp_path, events):
    """applyInPandasWithState wiring: file stream -> keyed state -> memory
    sink; final running totals must equal the batch aggregation."""
    from tsne_flink_spark.streaming.events import running_user_totals

    path = str(tmp_path / "ev2")
    events.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    totals = running_user_totals(stream)
    assert totals.isStreaming
    q = (
        totals.writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["user_id"]: r for r in spark.sql("select * from user_totals").collect()
    }
    assert rows[1]["n_events"] == 5
    assert rows[2]["n_events"] == 2
    assert rows[2]["sum_value"] == pytest.approx(4.0)


def test_state_history_streaming_parity(spark, tmp_path):
    """Streaming SCD2 (applyInPandasWithState) emits exactly the CLOSED
    intervals the batch operator computes, on the real sf0.001 events
    table through a file stream."""
    from tsne_flink_spark.streaming.events import state_history_streaming

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    path = str(tmp_path / "sh_ev")
    ev.write.parquet(path)

    def norm(df):
        return sorted(
            map(
                tuple,
                df.select(
                    "user_id",
                    "event_type",
                    F.col("valid_from").cast("string"),
                    F.col("valid_to").cast("string"),
                    "n_events",
                ).collect(),
            )
        )

    want = norm(state_history_streaming(ev))  # batch fallback: closed rows
    assert want, "expected closed intervals in the real table"
    stream = spark.readStream.schema(ev.schema).parquet(path)
    out = state_history_streaming(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert norm(spark.sql("select * from sh_stream")) == want


def test_transition_feed_streaming_parity(spark, tmp_path):
    """Streaming transition feed (applyInPandasWithState) emits exactly
    the pairs the batch lead() window computes, on the real sf0.001
    events table through a file stream — and the feed's rollup equals
    event_transitions' counts."""
    from tsne_flink_spark.streaming.events import (
        event_transitions,
        transition_feed,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "user_id", "event_type"
    )
    path = str(tmp_path / "tf_ev")
    ev.write.parquet(path)

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

    want = norm(transition_feed(ev))  # batch fallback
    assert want, "expected transitions in the real table"
    stream = spark.readStream.schema(ev.schema).parquet(path)
    out = transition_feed(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("tf_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_df = spark.sql("select * from tf_stream")
    assert norm(got_df) == want
    # the feed's rollup equals the batch transition matrix counts
    feed_counts = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in got_df.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    want_counts = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(ev).collect()
    }
    assert feed_counts == want_counts


def test_transition_feed_cross_batch(spark, tmp_path):
    """A user's last event must SURVIVE the micro-batch boundary in the
    keyed state: events split across two files (one per batch) emit the
    boundary-spanning pair."""
    import os

    from tsne_flink_spark.streaming.events import transition_feed

    base = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    f1 = spark.createDataFrame([(1, base, 7, "A")], schema)
    f2 = spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=1), 7, "B")], schema
    )
    path = str(tmp_path / "tf_cb")
    os.makedirs(path)
    f1.coalesce(1).write.parquet(path + "/b1")
    f2.coalesce(1).write.parquet(path + "/b2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/b*")
    )
    q = (
        transition_feed(stream)
        .writeStream.format("memory")
        .queryName("tf_cb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tf_cb").collect()
    assert [(r["user_id"], r["from_type"], r["to_type"]) for r in rows] == [
        (7, "A", "B")
    ]


def test_state_history_streaming_cross_batch(spark, tmp_path):
    """An open interval must SURVIVE the micro-batch boundary in the
    keyed state: events split across two files (one per batch) close
    intervals spanning the boundary with the right counts."""
    import os

    from tsne_flink_spark.streaming.events import state_history_streaming

    base = dt.datetime(2024, 1, 1)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    f1 = spark.createDataFrame(
        [(1, base, 7, "A"), (2, base + dt.timedelta(minutes=1), 7, "A")],
        schema,
    )
    f2 = spark.createDataFrame(
        [
            (3, base + dt.timedelta(minutes=2), 7, "B"),
            (4, base + dt.timedelta(minutes=3), 7, "A"),
        ],
        schema,
    )
    path = tmp_path / "sh_batches"
    f1.coalesce(1).write.parquet(str(path))
    f2.coalesce(1).write.mode("append").parquet(str(path))
    # force deterministic file pickup order (readStream orders by mtime):
    # identify each part file by its CONTENT (names are uuid-random), then
    # stamp mtimes in event order
    import pyarrow.parquet as pq

    parts = [p for p in os.listdir(path) if p.startswith("part-")]
    assert len(parts) == 2
    parts.sort(
        key=lambda p: min(
            pq.read_table(path / p, columns=["event_id"])
            .column(0)
            .to_pylist()
        )
    )
    for i, p in enumerate(parts):
        os.utime(path / p, (1_700_000_000 + 100 * i,) * 2)

    stream = (
        spark.readStream.schema(f1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(path))
    )
    q = (
        state_history_streaming(stream)
        .writeStream.format("memory")
        .queryName("sh_xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["event_type"], r["n_events"])
        for r in spark.sql("select * from sh_xbatch").collect()
    )
    # A-interval (2 events, file 1) closed by B (file 2); B closed by the
    # final A, which stays open in state
    assert got == [("A", 2), ("B", 1)]


def test_dedup_events_streaming(spark, tmp_path, events):
    """dropDuplicatesWithinWatermark wiring on a duplicated file stream."""
    from tsne_flink_spark.streaming.events import dedup_events

    path = str(tmp_path / "ev3")
    events.union(events).write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(events.schema).parquet(path)
    deduped = dedup_events(stream)
    assert deduped.isStreaming
    q = (
        deduped.writeStream.format("memory")
        .queryName("deduped_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(*) c from deduped_events").collect()[0]["c"]
    assert n == events.count()


def test_streaming_source_wiring(spark, tmp_path, events):
    """readStream file source + watermarked windowed agg wires into a
    streaming query (processed with availableNow, written to memory sink)."""
    from tsne_flink_spark.streaming.events import windowed_event_counts

    path = str(tmp_path / "events_parquet")
    events.write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(events.schema).parquet(path)
    )
    agg = windowed_event_counts(stream, "1 hour")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows (watermark passed); the final
    # window stays open, so just assert the query ran and the table exists
    spark.sql("select * from win_counts").collect()


def test_sessionize_streaming_e2e(spark, tmp_path):
    """session_window through a REAL multi-micro-batch stream: file source
    (one file per trigger), watermark advances between batches, closed
    sessions emit in append mode and match the batch result."""
    import datetime as dt

    from tsne_flink_spark.streaming.events import sessionize_streaming

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def ev(eid, uid, minutes, value):
        return (eid, t0 + dt.timedelta(minutes=minutes), uid, "click", value, "{}")

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    # user 1: two sessions (gap > 30 min); user 2: one session
    batch1 = spark.createDataFrame(
        [ev(0, 1, 0, 1.0), ev(1, 1, 10, 2.0), ev(2, 2, 5, 5.0)], schema
    )
    batch2 = spark.createDataFrame(
        [ev(3, 1, 120, 3.0), ev(4, 2, 15, 7.0)], schema
    )
    # sentinel far in the future: pushes the watermark past every real
    # session so append mode emits them all before the stream drains
    sentinel = spark.createDataFrame([ev(99, 999, 6000, 0.0)], schema)

    path = tmp_path / "sess_src"
    batch1.coalesce(1).write.mode("append").parquet(str(path))
    batch2.coalesce(1).write.mode("append").parquet(str(path))
    sentinel.coalesce(1).write.mode("append").parquet(str(path))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(path))
    )
    sess = sessionize_streaming(stream, gap="30 minutes")
    assert sess.isStreaming
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 3  # genuinely multi-micro-batch
    got = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in spark.sql(
            "select * from sessions_e2e where user_id < 999"
        ).collect()
    }
    # batch-mode ground truth on the same rows
    expected = {
        (r["user_id"], r["n_events"], r["sum_value"])
        for r in sessionize_streaming(batch1.union(batch2), gap="30 minutes").collect()
    }
    assert got == expected
    assert (1, 2, 3.0) in got and (1, 1, 3.0) in got and (2, 2, 12.0) in got


def test_stream_stream_interval_join_e2e(spark, tmp_path):
    """Watermarked stream-stream interval join through real micro-batches:
    both sides are file streams, the time-bound condition keeps state
    finite, and the joined output matches the batch-mode result."""
    import datetime as dt

    from tsne_flink_spark.streaming.events import stream_stream_interval_join

    t0 = dt.datetime(2024, 1, 1, 8, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    lschema = "l_id bigint, ts timestamp, key bigint"
    rschema = "r_id bigint, rts timestamp, key bigint"
    lrows = [(1, at(0), 7), (2, at(30), 7), (3, at(0), 8), (99, at(6000), 0)]
    rrows = [(10, at(5), 7), (11, at(50), 7), (12, at(200), 7),
             (13, at(10), 8), (98, at(6000), 0)]
    ldf = spark.createDataFrame(lrows, lschema)
    rdf = spark.createDataFrame(rrows, rschema)
    lpath, rpath = tmp_path / "l", tmp_path / "r"
    ldf.coalesce(1).write.parquet(str(lpath))
    rdf.coalesce(1).write.parquet(str(rpath))

    lstream = spark.readStream.schema(lschema).parquet(str(lpath))
    rstream = spark.readStream.schema(rschema).parquet(str(rpath))
    joined = stream_stream_interval_join(
        lstream, rstream, on="key", lower="0 seconds", upper="1 hour"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["l_id"], r["r_id"])
        for r in spark.sql("select * from ssj where l_id < 99").collect()
    }
    batch = {
        (r["l_id"], r["r_id"])
        for r in stream_stream_interval_join(
            ldf, rdf, on="key", lower="0 seconds", upper="1 hour"
        ).where("l_id < 99").collect()
    }
    # l1 matches r10+r11 (within +1h), l2 matches r11 (50 >= 30), l3 -> r13
    assert batch == {(1, 10), (1, 11), (2, 11), (3, 13)}
    assert got == batch


def test_as_of_join(spark):
    import datetime as dt

    from tsne_flink_spark.operators.asof import as_of_join

    t = dt.datetime
    left = spark.createDataFrame(
        [
            (1, t(2024, 1, 1, 10), 100),
            (2, t(2024, 1, 1, 12), 100),
            (3, t(2024, 1, 1, 9), 200),   # before any right row for 200
            (4, t(2024, 1, 1, 11), 200),  # exactly at a right ts: inclusive
        ],
        "event_id bigint, ts timestamp, key bigint",
    )
    right = spark.createDataFrame(
        [
            (100, t(2024, 1, 1, 9), "a", None),   # NULL payload field survives
            (100, t(2024, 1, 1, 11), "b", 2.0),
            (200, t(2024, 1, 1, 11), "c", 3.0),
        ],
        "key bigint, rts timestamp, tag string, score double",
    )
    out = {
        r["event_id"]: r
        for r in as_of_join(left, right, on="key", left_ts="ts", right_ts="rts").collect()
    }
    assert out[1]["tag"] == "a" and out[1]["score"] is None  # atomic row carry
    assert out[2]["tag"] == "b" and out[2]["score"] == 2.0
    assert out[3]["tag"] is None and out[3]["__matched_ts"] is None  # no match
    assert out[4]["tag"] == "c"  # right_ts == left_ts is inclusive


def test_range_join(spark):
    import datetime as dt

    from tsne_flink_spark.operators.rangejoin import range_join

    t = dt.datetime
    points = spark.createDataFrame(
        [(1, t(2024, 1, 1, 10, 30)), (2, t(2024, 1, 1, 11, 0)),
         (3, t(2024, 1, 2, 9, 0))],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", t(2024, 1, 1, 10), t(2024, 1, 1, 11)),   # pid 1 only ([s, e))
         ("b", t(2024, 1, 1, 10), t(2024, 1, 2, 10)),   # pids 1, 2, 3
         ("c", t(2024, 1, 3, 0), t(2024, 1, 4, 0))],    # none
        "iid string, s timestamp, e timestamp",
    )
    out = range_join(points, intervals, "ts", "s", "e", bucket_width="1 hour")
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(1, "a"), (1, "b"), (2, "b"), (3, "b")}


def test_range_join_non_utc_session(spark):
    """Bucket width must not absorb the session timezone offset.

    With TZ +01:00 and bucket_width '1 hour' the old epoch-anchored width
    computation collapsed to 0 seconds (NULL buckets, silently empty join).
    """
    import datetime as dt

    from tsne_flink_spark.operators.rangejoin import range_join

    t = dt.datetime
    points = spark.createDataFrame(
        [(1, t(2024, 1, 1, 10, 30)), (2, t(2024, 1, 1, 11, 0)),
         (3, t(2024, 1, 2, 9, 0))],
        "pid bigint, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", t(2024, 1, 1, 10), t(2024, 1, 1, 11)),
         ("b", t(2024, 1, 1, 10), t(2024, 1, 2, 10)),
         ("c", t(2024, 1, 3, 0), t(2024, 1, 4, 0))],
        "iid string, s timestamp, e timestamp",
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
    try:
        out = range_join(points, intervals, "ts", "s", "e", bucket_width="1 hour")
        got = {(r["pid"], r["iid"]) for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == {(1, "a"), (1, "b"), (2, "b"), (3, "b")}


def test_interval_seconds_parsing():
    from tsne_flink_spark.operators.rangejoin import _interval_seconds

    assert _interval_seconds("1 day") == 86400
    assert _interval_seconds("6 hours") == 21600
    assert _interval_seconds("1 hour 30 minutes") == 5400
    assert _interval_seconds("2 weeks") == 1209600
    import pytest

    with pytest.raises(ValueError):
        _interval_seconds("3 parsecs")
    with pytest.raises(ValueError):
        _interval_seconds("")


def test_stream_events_real_table_batch_parity(spark, tmp_path):
    """End-to-end batch/stream parity on the REAL driver events table:
    stream_events_from_files (unit-detected, same instants as the batch
    loader) -> windowed counts in COMPLETE mode must equal the batch
    result exactly."""
    import os
    import shutil

    import pytest as _pytest

    src = "/root/testdata/sf0.001/events.parquet"
    if not os.path.exists(src):
        _pytest.skip("testdata not present")
    from tsne_flink_spark.sources.readers import load_events
    from tsne_flink_spark.streaming.events import (
        stream_events_from_files,
        windowed_event_counts,
    )

    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    shutil.copy(src, os.path.join(stream_dir, "events.parquet"))

    stream = stream_events_from_files(spark, stream_dir)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, "1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("parity_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    batch = windowed_event_counts(
        load_events(spark, "/root/testdata/sf0.001"), "1 day"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from parity_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want and len(want) > 0


def test_stream_events_empty_dir_falls_back(spark, tmp_path):
    """An empty watched directory is a normal initial state for a file-stream
    source: setup must not raise, falling back to the classic TIMESTAMP
    schema (ADVICE r4)."""
    import os

    from tsne_flink_spark.streaming.events import stream_events_from_files

    stream_dir = str(tmp_path / "empty_stream")
    os.makedirs(stream_dir)
    stream = stream_events_from_files(spark, stream_dir)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_event_funnel_ordered_reachability(spark):
    from tsne_flink_spark.streaming.events import event_funnel

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 00:00:00", "signup"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # user 2: purchase BEFORE click -> reaches click, not purchase
        (2, "2024-01-01 00:00:00", "signup"),
        (2, "2024-01-01 02:00:00", "click"),
        (2, "2024-01-01 01:00:00", "purchase"),
        # user 3: no signup -> never enters the funnel
        (3, "2024-01-01 00:00:00", "click"),
        (3, "2024-01-01 01:00:00", "purchase"),
        # user 4: signup only
        (4, "2024-01-01 03:00:00", "signup"),
        # user 5: greedy-earliest still exact — an early click before
        # signup must not block the later qualifying one
        (5, "2024-01-01 00:30:00", "click"),
        (5, "2024-01-01 01:00:00", "signup"),
        (5, "2024-01-01 02:00:00", "click"),
        (5, "2024-01-01 03:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        [(u, t, k) for u, t, k in rows], "user_id long, ts string, event_type string"
    ).select("user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "event_type")
    out = {r["step"]: r for r in event_funnel(
        ev, ["signup", "click", "purchase"]).collect()}
    assert out["signup"]["n_users"] == 4      # users 1, 2, 4, 5
    assert out["click"]["n_users"] == 3       # users 1, 2, 5
    assert out["purchase"]["n_users"] == 2    # users 1, 5
    assert out["purchase"]["conversion_from_prev"] == round(2 / 3, 6)
    assert out["purchase"]["conversion_from_first"] == 0.5
    # step 0 has no previous step: conversion_from_prev is 1.0 by
    # convention (it used to leak n_users/1 = the raw count)
    assert out["signup"]["conversion_from_prev"] == 1.0
    assert out["signup"]["conversion_from_first"] == 1.0


def test_user_cohorts_matrix(spark):
    from tsne_flink_spark.streaming.events import user_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"),  # Monday, cohort W1
        (1, "2024-01-09 10:00:00"),  # W2
        (1, "2024-01-16 10:00:00"),  # W3
        (2, "2024-01-02 10:00:00"),  # cohort W1
        (3, "2024-01-08 10:00:00"),  # cohort W2
        (3, "2024-01-21 10:00:00"),  # Sunday of W3 (still W3)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_active_users"]
        for r in user_cohorts(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 2,   # users 1, 2
        ("2024-01-01", 1): 1,   # user 1
        ("2024-01-01", 2): 1,   # user 1
        ("2024-01-08", 0): 1,   # user 3
        ("2024-01-08", 1): 1,   # user 3
    }


def test_touch_attribution_models(spark):
    """Handcrafted attribution scenario: last-touch picks the latest
    preceding touch (ties by event id), linear splits the value across
    every in-horizon touch, out-of-horizon touches are excluded, and
    untouched conversions land in the '(none)' row."""
    from datetime import datetime

    from tsne_flink_spark.streaming.events import touch_attribution

    T = datetime
    rows = [
        # user 1: click(d1), view(d2) -> purchase(d3, 100): last=view,
        # linear 50/50
        (1, 1, T(2024, 1, 1), "click", 0.0),
        (2, 1, T(2024, 1, 2), "view", 0.0),
        (3, 1, T(2024, 1, 3), "purchase", 100.0),
        # user 2: click 10 days before purchase -> outside 7d horizon:
        # '(none)'
        (4, 2, T(2024, 1, 1), "click", 0.0),
        (5, 2, T(2024, 1, 11), "purchase", 40.0),
        # user 3: click and view at the SAME ts -> tie broken by higher
        # event_id (7 = view)
        (6, 3, T(2024, 2, 1), "click", 0.0),
        (7, 3, T(2024, 2, 1), "view", 0.0),
        (8, 3, T(2024, 2, 2), "purchase", 60.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    got = {
        r.touch_type: (
            r.conversions_last_touch,
            round(r.value_last_touch, 6),
            round(r.value_linear, 6),
        )
        for r in touch_attribution(ev, "purchase", ("click", "view")).collect()
    }
    assert got["view"] == (2, 160.0, 80.0)     # last for users 1 and 3
    assert got["click"] == (0, 0.0, 80.0)      # linear half of 100 + 60
    assert got["(none)"] == (1, 40.0, 0.0)     # user 2's horizon miss


def test_event_transitions_reference(spark):
    """Handcrafted timeline: counts and conditional probabilities match
    the hand-derived chain, same-ts ties break by event_id, and per-from
    probabilities sum to 1."""
    from datetime import datetime

    from tsne_flink_spark.streaming.events import event_transitions

    T = datetime
    rows = [
        # user 1 chain: a -> b -> a -> c
        (1, 1, T(2024, 1, 1, 0), "a", 0.0),
        (2, 1, T(2024, 1, 1, 1), "b", 0.0),
        (3, 1, T(2024, 1, 1, 2), "a", 0.0),
        (4, 1, T(2024, 1, 1, 3), "c", 0.0),
        # user 2: same-ts tie -> event_id order: a(5) -> b(6) -> a(7)
        (5, 2, T(2024, 1, 2), "a", 0.0),
        (6, 2, T(2024, 1, 2), "b", 0.0),
        (7, 2, T(2024, 1, 3), "a", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    got = {
        (r.from_type, r.to_type): (r.n, round(r.p, 6))
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (2, 1.0),
    }
