"""Source/sink tests: COO CSV read + vector assembly, embedding CSV sink,
loss file, execution-plan dump (SURVEY §2.1)."""

import os

import pytest

from tsne_flink_spark.sources.readers import (
    assemble_points,
    coo_from_rows,
    read_points,
)
from tsne_flink_spark.sources.writers import (
    write_embedding_csv,
    write_execution_plan,
    write_loss,
)


def test_assemble_points(spark):
    coo = coo_from_rows(
        spark, [(0, 0, 1.0), (0, 2, 3.0), (1, 1, 5.0)]
    )
    pts = {r["id"]: list(r["features"]) for r in assemble_points(coo, 4).collect()}
    assert pts[0] == [1.0, 0.0, 3.0, 0.0]  # missing cells zero-filled
    assert pts[1] == [0.0, 5.0, 0.0, 0.0]


def test_read_points_csv(spark, tmp_path):
    path = tmp_path / "in.csv"
    path.write_text("0,0,1.5\n0,1,2.5\n1,0,-1.0\n1,1,0.5\n")
    pts = {r["id"]: list(r["features"]) for r in read_points(spark, str(path), 2).collect()}
    assert pts == {0: [1.5, 2.5], 1: [-1.0, 0.5]}


def test_write_embedding_csv(spark, tmp_path):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "id int, y array<double>"
    )
    out = str(tmp_path / "out")
    write_embedding_csv(emb, out, 2)
    rows = set()
    for f in os.listdir(out):
        if f.startswith("part-"):
            rows.update(
                line for line in open(os.path.join(out, f)).read().splitlines() if line
            )
    assert rows == {"0,1.0,2.0", "1,3.0,4.0"}


def test_write_loss(tmp_path):
    path = str(tmp_path / "loss.txt")
    write_loss([(20, 1.5), (10, 2.5)], path)
    assert open(path).read() == "10,2.5\n20,1.5\n"


def test_write_execution_plan(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 as double_id")
    path = str(tmp_path / "plan.txt")
    write_execution_plan(df, path)
    text = open(path).read()
    assert "Physical Plan" in text


def test_events_loader(spark):
    from tsne_flink_spark.sources.readers import load_events

    sf = "/root/testdata/sf0.001"
    if not os.path.exists(f"{sf}/events.parquet"):
        pytest.skip("testdata not present")
    ev = load_events(spark, sf)
    row = ev.select("ts").head()
    assert row["ts"].year >= 2020  # unit detected, timestamp plausible


def _write_events_parquet(tmp_path, unit):
    """Write a tiny events table with ts encoded in the given unit
    ('ns'/'us'/'ms' timestamp, or 'int64' for an un-annotated raw-nanos
    column)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    stamps = [base + datetime.timedelta(minutes=m) for m in (0, 5, 90)]
    if unit == "int64":
        ts_arr = pa.array(
            [int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1e9) for t in stamps],
            type=pa.int64(),
        )
    elif unit == "us_utc":
        # tz-aware (isAdjustedToUTC=true) — e.g. Spark-written parquet.
        ts_arr = pa.array(
            [t.replace(tzinfo=datetime.timezone.utc) for t in stamps],
            type=pa.timestamp("us", tz="UTC"),
        )
    else:
        ts_arr = pa.array(stamps, type=pa.timestamp(unit))
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts_arr,
            "user_id": pa.array([10, 10, 11], type=pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    sf_dir = tmp_path / f"sf_{unit}"
    sf_dir.mkdir()
    pq.write_table(table, str(sf_dir / "events.parquet"))
    return str(sf_dir)


@pytest.mark.parametrize("unit", ["ns", "us", "ms", "int64"])
def test_events_loader_units(spark, tmp_path, unit):
    """load_events must decode the same wall-clock instants regardless of the
    parquet timestamp encoding (the regenerated driver data switched
    NANOS -> MICROS between rounds; the loader detects the unit from the
    footer instead of assuming one)."""
    from tsne_flink_spark.sources.readers import load_events

    sf_dir = _write_events_parquet(tmp_path, unit)
    rows = load_events(spark, sf_dir).orderBy("event_id").collect()
    assert [r["event_id"] for r in rows] == [1, 2, 3]
    stamps = [r["ts"] for r in rows]
    assert all(t.year == 2024 and t.month == 3 for t in stamps)
    assert (stamps[1] - stamps[0]).total_seconds() == 300.0
    assert (stamps[2] - stamps[0]).total_seconds() == 5400.0


def test_events_loader_units_agree_in_non_utc_session(spark, tmp_path):
    """All four encodings of the same instants must decode IDENTICALLY even
    when the session timezone is not UTC: the NTZ branch interprets the
    stored wall clock as UTC (to_utc_timestamp), matching the raw-nanos
    branch's epoch arithmetic — a bare cast would shift by the session
    offset and break the event-time oracles only on non-UTC deployments."""
    from tsne_flink_spark.sources.readers import load_events

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # +05:30
    try:
        decoded = {}
        for unit in ("ns", "us", "ms", "int64", "us_utc"):
            sf_dir = _write_events_parquet(tmp_path, unit)
            rows = load_events(spark, sf_dir).orderBy("event_id").collect()
            decoded[unit] = [r["ts"] for r in rows]
        assert (
            decoded["ns"] == decoded["us"] == decoded["ms"]
            == decoded["int64"] == decoded["us_utc"]
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_parquet_ts_unit_detection(tmp_path):
    from tsne_flink_spark.sources.readers import _parquet_ts_unit

    for unit, expect in [
        ("ns", ("ns", None)),
        ("us", ("us", None)),
        ("ms", ("ms", None)),
        ("int64", (None, None)),
        ("us_utc", ("us", "UTC")),
    ]:
        sf_dir = _write_events_parquet(tmp_path, unit)
        assert _parquet_ts_unit(f"{sf_dir}/events.parquet") == expect


def test_documents_jsonl_roundtrip(spark, tmp_path):
    """JSONL corpus sink -> source round-trip preserves rows; malformed
    lines land in _corrupt_record instead of failing the read."""
    from tsne_flink_spark.sources.readers import read_documents_jsonl
    from tsne_flink_spark.sources.writers import write_documents_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path, compression="none", n_files=2)
    back = read_documents_jsonl(spark, path)
    # Spark refuses queries whose pruned column set is ONLY the internal
    # corrupt-record column; selecting * (collect) sidesteps the pruning
    assert [r for r in back.collect() if r["_corrupt_record"] is not None] == []
    a = {(r["doc_id"], r["text"]) for r in docs.collect()}
    b = {(r["doc_id"], r["text"]) for r in back.collect()}
    assert a == b

    # corrupt line handling: append a broken file into the directory
    (tmp_path / "docs_jsonl" / "zz-broken.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "not json at all\n"
    )
    again = read_documents_jsonl(spark, path)
    bad = [r for r in again.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 1
    assert again.count() == len(a) + 2


def test_write_sharded_layout_and_determinism(spark, tmp_path):
    """Seeded shuffle-shard writer: one directory per shard, balanced to
    within one doc, rank contract intact, and bit-identical mapping on a
    re-run (the reproducibility requirement)."""
    import os

    from tsne_flink_spark.sources.shard import shard_assignments, write_sharded

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(101)], "doc_id bigint, text string"
    )
    out = str(tmp_path / "shards")
    write_sharded(docs, out, n_shards=4, seed=7)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(out)
    sizes = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").count().withColumnRenamed("count", "n").collect()
    }
    assert max(sizes.values()) - min(sizes.values()) <= 1  # round-robin
    # rank contract: each shard holds ranks 0..n_k-1 exactly
    for k, n in sizes.items():
        ranks = sorted(
            r["rank_in_shard"] for r in back.where(f"shard = {k}").collect()
        )
        assert ranks == list(range(n))
    # determinism: same (corpus, n_shards, seed) -> same mapping; new seed
    # -> a different permutation
    a = {(r["doc_id"], r["shard"], r["rank_in_shard"])
         for r in shard_assignments(docs, 4, seed=7).collect()}
    b = {(r["doc_id"], r["shard"], r["rank_in_shard"])
         for r in shard_assignments(docs, 4, seed=7).collect()}
    c = {(r["doc_id"], r["shard"], r["rank_in_shard"])
         for r in shard_assignments(docs, 4, seed=8).collect()}
    assert a == b and a != c


def test_corpus_roundtrip_all_formats(spark, tmp_path):
    """write_corpus/read_corpus round-trip the same frame through
    parquet, orc, and jsonl."""
    from tsne_flink_spark.sources.readers import read_corpus
    from tsne_flink_spark.sources.writers import write_corpus

    docs = spark.createDataFrame(
        [(i, f"doc number {i}", "en") for i in range(40)],
        "doc_id bigint, text string, lang string",
    )
    want = {(r["doc_id"], r["text"], r["lang"]) for r in docs.collect()}
    for fmt in ("parquet", "orc", "jsonl"):
        path = str(tmp_path / f"corpus_{fmt}")
        write_corpus(docs, path, fmt=fmt, n_files=2)
        schema = "doc_id bigint, text string, lang string" if fmt == "jsonl" else None
        back = read_corpus(spark, path, fmt=fmt, schema=schema)
        got = {(r["doc_id"], r["text"], r["lang"]) for r in back.collect()}
        assert got == want, fmt
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_corpus(docs, str(tmp_path / "x"), fmt="avro")
