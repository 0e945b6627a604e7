"""End-to-end streaming corpus ingestion: JSONL micro-batches ->
incremental dedup against a historical fingerprint index (stream-static
left-anti join + stateful in-stream dedup) -> parquet append sink.

The streaming shape every continuous ingestion pipeline runs; the batch
operators (`dedup.fingerprint_index`, `incremental_dedup_keep`) are
reused verbatim — same call site, streaming frame in.
"""

import json
import os
import time


def _write_jsonl(path: str, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_ingestion_incremental_dedup(spark, tmp_path):
    from tsne_flink_spark.pipeline.dedup import (
        fingerprint_index,
        incremental_dedup_keep,
    )

    historical = spark.createDataFrame(
        [
            (0, "seen this exact document before", "en"),
            (1, "another historical document body", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    index = fingerprint_index(historical)

    in_dir = tmp_path / "incoming"
    out_dir = str(tmp_path / "ingested")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).json(str(in_dir))
    assert stream.isStreaming
    kept = incremental_dedup_keep(stream, index)

    q = (
        kept.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # batch 1: one historical dup, one in-batch dup pair, one fresh doc
        _write_jsonl(
            str(in_dir / "b1.jsonl"),
            [
                {"doc_id": 10, "text": "seen this exact document before",
                 "lang": "en"},
                {"doc_id": 11, "text": "a brand new incoming document",
                 "lang": "en"},
                {"doc_id": 12, "text": "a brand new incoming document",
                 "lang": "en"},
                {"doc_id": 13, "text": "wholly original content here",
                 "lang": "de"},
            ],
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            try:
                got = {
                    r["doc_id"] for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                got = set()
            if got:
                break
            time.sleep(0.5)
        # doc 10 is a ref dup; exactly one of 11/12 survives; 13 survives
        assert 10 not in got
        assert 13 in got
        assert len(got & {11, 12}) == 1

        # batch 2: a dup of a batch-1 doc (caught by the STATEFUL in-stream
        # dedup — the index never saw it) plus one fresh doc
        _write_jsonl(
            str(in_dir / "b2.jsonl"),
            [
                {"doc_id": 20, "text": "wholly original content here",
                 "lang": "de"},
                {"doc_id": 21, "text": "late arriving unique document",
                 "lang": "en"},
            ],
        )
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {
                r["doc_id"] for r in spark.read.parquet(out_dir).collect()
            }
            if 21 in got:
                break
            time.sleep(0.5)
        assert 21 in got
        assert 20 not in got  # cross-batch dup suppressed by state
        assert 10 not in got
    finally:
        q.stop()


def test_streaming_quality_monitor(spark, tmp_path):
    """Corpus-quality monitoring on ingestion: the C4 filter is a pure
    Column narrow map, so it runs UNCHANGED on a streaming frame; kill
    reasons aggregate per micro-batch into an append-mode parquet audit
    trail (the shape of a production data-quality monitor)."""
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.quality import c4_line_filter

    in_dir = tmp_path / "incoming_q"
    out_dir = str(tmp_path / "quality_audit")
    ckpt = str(tmp_path / "ckpt_q")
    os.makedirs(in_dir)

    good = "\n".join(
        f"this is a perfectly fine sentence number {k}." for k in range(6)
    )
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(in_dir)
    )
    audited = c4_line_filter(stream).select(
        "doc_id", "killed", "kill_reason"
    )
    assert audited.isStreaming

    q = (
        audited.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        _write_jsonl(
            str(in_dir / "q1.jsonl"),
            [
                {"doc_id": 1, "text": good},
                {"doc_id": 2, "text": good + "\nlorem ipsum dolor sit amet."},
            ],
        )
        time.sleep(3)
        _write_jsonl(
            str(in_dir / "q2.jsonl"),
            [{"doc_id": 3, "text": "page full of { markup }."}],
        )
        deadline = time.time() + 60
        rows = {}
        while time.time() < deadline and len(rows) < 3:
            q.processAllAvailable()
            try:
                rows = {
                    r["doc_id"]: r
                    for r in spark.read.parquet(out_dir).collect()
                }
            except Exception:
                rows = {}
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(rows) == 3
    assert not rows[1]["killed"]
    assert rows[2]["kill_reason"] == "lorem_ipsum"
    assert rows[3]["kill_reason"] == "curly_brace"
