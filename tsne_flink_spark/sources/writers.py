"""Sinks (SURVEY §2.1): embedding CSV, loss file, execution-plan dump."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_embedding_csv(embedding: DataFrame, path: str, n_components: int = 2) -> None:
    """Write (id, y0, y1, ...) CSV, overwrite mode (Tsne.scala:86)."""
    flat = embedding.select(
        "id", *[F.col("y")[c].alias(f"y{c}") for c in range(n_components)]
    )
    flat.write.mode("overwrite").csv(path)


def write_loss(loss_records: list[tuple[int, float]], path: str) -> None:
    """Write per-iteration KL loss, one "iteration,loss" line each
    (Tsne.scala:97-101)."""
    Path(path).write_text(
        "".join(f"{it},{loss}\n" for it, loss in sorted(loss_records))
    )


def write_execution_plan(df: DataFrame, path: str) -> None:
    """Dump the formatted physical plan (the reference's --executionPlan mode,
    Tsne.scala:89-95)."""
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    Path(path).write_text(plan)


def write_documents_jsonl(
    docs: DataFrame,
    path: str,
    compression: str = "gzip",
    n_files: int = 0,
) -> None:
    """Write a documents corpus as JSON Lines (one object per line) — the
    export format downstream tokenizer/training tooling reads.  ``n_files``
    > 0 bounds the output file count via one repartition (the same sink
    discipline as curate_cli ``--output-files``); compression defaults to
    gzip for interchange compatibility (use ``none`` for splittable
    re-reads)."""
    out = docs.repartition(n_files) if n_files > 0 else docs
    writer = out.write.mode("overwrite")
    if compression and compression != "none":
        writer = writer.option("compression", compression)
    writer.json(path)


def write_corpus(
    docs: DataFrame,
    path: str,
    fmt: str = "parquet",
    compression: str | None = None,
    n_files: int = 0,
) -> None:
    """Format-dispatching corpus sink: parquet (default, analytics),
    orc (the other splittable columnar interchange format; Spark writes
    it natively), or jsonl (line-interchange).  ``n_files`` > 0 bounds
    the output file count via one repartition.  Per-format default
    codecs: zstd for columnar, gzip for jsonl."""
    if fmt == "jsonl":
        write_documents_jsonl(
            docs, path, compression=compression or "gzip", n_files=n_files
        )
        return
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unknown corpus format {fmt!r}")
    out = docs.repartition(n_files) if n_files > 0 else docs
    (
        out.write.mode("overwrite")
        .option("compression", compression or "zstd")
        .format(fmt)
        .save(path)
    )
