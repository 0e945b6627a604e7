"""Standalone CLI for the curation pipeline:

    python -m tsne_flink_spark.pipeline.curate_cli \\
        --input /data/documents.parquet --output /data/curated \\
        --rate en=50 --rate de=30 --quality-min 0.55 --mode filter

``--strip-boilerplate N`` removes lines occurring in >= N documents
before the pipeline runs; ``--redact-pii`` scrubs emails/phones/IPv4s
from the written documents (filter mode).
``--mode annotate`` writes the full (doc_id, stage) audit table;
``--mode filter`` writes the kept documents themselves (all columns),
optionally hive-partitioned (``--partition-by lang``) with the
partition-column shuffle that keeps file counts bounded at corpus scale
(``--output-files N`` salts it to ~N files per directory), and zstd
compression by default.
Master defaults to ``local[*]`` and honors ``SPARK_GRAFT_MASTER`` the same
way bench.py does, so the identical invocation runs on a standalone
cluster.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tsne_flink_spark.pipeline.curate_cli")
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output parquet directory")
    p.add_argument("--mode", choices=["annotate", "filter"], default="annotate")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--stratum-col", default="lang")
    p.add_argument("--holdout-mod", type=int, default=10)
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--shingle-n", type=int, default=2)
    p.add_argument("--decon-ngram-n", type=int, default=5)
    p.add_argument("--quality-min", type=float, default=0.55)
    p.add_argument(
        "--rate",
        action="append",
        default=[],
        metavar="STRATUM=PCT",
        help="per-stratum keep percentage (repeatable)",
    )
    p.add_argument("--default-rate", type=int, default=5)
    p.add_argument(
        "--pair-miner", choices=["exact", "minhash"], default="exact"
    )
    p.add_argument(
        "--strip-boilerplate",
        type=int,
        default=0,
        metavar="MIN_DOCS",
        help="remove lines occurring in >= MIN_DOCS documents BEFORE the "
        "pipeline runs (CCNet-style; 0 = off) — dedup/quality then see "
        "the cleaned text",
    )
    p.add_argument(
        "--strip-dup-substrings",
        type=int,
        default=0,
        metavar="L",
        help="cut every L-token span occurring >= 2 times corpus-wide "
        "BEFORE the pipeline runs (ExactSubstr, Lee et al. 2022; 0 = off) "
        "— dedup/quality then see the cleaned text",
    )
    p.add_argument(
        "--perplexity-tail-pct",
        type=float,
        default=0.0,
        metavar="PCT",
        help="drop the PCT%% of documents with the highest perplexity "
        "under a corpus-trained bigram LM BEFORE the pipeline runs "
        "(CCNet-style tail cut; 0 = off).  Threshold via "
        "percentile_approx — no global sort",
    )
    p.add_argument(
        "--c4-clean",
        action="store_true",
        help="apply the C4 line/page rules BEFORE the pipeline runs "
        "(Raffel et al. 2020 §2.2): keep terminal-punctuation lines with "
        ">= 3 words and no 'javascript'; drop pages with lorem ipsum, a "
        "curly brace, or < 5 kept lines — dedup/quality then see the "
        "cleaned text",
    )
    p.add_argument(
        "--gopher-filter",
        action="store_true",
        help="drop documents failing the Gopher quality heuristics "
        "BEFORE the pipeline runs (Rae et al. 2021 §A1.1: word-count "
        "bounds, mean word length, symbol ratio, bullet/ellipsis lines, "
        "alphabetic-word fraction, stop-word presence)",
    )
    p.add_argument(
        "--redact-pii",
        action="store_true",
        help="replace emails/phones/IPv4s with typed placeholders in the "
        "written documents (filter mode only; the audit table has no text)",
    )
    p.add_argument(
        "--partition-by",
        action="append",
        default=[],
        metavar="COL",
        help="hive-partition the output by this column (repeatable; "
        "filter mode only — the audit table keeps every doc)",
    )
    p.add_argument(
        "--output-files",
        type=int,
        default=0,
        metavar="N",
        help="shuffle the output into N files (per partition directory "
        "when --partition-by is set); 0 keeps the plan's parallelism",
    )
    p.add_argument(
        "--compression",
        default="zstd",
        help="parquet codec for the output (zstd/snappy/gzip/none)",
    )
    p.add_argument(
        "--zorder-by",
        default="",
        metavar="COL1,COL2",
        help="cluster the written parquet on the Hilbert space-filling key "
        "of these numeric columns (filter mode only) so row-group min/max "
        "stats are tight on EVERY listed column — readers filtering on any "
        "of them skip most row groups (the B28 layout).  Composes with "
        "--partition-by (curve-clusters within each hive directory); "
        "--output-files sets the total file count (default 16)",
    )
    return p


def parse_rates(specs: list[str]) -> dict[str, int]:
    rates: dict[str, int] = {}
    for spec in specs:
        stratum, _, pct = spec.partition("=")
        if not stratum or not pct:
            raise SystemExit(f"bad --rate {spec!r} (want STRATUM=PCT)")
        rates[stratum] = int(pct)
    return rates


def run(args: argparse.Namespace, spark=None) -> int:
    from tsne_flink_spark.pipeline.curation import curation_pipeline

    owns_session = spark is None
    if owns_session:
        from pyspark.sql import SparkSession

        master = os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
        spark = (
            SparkSession.builder.master(master)
            .appName("curate")
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )
    try:
        docs = spark.read.parquet(args.input)
        if args.strip_boilerplate > 0:
            from tsne_flink_spark.operators.optimize import materialize
            from tsne_flink_spark.pipeline.scrub import strip_boilerplate

            # materialize the cleaned corpus: the staged pipeline reads its
            # input once per kill-set stage, and each read would otherwise
            # re-run the line-frequency count + reassembly joins
            docs = materialize(
                strip_boilerplate(
                    docs,
                    id_col=args.id_col,
                    text_col=args.text_col,
                    min_docs=args.strip_boilerplate,
                )
            )
        if args.perplexity_tail_pct > 0:
            from pyspark.sql import functions as F

            from tsne_flink_spark.operators.optimize import materialize
            from tsne_flink_spark.pipeline.lm import ngram_lm_scores

            scored = ngram_lm_scores(
                docs, text_col=args.text_col, id_col=args.id_col
            )
            cut = scored.agg(
                F.percentile_approx(
                    "perplexity", 1.0 - args.perplexity_tail_pct / 100.0, 10000
                ).alias("c")
            ).first()["c"]
            if cut is None:
                # no document produced a token (empty/whitespace corpus):
                # percentile over zero scored rows is NULL — nothing to cut
                pass
            else:
                keep = scored.where(
                    F.col("perplexity") <= F.lit(float(cut))
                ).select(args.id_col)
                # empty docs have no LM score; they pass through (the
                # quality stage downstream handles them) — hence the inner
                # join on the scored survivors unioned with the unscored ids
                unscored = docs.select(args.id_col).exceptAll(
                    scored.select(args.id_col)
                )
                docs = materialize(
                    docs.join(keep.union(unscored), args.id_col)
                )
        if args.c4_clean:
            from tsne_flink_spark.operators.optimize import materialize
            from tsne_flink_spark.pipeline.quality import c4_line_filter

            cleaned = c4_line_filter(
                docs, id_col=args.id_col, text_col=args.text_col
            )
            docs = materialize(
                cleaned.where(~cleaned["killed"]).drop(
                    "n_lines", "n_kept_lines", "killed", "kill_reason"
                )
            )
        if args.gopher_filter:
            from tsne_flink_spark.operators.optimize import materialize
            from tsne_flink_spark.pipeline.quality import gopher_quality

            keep = gopher_quality(
                docs, id_col=args.id_col, text_col=args.text_col
            ).where("passed").select(args.id_col)
            docs = materialize(docs.join(keep, args.id_col))
        if args.strip_dup_substrings > 0:
            from tsne_flink_spark.operators.optimize import materialize
            from tsne_flink_spark.pipeline.substr import exact_substring_dedup

            # materialize for the same reason as --strip-boilerplate: the
            # staged pipeline reads its input once per kill-set stage
            docs = materialize(
                exact_substring_dedup(
                    docs,
                    l=args.strip_dup_substrings,
                    id_col=args.id_col,
                    text_col=args.text_col,
                ).drop("n_dup_spans", "tokens_removed")
            )
        staged = curation_pipeline(
            docs,
            text_col=args.text_col,
            id_col=args.id_col,
            stratum_col=args.stratum_col,
            holdout_mod=args.holdout_mod,
            jaccard_threshold=args.jaccard_threshold,
            shingle_n=args.shingle_n,
            decon_ngram_n=args.decon_ngram_n,
            quality_min=args.quality_min,
            rates=parse_rates(args.rate) or None,
            default_rate=args.default_rate,
            pair_miner=args.pair_miner,
        )
        if args.mode == "filter":
            kept = staged.where(staged["stage"] == "kept").select(args.id_col)
            out = docs.join(kept, args.id_col)
            if args.redact_pii:
                from tsne_flink_spark.pipeline.scrub import redact_pii

                out = redact_pii(out, text_col=args.text_col)
        else:
            out = staged
        zorder_cols = [c for c in args.zorder_by.split(",") if c]
        if zorder_cols and args.mode != "filter":
            raise SystemExit("--zorder-by requires --mode filter")
        if zorder_cols:
            from tsne_flink_spark.sources.layout import write_zordered

            write_zordered(
                out,
                args.output,
                zorder_cols,
                n_files=args.output_files or 16,
                compression=args.compression,
                partition_by=args.partition_by or None,
            )
            n = spark.read.parquet(args.output).count()
            where = (
                f"zordered on {zorder_cols}"
                + (f", partitioned by {args.partition_by}"
                   if args.partition_by else "")
            )
            print(f"wrote {n} rows to {args.output} ({args.mode}, {where})")
            return 0
        part_cols = args.partition_by if args.mode == "filter" else []
        if part_cols:
            # shuffle on the partition columns BEFORE a partitionBy write:
            # without it every write task emits one file into every
            # partition directory (tasks x partitions small files — the
            # classic sink failure at corpus scale).  With --output-files,
            # salt the shuffle so each directory gets ~N files instead of
            # one potentially giant one.
            from pyspark.sql import functions as F

            if args.output_files > 0:
                salt = (F.crc32(F.col(args.id_col).cast("string"))
                        % args.output_files)
                out = out.repartition(*[F.col(c) for c in part_cols], salt)
            else:
                out = out.repartition(*[F.col(c) for c in part_cols])
        elif args.output_files > 0:
            out = out.repartition(args.output_files)
        writer = out.write.mode("overwrite").option(
            "compression", args.compression
        )
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"wrote {n} rows to {args.output} ({args.mode})")
        return 0
    finally:
        if owns_session:
            spark.stop()


def main(argv: list[str] | None = None, spark=None) -> int:
    return run(build_parser().parse_args(argv), spark=spark)


if __name__ == "__main__":
    sys.exit(main())
