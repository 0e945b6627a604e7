"""A/B: the bench-mode shared near-dup pair graph vs per-query mining.

Runs every dup-family gate query twice in one session — once with
SPARK_GRAFT_SHARED_MINER unset (per-query isolation, the gate's mode)
and once with it set (bench mode, one materialized miner) — and
compares an order-insensitive value hash per query, plus the wall-clock
saved.  Expected: identical hashes (the miner is deterministic, sharing
only skips re-execution), bench-mode wall well below isolation wall.

Usage: python tools/ab_shared_miner.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, ".")

DUP_FAMILY = [
    "ngram_jaccard_pairs",
    "dup_clusters",
    "dup_pagerank",
    "dup_best_rep",
    "dup_triangles",
    "dup_kcore",
    "dup_random_walks",
    "dup_walk_embeddings_check",
    "leakage_split",
]


def value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        "|".join(str(r[c]) for c in cols) for r in df.collect()
    )
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ab-shared-miner")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    results: dict[str, dict[str, tuple[str, float]]] = {}
    for mode, flag in (("isolated", None), ("shared", "1")):
        if flag is None:
            os.environ.pop("SPARK_GRAFT_SHARED_MINER", None)
        else:
            os.environ["SPARK_GRAFT_SHARED_MINER"] = flag
        entrymod._SHARED_MINER_CACHE.clear()
        t_mode = time.time()
        for name in DUP_FAMILY:
            t0 = time.time()
            h = value_hash(qs[name](spark, sf_dir))
            results.setdefault(name, {})[mode] = (
                h, round(time.time() - t0, 2),
            )
        print(f"{mode}: {round(time.time() - t_mode, 1)}s total")

    bad = 0
    for name, r in results.items():
        same = r["isolated"][0] == r["shared"][0]
        bad += not same
        print(
            f"{'OK ' if same else 'DIFF'} {name}: hash "
            f"{r['isolated'][0]}{'==' if same else '!='}{r['shared'][0]}  "
            f"{r['isolated'][1]}s -> {r['shared'][1]}s"
        )
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
