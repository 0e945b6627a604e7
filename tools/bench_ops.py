"""The recurring bench chores as one CLI (r14 verdict item 10).

Folds tools/ab_query.py (interleaved same-session timing, the B84
methodology), the B88 /tmp solo-pin loop (fresh session per query),
tools/ab_shared_miner.py (dup-family shared-miner hash A/B, B87), and
the BENCH_r*.json calibration readers into subcommands:

    python tools/bench_ops.py solo [-r RUNS] QUERY [QUERY ...]
        Fresh local[N] session PER QUERY — each query runs in its own
        subprocess (clean JVM, clean Python-worker pool, clean codegen
        cache), RUNS runs inside it (first = warmup), reports the warm
        median.  This is the B88 solo-pin methodology: what a query
        costs with no suite state at all.

    python tools/bench_ops.py interleaved -r RUNS QUERY [QUERY ...]
        ONE session: 1 warmup round, then RUNS timed rounds round-robin
        (q1, q2, ..., q1, q2, ...) so host drift hits every query
        equally.  The B84 / ab_query methodology — right for comparing
        queries or revisions against each other on a drifting host.

    python tools/bench_ops.py comparable28 [-r RUNS] [--solo]
        The frozen r1 anchor set (the 28 queries of BENCH_r01.json)
        through the interleaved (default, = B84) or solo methodology;
        prints the warm-median subtotal and its ratio vs the 65.1 s r1
        anchor (the standing <=1.4x bar).

    python tools/bench_ops.py miner-ab [SF_DIR]
        Shared-miner vs isolated dup-family A/B (B87): every dup-family
        gate query twice in one session, order-insensitive value hash
        compared per query; exit 1 on any hash diff.

    python tools/bench_ops.py calib [BENCH_GLOB]
        Decode BENCH_r*.json artifacts: the calibration dict per round,
        plus named per-query timings when the values record's HEADLINE
        fingerprint matches this commit's bench.HEADLINE.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32).  Never run two Spark sessions
concurrently while timing — this host varies >2x under contention.
"""

from __future__ import annotations

import argparse
import gc
import glob
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R1_ANCHOR_SEC = 65.1  # BENCH_r01.json total at sf0.1 (the standing bar's base)

# The 28 queries of BENCH_r01.json, frozen in its emission order.  This
# is the cross-round perf anchor set: every round's "comparable-28"
# subtotal is this list, so the number is comparable back to round 1.
COMPARABLE28 = [
    "pricing_summary",
    "top_revenue_orders",
    "regional_revenue",
    "grouped_topk_orders",
    "global_aggregates",
    "events_by_user_segment",
    "windowed_event_counts",
    "sessionize",
    "joint_distribution",
    "knn_bruteforce",
    "knn_partition",
    "knn_project",
    "pairwise_affinities",
    "text_stats",
    "language_id",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "ngram_jaccard_pairs",
    "tfidf_top_terms",
    "embedding_dedup",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "sliding_user_activity",
    "quality_scores",
    "multimodal_features",
    "tsne_embedding",
]

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
    "curation_pipeline",
]


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _build_session(app: str):
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # executor-side Python workers resolve imports from PYTHONPATH, not
    # the driver's sys.path — required when invoked from outside REPO
    # (e.g. alternating two worktrees for a revision A/B from /tmp)
    os.environ["PYTHONPATH"] = REPO + (
        os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else ""
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


# ---------------------------------------------------------------- solo


def _solo_worker(name: str, runs: int) -> None:
    """One query, one fresh process: RUNS runs (first = warmup)."""
    spark = _build_session(f"solo-{name}")
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sf_dir = _sf_dir()
    times, rows = [], 0
    for i in range(runs):
        t0 = time.time()
        rows = fn(spark, sf_dir).count()
        dt = round(time.time() - t0, 3)
        times.append(dt)
        spark.catalog.clearCache()
        gc.collect()
    print(
        json.dumps(
            {
                "query": name,
                "rows": rows,
                "times": times,
                "warm_median": _median(times[1:]) if len(times) > 1 else times[0],
            }
        )
    )
    spark.stop()


def cmd_solo(names: list[str], runs: int) -> int:
    results = []
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_solo_worker", name, str(runs)],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            print(f"FAIL {name}: rc={proc.returncode}\n{proc.stderr[-2000:]}")
            return 1
        rec = json.loads(line)
        results.append(rec)
        print(
            f"# {name}: warm_median={rec['warm_median']}s "
            f"runs={rec['times']} rows={rec['rows']}",
            file=sys.stderr,
        )
    subtotal = round(sum(r["warm_median"] for r in results), 3)
    print(
        json.dumps(
            {
                "mode": "solo",
                "sf_dir": _sf_dir(),
                "runs_per_query": runs,
                "warm_median": {r["query"]: r["warm_median"] for r in results},
                "subtotal": subtotal,
            }
        )
    )
    return 0


# ---------------------------------------------------------- interleaved


def cmd_interleaved(names: list[str], runs: int, vs_anchor: bool = False) -> int:
    spark = _build_session("bench-ops-interleaved")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sf_dir = _sf_dir()
    times: dict[str, list[float]] = {n: [] for n in names}
    rows: dict[str, int] = {}
    for i in range(runs + 1):  # round 0 is warmup
        for n in names:
            t0 = time.time()
            rows[n] = qs[n](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            if i > 0:
                times[n].append(dt)
            else:
                print(f"# warmup {n}: {dt}s", file=sys.stderr)
            spark.catalog.clearCache()
            gc.collect()
    med = {n: _median(t) for n, t in times.items()}
    out = {
        "mode": "interleaved",
        "sf_dir": sf_dir,
        "timed_rounds": runs,
        "rows": rows,
        "times": times,
        "median": med,
        "subtotal": round(sum(med.values()), 3),
    }
    if vs_anchor:
        out["vs_r1_anchor"] = round(out["subtotal"] / R1_ANCHOR_SEC, 3)
    print(json.dumps(out))
    spark.stop()
    return 0


def cmd_comparable28(runs: int, solo: bool) -> int:
    if solo:
        rc = cmd_solo(COMPARABLE28, runs)
        return rc
    return cmd_interleaved(COMPARABLE28, runs, vs_anchor=True)


# ------------------------------------------------------------- miner-ab


def _value_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted("|".join(str(r[c]) for c in cols) for r in df.collect())
    return hashlib.sha1("\n".join(rows).encode()).hexdigest()[:16]


def cmd_miner_ab(sf_dir: str) -> int:
    """Shared-miner vs isolated dup-family hash + wall A/B (B87)."""
    import __spark_entry__ as entrymod

    spark = _build_session("bench-ops-miner-ab")
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
            h = _value_hash(qs[name](spark, sf_dir))
            results.setdefault(name, {})[mode] = (h, round(time.time() - t0, 2))
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
    spark.stop()
    return 1 if bad else 0


# ---------------------------------------------------------------- calib


def _tail_records(tail: str) -> list[dict]:
    recs = []
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            try:
                recs.append(json.loads(line))
            except ValueError:
                pass  # head-truncated by the 2,000-byte tail capture
    return recs


def cmd_calib(pattern: str) -> int:
    import bench

    fp = hashlib.sha1("\n".join(bench.HEADLINE).encode()).hexdigest()[:12]
    for path in sorted(glob.glob(pattern)):
        d = json.load(open(path))
        recs = _tail_records(d.get("tail", ""))
        summary = next(
            (r for r in recs if r.get("metric") == "total_wall_sec_headline_queries"),
            None,
        )
        values = next(
            (r for r in recs if r.get("metric") == "per_query_wall_sec_values"), None
        )
        name = os.path.basename(path)
        if summary is None:
            print(f"{name}: no summary record in tail")
            continue
        print(
            f"{name}: total={summary.get('value')}s n={summary.get('n_queries')} "
            f"failed={summary.get('n_failed')} "
            f"calib={json.dumps(summary.get('calibration'), separators=(',', ':'))}"
        )
        if values is not None:
            if values.get("order_sha1_12") == fp:
                named = dict(zip(bench.HEADLINE, values["values"]))
                top = sorted(named.items(), key=lambda kv: -kv[1])[:10]
                print(
                    "  top10: "
                    + "  ".join(f"{k}={v}" for k, v in top)
                )
            else:
                print(
                    f"  values record n={values.get('n')} order_sha1_12="
                    f"{values.get('order_sha1_12')} (HEADLINE at this commit: {fp} — "
                    "names not recoverable here, check out the matching commit)"
                )
    return 0


# ----------------------------------------------------------------- main


def main(argv: list[str]) -> int:
    if len(argv) >= 1 and argv[0] == "_solo_worker":
        _solo_worker(argv[1], int(argv[2]))
        return 0

    p = argparse.ArgumentParser(prog="bench_ops", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("solo", help="fresh session per query (B88)")
    sp.add_argument("-r", "--runs", type=int, default=3)
    sp.add_argument("queries", nargs="+")

    ip = sub.add_parser("interleaved", help="one session, round-robin (B84)")
    ip.add_argument("-r", "--runs", type=int, default=3)
    ip.add_argument("queries", nargs="+")

    cp = sub.add_parser("comparable28", help="the frozen r1 anchor set")
    cp.add_argument("-r", "--runs", type=int, default=3)
    cp.add_argument("--solo", action="store_true")

    mp = sub.add_parser("miner-ab", help="shared-miner hash A/B (B87)")
    mp.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")

    kp = sub.add_parser("calib", help="decode BENCH_r*.json calibration")
    kp.add_argument("pattern", nargs="?", default=os.path.join(REPO, "BENCH_r*.json"))

    a = p.parse_args(argv)
    if a.cmd == "solo":
        return cmd_solo(a.queries, a.runs)
    if a.cmd == "interleaved":
        return cmd_interleaved(a.queries, a.runs)
    if a.cmd == "comparable28":
        return cmd_comparable28(a.runs, a.solo)
    if a.cmd == "miner-ab":
        return cmd_miner_ab(a.sf_dir)
    if a.cmd == "calib":
        return cmd_calib(a.pattern)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
