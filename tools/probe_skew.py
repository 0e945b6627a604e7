"""Skew-hardening probe for the LSH band joins (round-2 task #8).

Builds a corpus where 10% of all rows are copies of ONE document — they
share every MinHash band bucket, so the band self-join has a single hot key
producing |hot|^2 candidate pairs.  Runs the candidate join with AQE
skew-join enabled and disabled, and reports per-task duration quantiles of
the heaviest stage from the Spark REST API, plus wall time and whether the
executed plan shows skew-split markers.

    python tools/probe_skew.py [n_docs] [hot_fraction]

One JSON line per configuration.  Evidence target: with skew handling on,
no straggler task > 4x the median task of its stage.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import SparkSession


def task_quantiles(ui_port: int) -> dict:
    """Max/median task duration of the heaviest completed stage."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete"))
    heaviest = max(stages, key=lambda s: s.get("executorRunTime", 0))
    sid, att = heaviest["stageId"], heaviest["attemptId"]
    summ = json.load(urllib.request.urlopen(
        f"{base}/{app_id}/stages/{sid}/{att}/taskSummary?quantiles=0.5,0.95,1.0"
    ))
    dur = summ["executorRunTime"]
    return {
        "stage": sid,
        "tasks": heaviest["numCompleteTasks"],
        "task_ms_median": dur[0],
        "task_ms_p95": dur[1],
        "task_ms_max": dur[2],
        "straggler_ratio": round(dur[2] / max(dur[0], 1.0), 2),
    }


def run_once(skew_join: bool, n_docs: int, hot_frac: float, port: int) -> dict:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"probe-skew-{skew_join}")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
        # hot-key splitting needs a shuffle join (at 100 TB the band tables
        # never broadcast); and a low skewedPartitionThreshold so the probe's
        # MB-scale hot partition trips the same logic a TB-scale one would
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from tsne_flink_spark.pipeline.dedup import (
        _auto_bands,
        _lsh_candidate_pairs,
        _spread,
        minhash_signatures_table,
        shingles,
    )

    rng = np.random.default_rng(9)
    n_hot = int(n_docs * hot_frac)
    hot_text = "the same boilerplate paragraph repeated verbatim across the corpus"
    words = [f"w{i:04d}" for i in range(2000)]
    rows = [(i, hot_text) for i in range(n_hot)] + [
        (n_hot + i, " ".join(rng.choice(words, 12))) for i in range(n_docs - n_hot)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    num_hashes, threshold = 64, 0.8
    bands = _auto_bands(num_hashes, threshold)
    with_sh = _spread(docs, F.col("doc_id")).select(
        "doc_id", shingles(F.col("text"), 3).alias("__sh")
    )
    signed = minhash_signatures_table(with_sh, "doc_id", num_hashes, 42, spread=False)
    cands = _lsh_candidate_pairs(signed, "doc_id", bands, num_hashes // bands)

    t0 = time.time()
    n_pairs = cands.count()
    wall = round(time.time() - t0, 1)
    plan = cands._jdf.queryExecution().executedPlan().toString()
    out = {
        "skew_join": skew_join,
        "n_docs": n_docs,
        "hot": n_hot,
        "pairs": n_pairs,
        "wall_sec": wall,
        "plan_skew_markers": plan.count("isSkew=true") + plan.count("skew=true"),
    }
    try:
        out.update(task_quantiles(port))
    except Exception as e:  # REST shape differences shouldn't kill the probe
        out["task_quantiles_error"] = str(e)
    spark.stop()
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    for skew_join, port in ((False, 4047), (True, 4048)):
        print(json.dumps(run_once(skew_join, n_docs, hot_frac, port)), flush=True)


if __name__ == "__main__":
    main()
