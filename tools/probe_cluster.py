"""B20 probe (VERDICT r4 #7): validate the far-field summary path on a REAL
multi-executor cluster, not just local mode.

B14/B19 measured the broadcast-volume win (213.5 MB full tree vs 104 KB
summary pyramid at N=1M) and full-gradient wall-time parity *in local mode*,
where a broadcast never crosses a process boundary.  The cluster-scale claim
("strictly better on a multi-executor cluster: 213 MB x n_executors fetched
per iteration vs one 104 KB broadcast + an O(N)-row shuffle") was an
argument, not a measurement.  This probe measures it:

1. launches a standalone master + N workers on localhost (pip pyspark has no
   sbin convenience scripts, so the Master/Worker classes are exec'd via
   bin/spark-class);
2. connects a driver to spark://127.0.0.1:7077 with one executor per worker;
3. runs the FULL gradient (ring-sparse P, k=5 — the B11/B14 workload) at
   N=1M for a few iterations under tree_build='distributed' (full-tree
   broadcast) and 'summary' (pyramid broadcast + halo shuffle);
4. greps each executor's stderr for TorrentBroadcast "Started reading
   broadcast variable ... (estimated total size ...)" lines — the
   per-executor fetched broadcast bytes that local mode cannot show.

Usage:
    python tools/probe_cluster.py [--n 1000000] [--iters 3] [--workers 2]

Prints one JSON line with per-mode iteration wall times and per-executor
broadcast fetch totals.  Solo-run sensitive like every timing probe here.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = None
MASTER_URL = "spark://127.0.0.1:7077"
WORK_BASE = "/tmp/spark-standalone-probe"


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _spawn(cls: str, args: list[str], log: str, worker_dir: str | None = None):
    env = dict(os.environ)
    env["SPARK_HOME"] = SPARK_HOME
    env.setdefault("SPARK_LOG_DIR", WORK_BASE)
    env["SPARK_NO_DAEMONIZE"] = "1"
    if worker_dir:
        env["SPARK_WORKER_DIR"] = worker_dir
    out = open(log, "w")
    return subprocess.Popen(
        [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *args],
        stdout=out,
        stderr=subprocess.STDOUT,
        env=env,
    )


def start_cluster(n_workers: int, cores_each: int, mem_each: str):
    """Master on 7077 + n_workers Workers, each its own work dir (so
    executor stderr can be attributed to a worker)."""
    procs = [
        _spawn(
            "org.apache.spark.deploy.master.Master",
            ["-h", "127.0.0.1", "-p", "7077", "--webui-port", "8090"],
            f"{WORK_BASE}/master.log",
        )
    ]
    time.sleep(5)
    for i in range(n_workers):
        wd = f"{WORK_BASE}/worker-{i}"
        os.makedirs(wd, exist_ok=True)
        procs.append(
            _spawn(
                "org.apache.spark.deploy.worker.Worker",
                [
                    MASTER_URL,
                    "-c",
                    str(cores_each),
                    "-m",
                    mem_each,
                    "--webui-port",
                    str(8091 + i),
                ],
                f"{WORK_BASE}/worker-{i}.log",
                worker_dir=wd,
            )
        )
    time.sleep(5)
    return procs


def ring_p(spark, n: int, k: int = 5):
    """Ring-sparse COO P (the B11 workload): each i links to i+1..i+k mod n,
    v uniform and normalized to sum 1 over the symmetrized bag."""
    from pyspark.sql import functions as F

    base = spark.range(n).select(F.col("id").cast("int").alias("i"))
    offs = spark.createDataFrame([(d,) for d in range(1, k + 1)], "d int")
    edges = base.crossJoin(offs).select(
        "i", ((F.col("i") + F.col("d")) % n).cast("int").alias("j")
    )
    v = 1.0 / (2.0 * n * k)
    sym = edges.union(edges.select(F.col("j").alias("i"), F.col("i").alias("j")))
    return sym.withColumn("v", F.lit(v))


def broadcast_fetches(app_id: str) -> dict:
    """Per-executor TorrentBroadcast fetch totals from worker stderr logs."""
    pat = re.compile(
        r"Started reading broadcast variable (\d+) with \d+ pieces "
        r"\(estimated total size ([\d.]+) (B|KiB|MiB|GiB)\)"
    )
    mult = {"B": 1, "KiB": 1024, "MiB": 1024**2, "GiB": 1024**3}
    out = {}
    for stderr in glob.glob(f"{WORK_BASE}/worker-*/{app_id}/*/stderr"):
        exec_key = "/".join(stderr.split(os.sep)[-4:-1])
        fetched, count = 0.0, 0
        for m in pat.finditer(open(stderr, errors="replace").read()):
            fetched += float(m.group(2)) * mult[m.group(3)]
            count += 1
        out[exec_key] = {"broadcast_fetch_bytes": int(fetched), "fetches": count}
    return out


def main():
    global SPARK_HOME
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cores-each", type=int, default=16)
    ap.add_argument("--mem-each", default="40g")
    args = ap.parse_args()

    SPARK_HOME = _spark_home()
    shutil.rmtree(WORK_BASE, ignore_errors=True)
    os.makedirs(WORK_BASE, exist_ok=True)
    procs = start_cluster(args.workers, args.cores_each, args.mem_each)
    try:
        from pyspark.sql import SparkSession

        from tsne_flink_spark.operators.gradient import gradient

        spark = (
            SparkSession.builder.master(MASTER_URL)
            .appName("probe-cluster")
            .config("spark.executor.cores", str(args.cores_each))
            .config("spark.executor.memory", args.mem_each)
            .config("spark.cores.max", str(args.workers * args.cores_each))
            .config("spark.sql.shuffle.partitions", str(2 * args.workers * args.cores_each))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "16g")
            .config("spark.executorEnv.PYTHONPATH", REPO)
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4050")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        app_id = spark.sparkContext.applicationId
        n_exec = args.workers  # one executor per worker by construction

        rng = np.random.default_rng(42)
        Y = rng.normal(0, 30.0, (args.n, 2))
        Y = Y - Y.mean(axis=0)
        emb = (
            spark.createDataFrame(
                zip(range(args.n), (y.tolist() for y in Y)),
                "id int, y array<double>",
            )
            .repartition(2 * args.workers * args.cores_each)
            .cache()
        )
        emb.count()
        p = ring_p(spark, args.n).cache()
        p.count()

        result = {
            "n": args.n,
            "workers": args.workers,
            "executors": n_exec,
            "app_id": app_id,
            "iter_sec": {},
        }
        for mode in ("distributed", "summary"):
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                grad, _ = gradient(
                    p, emb, theta=0.5, bh_condition="scaled", tree_build=mode
                )
                grad.count()
                ts.append(round(time.time() - t0, 2))
            result["iter_sec"][mode] = ts
            result[f"fetches_after_{mode}"] = broadcast_fetches(app_id)
        spark.stop()
        print(json.dumps(result), flush=True)
    finally:
        for pr in procs:
            pr.terminate()
        time.sleep(2)
        for pr in procs:
            if pr.poll() is None:
                pr.kill()


if __name__ == "__main__":
    main()
