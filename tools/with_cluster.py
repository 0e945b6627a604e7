"""Run any repo command against a throwaway localhost standalone cluster.

Usage:
    python tools/with_cluster.py [--workers 2] [--cores-each 16]
        [--mem-each 40g] -- <command ...>

Starts a standalone master (spark://127.0.0.1:7077) plus N workers (the
Master/Worker classes via bin/spark-class — pip pyspark ships no sbin
scripts), exports SPARK_GRAFT_MASTER for the child command, runs it, and
tears the cluster down.  Used for the multi-executor validation runs:

    python tools/with_cluster.py -- python tools/check_oracles.py /root/testdata/sf0.01
    python tools/with_cluster.py -- python bench.py
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

MASTER_URL = "spark://127.0.0.1:7077"
WORK_BASE = "/tmp/spark-standalone-gate"


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cores-each", type=int, default=16)
    ap.add_argument("--mem-each", default="40g")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (append: -- <command ...>)")

    spark_home = _spark_home()
    shutil.rmtree(WORK_BASE, ignore_errors=True)
    os.makedirs(WORK_BASE, exist_ok=True)

    def spawn(cls: str, cls_args: list[str], log: str, worker_dir=None):
        env = dict(os.environ)
        env["SPARK_HOME"] = spark_home
        env["SPARK_LOG_DIR"] = WORK_BASE
        env["SPARK_NO_DAEMONIZE"] = "1"
        if worker_dir:
            env["SPARK_WORKER_DIR"] = worker_dir
        return subprocess.Popen(
            [os.path.join(spark_home, "bin", "spark-class"), cls, *cls_args],
            stdout=open(log, "w"),
            stderr=subprocess.STDOUT,
            env=env,
        )

    procs = [
        spawn(
            "org.apache.spark.deploy.master.Master",
            ["-h", "127.0.0.1", "-p", "7077", "--webui-port", "8090"],
            f"{WORK_BASE}/master.log",
        )
    ]
    time.sleep(5)
    for i in range(args.workers):
        wd = f"{WORK_BASE}/worker-{i}"
        os.makedirs(wd, exist_ok=True)
        procs.append(
            spawn(
                "org.apache.spark.deploy.worker.Worker",
                [
                    MASTER_URL,
                    "-c",
                    str(args.cores_each),
                    "-m",
                    args.mem_each,
                    "--webui-port",
                    str(8091 + i),
                ],
                f"{WORK_BASE}/worker-{i}.log",
                worker_dir=wd,
            )
        )
    time.sleep(5)
    try:
        env = dict(os.environ)
        env["SPARK_GRAFT_MASTER"] = MASTER_URL
        env.setdefault(
            "SPARK_GRAFT_CPUS", str(args.workers * args.cores_each)
        )
        return subprocess.call(cmd, env=env)
    finally:
        for pr in procs:
            pr.terminate()
        time.sleep(2)
        for pr in procs:
            if pr.poll() is None:
                pr.kill()


if __name__ == "__main__":
    sys.exit(main())
