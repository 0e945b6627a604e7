"""Round-10 probe: customer_rfm quartiles at x20 customers — distributed
rank vs the retired global-ntile-window formulation.

customer_rfm was the one round-9 plan with a serial stage: three
unpartitioned ntile(4) windows, each a single-task sort of the whole
per-customer table.  The replanned query routes each metric through the
engine's JVM-side distributed rank (operators/knn._global_rank_by,
BASELINE B15) plus exact ntile-from-rank arithmetic.  This probe
replicates the orders table Nx (default 20 -> ~300k distinct customers
locally), runs BOTH formulations on the same per-customer rollup, checks
the segment matrices are IDENTICAL, and times them — the window
formulation's cost concentrates on one task as N grows, the rank
formulation's does not.

Usage: python tools/probe_rfm_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

CEILING_SEC = 300.0


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-rfm-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsne_flink_spark.operators.knn import _global_rank_by
    from tsne_flink_spark.operators.optimize import materialize

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.1"
    or0 = spark.read.parquet(f"{sf}/orders.parquet")
    max_ck = or0.agg(F.max("o_custkey")).first()[0]
    rep = spark.range(replicas).select(F.col("id").alias("__rep"))
    orders = or0.crossJoin(rep).select(
        (F.col("o_custkey") + F.col("__rep") * (max_ck + 1)).alias("o_custkey"),
        "o_orderdate",
        "o_totalprice",
    )
    per_cust = materialize(
        orders.groupBy("o_custkey").agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    n = per_cust.count()
    print(f"# per-customer rows at x{replicas}: {n}")

    def segments_windows():
        rfm = per_cust.select(
            "o_custkey",
            F.ntile(4)
            .over(Window.orderBy(F.col("last_order").desc(), "o_custkey"))
            .alias("r_quartile"),
            F.ntile(4)
            .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
            .alias("f_quartile"),
            F.ntile(4)
            .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
            .alias("m_quartile"),
            "monetary",
        )
        return rfm.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )

    def segments_rank():
        def quartile(metric, out):
            ranked = _global_rank_by(
                per_cust.select("o_custkey", metric),
                F.col(metric).desc(),
                "o_custkey",
            )
            return ranked.select(
                "o_custkey",
                entrymod._ntile_from_rank(F.col("__rank"), n).alias(out),
            )

        rfm = (
            quartile("last_order", "r_quartile")
            .join(quartile("frequency", "f_quartile"), "o_custkey")
            .join(quartile("monetary", "m_quartile"), "o_custkey")
            .join(per_cust.select("o_custkey", "monetary"), "o_custkey")
        )
        return rfm.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )

    def timed(tag, fn):
        t0 = time.time()
        rows = {
            (r["r_quartile"], r["f_quartile"], r["m_quartile"]): (
                r["n_customers"],
                r["avg_monetary"],
            )
            for r in fn().collect()
        }
        dt = round(time.time() - t0, 1)
        print(f"# {tag}: {dt}s, {len(rows)} segments")
        assert dt < CEILING_SEC, f"{tag} exceeded {CEILING_SEC}s: {dt}"
        return rows, dt

    rank_rows, rank_dt = timed("distributed-rank", segments_rank)
    win_rows, win_dt = timed("global-windows", segments_windows)
    assert rank_rows == win_rows, "segment matrices differ"
    print(
        f"PROBE OK x{replicas}: identical {len(rank_rows)}-segment matrix; "
        f"rank {rank_dt}s vs windows {win_dt}s"
    )


if __name__ == "__main__":
    main()
