"""A/B probe: repeated orders x lineitem equi-join, raw parquet (shuffles
both sides every query) vs bucketed tables (exchange-free sort-merge).

Usage: python tools/probe_bucketed.py [sf_dir] [num_buckets] [repeats]

Broadcast is disabled for the probe — the point is the fact-fact shape
where neither side fits in memory; at sf0.1 AQE would otherwise broadcast
orders and hide the shuffle being amortized.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    num_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import SparkSession, functions as F

    from tsne_flink_spark.sources.bucketed import co_located_join, write_bucketed

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.warehouse.dir", "/tmp/bucketed_probe_wh")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    def agg(df):
        return df.groupBy("o_orderkey").agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            )
        )

    t0 = time.time()
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets,
                   path="/tmp/bucketed_probe_wh/orders_b")
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", num_buckets,
                   path="/tmp/bucketed_probe_wh/lineitem_b")
    print(f"bucketed write (one-time): {time.time()-t0:.2f}s")

    for label, make in (
        ("raw", lambda: orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])),
        ("bucketed", lambda: co_located_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")),
    ):
        times = []
        for _ in range(repeats):
            t0 = time.time()
            n = agg(make()).count()
            times.append(time.time() - t0)
        plan = make()._jdf.queryExecution().executedPlan().toString()
        ex = plan.count("Exchange")
        med = sorted(times)[len(times) // 2]
        print(
            f"{label}: median {med:.2f}s over {repeats} "
            f"(all {[round(t,2) for t in times]}), {n} groups, "
            f"join-side exchanges in plan: {ex}"
        )


if __name__ == "__main__":
    main()
