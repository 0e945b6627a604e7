"""Round-9 probe: the new fact-fact TPC-H shapes at a replicated lineitem.

waiting_suppliers is the round's heaviest new plan — lineitem JOIN orders
(fact-fact sort-merge), TWO distinct-aggregates per order, and a join-back
of the late lines — and nation_trade_volume is the widest (lineitem JOIN
orders plus four dims).  Replicating lineitem+orders Nx (default 20 ->
12M lineitem rows locally) checks the shapes stay shuffle-bounded with
no straggler as the fact side grows; the order-key distinct-aggregate is
the skew candidate (an order with thousands of lines would hot-key the
groupBy), so one synthetic MEGA-ORDER (5,000 lines, 100 suppliers) is
injected and must neither straggle nor change the qualifying logic.

Usage: python tools/probe_tpch_scale.py [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CEILING_SEC = 300.0


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("probe-tpch-scale")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = "/root/testdata/sf0.1"
    li0 = spark.read.parquet(f"{sf}/lineitem.parquet")
    or0 = spark.read.parquet(f"{sf}/orders.parquet")
    rep = spark.range(replicas).select(F.col("id").alias("__rep"))
    max_ok = or0.agg(F.max("o_orderkey")).first()[0]

    li = li0.crossJoin(rep).select(
        (F.col("l_orderkey") * replicas + F.col("__rep")).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    )
    orders = or0.crossJoin(rep).select(
        (F.col("o_orderkey") * replicas + F.col("__rep")).alias("o_orderkey"),
        "o_custkey",
        "o_orderdate",
    )
    # hot-key stress: one mega-order with 5,000 lines from 100 suppliers,
    # exactly one of them late
    mega_key = (max_ok + 1) * replicas
    mega_li = spark.range(5000).select(
        F.lit(mega_key).alias("l_orderkey"),
        (F.col("id") % 200 + 1).alias("l_partkey"),
        (F.col("id") % 100 + 1).alias("l_suppkey"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(10.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.when(F.col("id") % 100 == 7, F.lit("1999-12-31"))
        .otherwise(F.lit("1996-01-02"))
        .cast("timestamp_ntz")
        .alias("l_shipdate"),
    )
    mega_or = spark.createDataFrame(
        [(mega_key,)], "o_orderkey long"
    ).select(
        "o_orderkey",
        F.lit(1).cast("long").alias("o_custkey"),
        F.lit("1996-01-01").cast("timestamp_ntz").alias("o_orderdate"),
    )
    li = li.unionByName(mega_li).repartition(64)
    orders = orders.unionByName(mega_or)
    n_li = li.count()
    print(f"# lineitem x{replicas} + mega-order: {n_li} rows")

    # --- waiting_suppliers shape (inline copy of the entry plan) ---
    t0 = time.time()
    sup = spark.read.parquet(f"{sf}/supplier.parquet")
    lo = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    ostat = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole = (
        lo.where(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            ostat.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
    )
    waiting = (
        sole.join(sup, F.col("l_suppkey") == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    rows = waiting.collect()
    t_w = time.time() - t0
    print(f"# waiting_suppliers shape: {len(rows)} suppliers in {t_w:.1f}s")
    assert t_w < CEILING_SEC, f"straggler ceiling: {t_w:.1f}s"
    # the mega-order's sole late supplier (suppkey 8) must qualify exactly
    # once for that order
    mega_orders = sole.where(F.col("l_orderkey") == mega_key).collect()
    assert len(mega_orders) == 1 and mega_orders[0]["l_suppkey"] == 8, (
        mega_orders
    )
    print("# mega-order: 1 sole-late supplier found, no straggler")

    # --- nation_trade_volume shape ---
    t0 = time.time()
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    lanes = (
        li.where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp_ntz"),
                F.lit("1998-12-31").cast("timestamp_ntz"),
            )
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("l_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    n_lanes = lanes.count()
    t_n = time.time() - t0
    print(f"# nation_trade_volume shape: {n_lanes} lanes in {t_n:.1f}s")
    assert t_n < CEILING_SEC, f"straggler ceiling: {t_n:.1f}s"

    print("PROBE_OK")
    spark.stop()


if __name__ == "__main__":
    main()
