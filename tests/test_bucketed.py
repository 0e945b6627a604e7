"""Storage-bucketing tests: the co-located join must plan with ZERO
Exchange operators and produce exactly the same rows as the shuffled
join of the raw tables."""

import pytest
from pyspark.sql import functions as F

from tsne_flink_spark.sources.bucketed import co_located_join, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 8, path=str(base / "orders_b"),
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "lineitem_b", "l_orderkey", 8, path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the join to actually be a sort-merge join: a broadcast would
    # trivially have no shuffle and prove nothing about bucketing
    with_conf = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.enabled", "false"),
    ]
    old = {k: spark.conf.get(k) for k, _ in with_conf}
    try:
        for k, v in with_conf:
            spark.conf.set(k, v)
        joined = co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_bucketed_join_matches_shuffled_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        co_located_join(spark, lt, rt, "o_orderkey", "l_orderkey")
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    want = (
        orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )
    g = {(r["o_orderkey"], r["n"], r["rev"]) for r in got.collect()}
    w = {(r["o_orderkey"], r["n"], r["rev"]) for r in want.collect()}
    assert g == w and g


def test_bucket_pruning_scans_one_bucket(spark, bucketed_tables):
    lt, _ = bucketed_tables
    any_key = spark.table(lt).select("o_orderkey").head()["o_orderkey"]
    # filter-only scans fall under the autoBucketedScan heuristic (Spark
    # reads a bucketed table as plain files when no operator needs the
    # distribution); disable it to exercise the pruning path
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        pruned = spark.table(lt).where(F.col("o_orderkey") == any_key)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # the scan reports "SelectedBucketsCount: 1 out of 8"
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert pruned.count() >= 1
    finally:
        spark.conf.set(conf, old)


def test_write_zordered_roundtrip_and_clustering(spark, tmp_path):
    """Z-ordered write preserves rows and actually clusters: with a
    Hilbert key over (a, b), each output file's min/max span on BOTH
    columns is far below the global span (the data-skipping property)."""
    import glob

    import pyarrow.parquet as pq

    from tsne_flink_spark.sources.layout import write_zordered

    from pyspark.sql import functions as F

    n = 20_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 141).alias("a"),
        ((F.col("id") * 7) % 213).alias("b"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == n
    assert {r["id"] for r in back.select("id").collect()} == set(range(n))

    spans_a, spans_b = [], []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = pq.ParquetFile(f).schema_arrow.names
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(names.index("a")).statistics
            sb = md.row_group(rg).column(names.index("b")).statistics
            spans_a.append(sa.max - sa.min)
            spans_b.append(sb.max - sb.min)
    # every file is tight on both dimensions vs the 141/213 global spans
    assert sum(spans_a) / len(spans_a) < 141 * 0.6
    assert sum(spans_b) / len(spans_b) < 213 * 0.6
