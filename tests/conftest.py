import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("tsne_flink_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        # unknown-size relations default to Long.MaxValue; deep iterative
        # plans then produce astronomically large BigInt size estimates that
        # grind Catalyst's stats visitor — cap to something sane
        .config("spark.sql.defaultSizeInBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()
