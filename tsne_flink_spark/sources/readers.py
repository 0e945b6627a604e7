"""Sources (SURVEY §2.1).

The reference reads 3-column CSV COO matrices (Tsne.scala:138-159); the
engine supports that for parity plus Parquet for the driver's testdata
tables.  COO -> dense vector assembly is the reference's groupBy+VectorBuilder
(Tsne.scala:142-152), expressed here as a map-scatter aggregation that stays
entirely in native expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsne_flink_spark.schemas import COO

_COO_DDL = "i INT, j INT, v DOUBLE"


def read_coo_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read (i, j, value) CSV rows — the universal input format."""
    return spark.read.schema(_COO_DDL).csv(path)


def read_distance_matrix(spark: SparkSession, path: str) -> DataFrame:
    """Precomputed pairwise distances, same physical format
    (Tsne.scala:155-159); feeds pairwise_affinities directly (entry point B).
    """
    return read_coo_csv(spark, path)


def assemble_points(coo: DataFrame, dimension: int) -> DataFrame:
    """COO (i, j, v) -> (id, features ARRAY<DOUBLE>[dimension]).

    Missing cells are zero-filled.  groupBy + map_from_entries + a
    sequence/transform scatter — one shuffle on i, all JVM-side.
    """
    return (
        coo.groupBy(F.col("i").alias("id"))
        .agg(F.map_from_entries(F.collect_list(F.struct("j", "v"))).alias("__m"))
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dimension - 1)),
                lambda k: F.coalesce(F.col("__m")[k], F.lit(0.0)),
            ).alias("features"),
        )
    )


def read_points(spark: SparkSession, path: str, dimension: int) -> DataFrame:
    """CSV COO -> assembled points (the reference's readInput,
    Tsne.scala:138-153)."""
    return assemble_points(read_coo_csv(spark, path), dimension)


def points_from_rows(
    spark: SparkSession, rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """In-memory source for tests (the reference's env.fromCollection)."""
    from tsne_flink_spark.schemas import POINTS

    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows], POINTS
    )


def coo_from_rows(
    spark: SparkSession, rows: list[tuple[int, int, float]]
) -> DataFrame:
    return spark.createDataFrame(
        [(int(i), int(j), float(v)) for i, j, v in rows], COO
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver's testdata parquet tables."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_EVENTS_DDL = (
    "event_id bigint, ts long, user_id bigint, "
    "event_type string, value double, props string"
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, tolerating TIMESTAMP(NANOS) parquet columns.

    Spark's vectorized reader rejects INT64 TIMESTAMP(NANOS); supplying an
    explicit schema that types ``ts`` as LONG reads the raw nanos without
    touching session configuration (the previous approach set
    ``spark.sql.legacy.parquet.nanosAsLong`` session-wide, silently turning
    every later NANOS column in unrelated reads into LONG).  The nanos are
    then truncated to a microsecond timestamp, matching DuckDB's read of the
    same file.
    """
    df = spark.read.schema(_EVENTS_DDL).parquet(f"{sf_dir}/events.parquet")
    return df.withColumn(
        "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
    )
