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

_DOCUMENTS_DDL = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a documents corpus from JSON Lines — the interchange format
    LLM-corpus tooling actually ships (one JSON object per line; gzip/zstd
    per Spark's codec support, splittable when uncompressed).

    The schema is EXPLICIT (default: the driver's documents layout):
    schema inference would scan the corpus once just to guess types — at
    100 TB that is a full extra pass, and a single malformed line can
    flip a column to string corpus-wide.  Malformed lines surface in the
    standard ``_corrupt_record`` column (PERMISSIVE mode) rather than
    failing the job; filter or count them as a quality gate.  Caveat:
    Spark refuses a query whose PRUNED column set is only the internal
    corrupt-record column — cache the frame (or reference data columns in
    the same query) before counting corrupt lines.
    """
    ddl = schema if schema is not None else (
        _DOCUMENTS_DDL + ", _corrupt_record string"
    )
    return spark.read.schema(ddl).json(path)


def _parquet_ts_unit(path: str, column: str = "ts") -> tuple[str | None, str | None]:
    """Read the timestamp unit and timezone of ``column`` from the parquet
    footer.

    Returns ``(unit, tz)`` where ``unit`` is ``'ns' | 'us' | 'ms' | 's'`` for
    timestamp-typed columns (``None`` when the column is stored as a plain
    integer with no logical timestamp annotation) and ``tz`` is the column's
    timezone string for instant-semantics columns (parquet
    ``isAdjustedToUTC=true``; pyarrow surfaces it as ``type.tz``) or ``None``
    for wall-clock (NTZ) columns.  Footer-only: no row groups are read, so
    this is O(1) regardless of table size and safe to call per-query at
    100 TB.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            glob.glob(os.path.join(path, "*.parquet"))
            or glob.glob(os.path.join(path, "part-*"))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet files under {path}")
        path = parts[0]
    field_type = pq.ParquetFile(path).schema_arrow.field(column).type
    return getattr(field_type, "unit", None), getattr(field_type, "tz", None)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table, tolerating any parquet timestamp encoding.

    The ``ts`` column's unit is detected from the parquet footer (cheap,
    footer-only) rather than assumed:

    - TIMESTAMP(MICROS/MILLIS/SECONDS): plain ``spark.read.parquet`` — Spark
      decodes these natively and the vectorized reader stays on.
    - TIMESTAMP(NANOS): Spark's vectorized reader rejects INT64
      TIMESTAMP(NANOS), so an explicit schema typing ``ts`` as LONG reads the
      raw nanos (without touching session configuration — the earlier
      approach of setting ``spark.sql.legacy.parquet.nanosAsLong``
      session-wide silently retyped every later NANOS column in unrelated
      reads), then truncates to a microsecond timestamp, matching DuckDB's
      read of the same file.
    - Plain INT64 with no timestamp annotation: treated as epoch nanoseconds
      (the only un-annotated encoding the driver has ever produced).
    """
    path = f"{sf_dir}/events.parquet"
    unit, tz = _parquet_ts_unit(path)
    if unit in ("us", "ms", "s"):
        if tz is not None:
            # isAdjustedToUTC=true: the stored micros are real instants and
            # Spark decodes them as a classic TIMESTAMP directly — relabeling
            # here would shift every instant by the session offset.
            return spark.read.parquet(path)
        # Parquet timestamps without isAdjustedToUTC surface as
        # TIMESTAMP_NTZ; downstream operators (sessionize's epoch-seconds
        # lag, the as-of join) expect the classic TIMESTAMP type.  The
        # stored wall clock must be interpreted as UTC — a bare cast (and
        # even to_utc_timestamp on NTZ) goes through the SESSION timezone
        # and would decode instants shifted by the session offset relative
        # to the raw-nanos branch below (which is tz-independent epoch
        # arithmetic).  convert_timezone re-labels the wall clock from UTC
        # into the session zone BEFORE the cast, cancelling the shift;
        # verified identical across all four encodings under a non-UTC
        # session in tests/test_sources.py.
        return spark.read.parquet(path).withColumn(
            "ts",
            F.expr(
                "cast(convert_timezone('UTC', current_timezone(), ts) "
                "as timestamp)"
            ),
        )
    df = spark.read.schema(_EVENTS_DDL).parquet(path)
    return df.withColumn(
        "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
    )


def read_corpus(
    spark: SparkSession, path: str, fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame:
    """Format-dispatching corpus source, the read twin of
    ``writers.write_corpus``: parquet / orc with their embedded schemas,
    jsonl with an explicit one (see read_documents_jsonl for why
    inference is banned at corpus scale)."""
    if fmt == "jsonl":
        return read_documents_jsonl(spark, path, schema=schema)
    if fmt not in ("parquet", "orc"):
        raise ValueError(f"unknown corpus format {fmt!r}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format(fmt).load(path)
