"""Table profiling: per-column null/distinct/min/max/mean statistics —
the data-quality snapshot every ingestion pipeline runs before training.

One aggregation over the table computes every column's statistics
simultaneously (Catalyst plans the multi-``count(distinct)`` with a single
EXPAND + two-stage aggregate — one scan, one bounded shuffle whose row
count is ``n_cols x n_rows`` pre-combine, partial-aggregated map-side);
the wide 1-row result is then unpivoted driver-side into one row per
column with ``stack``.  No Python UDFs.

Numeric min/max/mean are emitted as DOUBLE and string min/max as separate
VARCHAR fields — casting doubles to display strings is engine-specific
(shortest-round-trip vs %g formats) and would break exact oracle parity.
Timestamps and dates profile as wall-clock strings (timezone-independent
in both engines, unlike epoch arithmetic on NTZ columns).

Scale note: exact ``count(distinct)`` is the right default at TPC-H-ish
cardinalities; at 100 TB swap in the HLL sketch path
(``__spark_entry__.q_sketch_distinct_check`` shows the verified-invariant
pattern for approximate distinct counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num, mean_num,
    min_str, max_str) for every requested column.

    Numeric (and timestamp, as epoch seconds) columns fill the ``_num``
    fields; string columns fill the ``_str`` fields; the inapplicable
    family is NULL.  ``n_distinct`` is exact and excludes NULLs (the
    ANSI ``count(distinct)`` convention in both Spark and DuckDB).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = fields[c]
        col = F.col(c)
        # timestamps/dates profile as wall-clock STRINGS: an epoch-seconds
        # representation goes through the session timezone for NTZ columns
        # (see sources/readers.load_events) and would break oracle parity
        # in non-UTC sessions; the string cast is timezone-independent and
        # formats identically in Spark and DuckDB
        num = col.cast("double") if isinstance(dt, _NUMERIC) else None
        aggs.append(
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nul_{c}")
        )
        aggs.append(F.count_distinct(col).alias(f"__dst_{c}"))
        if num is not None:
            aggs.append(F.min(num).alias(f"__min_{c}"))
            aggs.append(F.max(num).alias(f"__max_{c}"))
            aggs.append(F.round(F.avg(num), 6).alias(f"__avg_{c}"))
        else:
            aggs.append(F.min(col.cast("string")).alias(f"__mns_{c}"))
            aggs.append(F.max(col.cast("string")).alias(f"__mxs_{c}"))
    wide = df.agg(*aggs)

    def null_d() -> str:
        return "CAST(NULL AS DOUBLE)"

    def null_s() -> str:
        return "CAST(NULL AS STRING)"

    rows = []
    for c in cols:
        dt = fields[c]
        numeric = isinstance(dt, _NUMERIC)
        rows.append(
            "("
            + ", ".join(
                [
                    f"'{c}'",
                    "__n",
                    f"`__nul_{c}`",
                    f"`__dst_{c}`",
                    f"`__min_{c}`" if numeric else null_d(),
                    f"`__max_{c}`" if numeric else null_d(),
                    f"`__avg_{c}`" if numeric else null_d(),
                    null_s() if numeric else f"`__mns_{c}`",
                    null_s() if numeric else f"`__mxs_{c}`",
                ]
            )
            + ")"
        )
    stack = (
        f"stack({len(cols)}, "
        + ", ".join(r[1:-1] for r in rows)
        + ") AS (column, n_rows, n_nulls, n_distinct, "
        + "min_num, max_num, mean_num, min_str, max_str)"
    )
    return wide.select(F.expr(stack)).select(
        "column",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_num", "max_num", "mean_num", "min_str", "max_str",
    )
