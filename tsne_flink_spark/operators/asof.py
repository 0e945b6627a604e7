"""As-of (point-in-time) join — a custom operator the reference lacks but a
time-series/training-data engine needs (match each left row with the most
recent right row at or before its timestamp, per key).

Spark has no native ASOF JOIN.  The scalable composition here is the
union-tag + ordered-window formulation:

1. union both sides into one relation tagged ``__side`` (right=0, left=1),
   with the right row's payload packed into ONE nullable struct (atomic —
   carrying columns independently could mix rows when a payload field is
   legitimately NULL);
2. one shuffle: ``Window.partitionBy(key).orderBy(ts, side)`` — right rows
   sort before left rows at equal timestamps, making the match inclusive;
3. ``last(struct, ignoreNulls=True)`` over the unbounded-preceding frame
   carries the latest right row forward onto every left row;
4. filter back to left rows, unpack the struct.

Cost: one shuffle on the key, O(n log n) per partition sort — no range
explosion, no per-key collect, skew-safe under AQE.  This is the standard
large-scale formulation (a sort-merge as-of), vs the naive
``join + filter + window-max`` which materializes every (left, right) pair
with right_ts <= left_ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the greatest
    ``right_ts <= left_ts`` for the same ``on`` key (nulls when none).

    Right rows must be unique per (key, right_ts) — pre-aggregate otherwise
    (ties would be nondeterministic in any as-of engine, DuckDB included).
    Output: all left columns + right's payload columns + ``__matched_ts``
    (the matched right timestamp; right's key column is dropped).
    """
    l_cols = list(left.columns)
    r_types = dict(right.dtypes)
    r_payload = [c for c in right.columns if c not in (on, right_ts)]
    struct_ddl = "struct<__ts:timestamp," + ",".join(
        f"{c}:{r_types[c]}" for c in r_payload
    ) + ">"

    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(struct_ddl).alias("__r"),
    )
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in l_cols],
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__ts"),
            *[F.col(c) for c in r_payload],
        ).alias("__r"),
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "__side",
        *l_cols,
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__m"),
    )
    return carried.where(F.col("__side") == 1).select(
        *l_cols,
        *[F.col("__m")[c].alias(c) for c in r_payload],
        F.col("__m")["__ts"].alias("__matched_ts"),
    )
