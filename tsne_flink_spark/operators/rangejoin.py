"""Range (interval) join — match point timestamps to [start, end) intervals.

Catalyst executes a raw ``ts BETWEEN start AND end`` predicate as a
broadcast-nested-loop join (all-pairs when neither side is small).  The
scalable formulation buckets time: each point lands in one fixed-width
bucket, each interval explodes into the buckets it overlaps, and the match
becomes an equi-join on (key, bucket) plus the exact range filter.  A
(point, interval) pair can only meet in the point's own bucket, so no
post-join dedup is needed.  Shuffle: O(points + intervals * span/width) —
choose ``bucket_width`` on the order of the typical interval length.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "week": 604800,
    "day": 86400,
    "hour": 3600,
    "minute": 60,
    "second": 1,
}


def _interval_seconds(literal: str) -> int:
    """Parse a SQL interval literal (``'1 day'``, ``'1 hour 30 minutes'``)
    into whole seconds, driver-side.

    Computing the width on the cluster via an epoch-anchored
    ``unix_timestamp(to_timestamp('1970-01-01') + INTERVAL w)`` is wrong in
    non-UTC sessions: the anchor string parses in the session timezone, so
    the width comes out as ``interval - tz_offset`` (zero when the offset
    equals the width, e.g. TZ +01:00 with '1 hour').  Driver-side parsing
    has no timezone dependence.
    """
    total = 0
    matched = False
    for qty, unit in re.findall(r"([+-]?\d+)\s*([a-zA-Z]+)", literal):
        unit = unit.lower().rstrip("s")
        if unit not in _UNIT_SECONDS:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {literal!r}; "
                f"allowed units: {', '.join(_UNIT_SECONDS)} "
                "(sub-second and calendar units are not supported)"
            )
        total += int(qty) * _UNIT_SECONDS[unit]
        matched = True
    if not matched or total <= 0:
        raise ValueError(f"cannot parse positive interval from {literal!r}")
    return total


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | None = None,
    bucket_width: str = "1 day",
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= ts < end`` (and equal ``on`` key when given).

    Output: all point columns + all interval columns.  ``bucket_width`` is
    an interval literal combining the units week/day/hour/minute/second
    (e.g. ``'1 day'``, ``'6 hours'``, ``'1 hour 30 minutes'``), parsed
    driver-side to whole seconds (see ``_interval_seconds``; sub-second and
    calendar units — month, year — are rejected with ``ValueError`` because
    bucketing is fixed-width whole-second arithmetic).
    """
    sec = F.unix_timestamp

    # bucket index = floor(epoch / width); width parsed driver-side so the
    # session timezone can never shift it (see _interval_seconds).
    width_expr = F.lit(_interval_seconds(bucket_width))
    p = points.withColumn(
        "__bucket",
        F.floor(sec(F.col(point_ts).cast("timestamp")) / width_expr),
    )
    iv = intervals.withColumn(
        "__b0", F.floor(sec(F.col(start_ts).cast("timestamp")) / width_expr)
    ).withColumn(
        "__b1", F.floor(sec(F.col(end_ts).cast("timestamp")) / width_expr)
    )
    iv = iv.withColumn(
        "__bucket", F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")

    keys = ["__bucket"] + ([on] if on else [])
    joined = p.join(iv, keys).where(
        (F.col(point_ts).cast("timestamp") >= F.col(start_ts).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") < F.col(end_ts).cast("timestamp"))
    )
    return joined.drop("__bucket")
