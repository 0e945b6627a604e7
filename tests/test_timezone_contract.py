"""Session-timezone independence of the gate-facing query surface.

Two timestamp regimes coexist in the driver tables (ADVICE r8 finding):

- ``lineitem.l_shipdate`` is read plain and surfaces as TIMESTAMP_NTZ —
  bare ``date_format`` is already session-independent, and a
  ``convert_timezone(current_timezone(), 'UTC', ...)`` relabel would shift
  midnight walls to the PREVIOUS DAY under zones east of UTC, flipping
  month buckets and filters.
- ``events.ts`` passes through ``load_events``, which normalizes it to
  UTC-based instants (classic TIMESTAMP), so columns derived from it
  (window bounds, session bounds) render in the SESSION zone under bare
  formatting and need ``_utc_wall``'s convert-to-UTC relabel.

These tests pin both: every timestamp-formatting query must produce
byte-identical rows under UTC and Asia/Kolkata (+05:30, east — the
direction that breaks the NTZ case) sessions.
"""

import sys

import pytest

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"

TZ_SENSITIVE = [
    "promo_revenue_monthly",
    "revenue_pivot",
    "windowed_event_counts",
    "sessionize",
    "sliding_user_activity",
    "user_cohorts",
    "event_cube",
    "user_peak_event",
    "event_funnel",
]


def _rows(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF)
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_query_is_session_timezone_independent(spark, name):
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_rows = _rows(spark, name)
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        east_rows = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc_rows == east_rows, (
        f"{name}: rows differ between UTC and Asia/Kolkata sessions; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(utc_rows, east_rows) if a != b)}"
    )


def test_ntz_month_bucket_does_not_shift_east(spark):
    """The concrete ADVICE regression: a convert_timezone relabel on the
    NTZ l_shipdate shifts every midnight wall to the previous day under
    an eastern session; the bare date_format the queries now use must
    keep the stored date."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    li = entry._t(spark, SF, "lineitem")
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        assert dict(li.dtypes)["l_shipdate"] == "timestamp_ntz"
        n_shift = (
            li.select(
                (
                    F.date_format("l_shipdate", "yyyy-MM-dd")
                    != F.date_format(
                        F.expr(
                            "convert_timezone(current_timezone(), 'UTC',"
                            " l_shipdate)"
                        ),
                        "yyyy-MM-dd",
                    )
                ).alias("shifted")
            )
            .where("shifted")
            .count()
        )
        # the relabel shifts EVERY midnight-wall row east of UTC — the
        # bug class the queries must avoid (they use bare date_format)
        assert n_shift == li.count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
