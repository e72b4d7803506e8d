"""Timezone-aware time-bucketing (W1-W7 in SURVEY.md §2.5).

The reference registers four Java UDFs in HSQLDB —
``roundTimestampTo{Day,Week,Month,Quarter}(timestamp, zoneId)``
(server/src/java/com/linkedin/whiteelephant/TimeZoneConversion.java:23-83,
registered server/app/usage_database.rb:132-168) — plus an implicit
HOURS passthrough (server/app/usage_data.rb:544-547). Week rounding is
``cal.set(Calendar.DAY_OF_WEEK, SUNDAY)`` on a default-locale
``Calendar`` (TimeZoneConversion.java:42): in Sunday-first locales
(the reference's US deployments) that snaps to the *previous* Sunday,
which is the interpretation this engine pins; a Monday-first JVM
locale would have shifted the reference's weeks — a locale dependence,
not a spec.

Spark-first design: each unit is a pure Catalyst expression
composition — ``from_utc_timestamp`` → ``date_trunc`` →
``to_utc_timestamp`` — so bucketing stays inside whole-stage codegen
and survives predicate pushdown. No UDF, no Python in the hot path.

Timestamps are stored hour-aligned UTC (the batch cube truncates in
GMT: analysis/ComputeUsagePerHour.java:340-356); the *query* supplies
the display zone, mirroring the reference where zone is a per-request
parameter, never session state.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UNITS = ("HOURS", "DAYS", "WEEKS", "MONTHS", "QUARTERS")


def _local(ts: Column, zone: str) -> Column:
    return F.from_utc_timestamp(ts, zone)


def _utc(local_ts: Column, zone: str) -> Column:
    return F.to_utc_timestamp(local_ts, zone)


def round_to_hour(ts: Column) -> Column:
    """W5 — hour truncation is zone-independent (every supported zone
    offset is a whole number of minutes; the cube is pre-rounded to GMT
    hours by the batch job, ComputeUsagePerHour.java:340-356)."""
    return F.date_trunc("hour", ts)


def round_to_day(ts: Column, zone: str) -> Column:
    """W1 — local midnight of ``zone`` (TimeZoneConversion.java:23-35)."""
    return _utc(F.date_trunc("day", _local(ts, zone)), zone)


def round_to_sunday_week(ts: Column, zone: str) -> Column:
    """W2 — local **Sunday** 00:00 (TimeZoneConversion.java:37-50).

    ``date_trunc('week')`` is Monday-based, so step back
    ``dayofweek-1`` days from the local day (dayofweek: Sunday=1).
    """
    local_day = F.date_trunc("day", _local(ts, zone))
    sunday = F.date_sub(local_day, F.dayofweek(local_day) - F.lit(1))
    return _utc(sunday.cast("timestamp"), zone)


def round_to_month(ts: Column, zone: str) -> Column:
    """W3 — local first-of-month 00:00 (TimeZoneConversion.java:52-65)."""
    return _utc(F.date_trunc("month", _local(ts, zone)), zone)


def round_to_quarter(ts: Column, zone: str) -> Column:
    """W4 — local quarter start (TimeZoneConversion.java:67-83,
    ``month -= month % 3``)."""
    return _utc(F.date_trunc("quarter", _local(ts, zone)), zone)


def bucket(ts: Column, unit: str, zone: str = "UTC") -> Column:
    """The reference's ``<time-expr>`` dispatch
    (server/app/usage_data.rb:541-558): pick the rounding expression
    for a unit. Returns a UTC timestamp identifying the bucket."""
    unit = unit.upper()
    # Engine sessions are pinned to UTC (session.py), so casting
    # ntz↔ltz is wall-clock-lossless; tz math needs the ltz flavor.
    ts = ts.cast("timestamp")
    if unit == "HOURS":
        out = round_to_hour(ts)
    elif unit == "DAYS":
        out = round_to_day(ts, zone)
    elif unit == "WEEKS":
        out = round_to_sunday_week(ts, zone)
    elif unit == "MONTHS":
        out = round_to_month(ts, zone)
    elif unit == "QUARTERS":
        out = round_to_quarter(ts, zone)
    else:
        raise ValueError(f"unknown unit {unit!r}; expected one of {UNITS}")
    # Buckets are naive-UTC instants, matching the parquet corpus and
    # the DuckDB oracle's TIMESTAMP type.
    return out.cast("timestamp_ntz")


def bucket_sql(ts_expr: str, unit: str, zone: str = "UTC") -> str:
    """DuckDB-SQL rendering of :func:`bucket` with identical
    semantics, used to build oracle queries. Uses ``AT TIME ZONE``
    (session-timezone-independent in DuckDB): naive-UTC → local wall
    is ``(ts AT TIME ZONE 'UTC') AT TIME ZONE zone`` and back is the
    reverse. DuckDB ``dayofweek`` is Sunday=0."""
    unit = unit.upper()
    loc = f"(({ts_expr}) AT TIME ZONE 'UTC') AT TIME ZONE '{zone}'"

    def back(expr: str) -> str:
        return f"((({expr}) AT TIME ZONE '{zone}') AT TIME ZONE 'UTC')"

    if unit == "HOURS":
        return f"date_trunc('hour', {ts_expr})"
    if unit == "DAYS":
        return back(f"date_trunc('day', {loc})")
    if unit == "WEEKS":
        day = f"date_trunc('day', {loc})"
        sunday = f"{day} - to_days(CAST(dayofweek({day}) AS INTEGER))"
        return back(f"CAST(({sunday}) AS TIMESTAMP)")
    if unit == "MONTHS":
        return back(f"date_trunc('month', {loc})")
    if unit == "QUARTERS":
        return back(f"date_trunc('quarter', {loc})")
    raise ValueError(f"unknown unit {unit!r}; expected one of {UNITS}")


# NOTE: a fixed-interval dense_axis used to live here; it stepped UTC
# intervals, which drifts an hour off the zone-aware bucket() values
# across DST transitions. The correct axis generator (sequencing local
# DATEs, then converting each local midnight) is plans/serving.
# dense_axis — the only one anything calls.
