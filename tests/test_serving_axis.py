"""serving.dense_axis edge rules (usage_data.rb:291-440): interior
buckets for DAYS/MONTHS, shrink-a-week for WEEKS, the asymmetric
QUARTERS rule, raw hour floors for HOURS."""

from __future__ import annotations

from datetime import datetime, timezone

from white_elephant_spark.plans import serving


def _ms(*args) -> int:
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


def _axis(spark, unit, zone, s, e):
    return [r["bucket"] for r in serving.dense_axis(spark, unit, zone, s, e).collect()]


def test_hours_floor_inclusive(spark):
    got = _axis(spark, "HOURS", "UTC", _ms(2024, 5, 1, 10, 30), _ms(2024, 5, 1, 12, 5))
    assert got == [datetime(2024, 5, 1, 10), datetime(2024, 5, 1, 11), datetime(2024, 5, 1, 12)]


def test_days_interior_only(spark):
    # [05-01 06:00, 05-04 20:00] UTC → interior days 05-02, 05-03 only
    got = _axis(spark, "DAYS", "UTC", _ms(2024, 5, 1, 6), _ms(2024, 5, 4, 20))
    assert got == [datetime(2024, 5, 2), datetime(2024, 5, 3)]


def test_weeks_shrunk_one_per_side(spark):
    # Sundays at 2024-05-05 and 2024-05-26 → axis 05-12, 05-19
    got = _axis(spark, "WEEKS", "UTC", _ms(2024, 5, 7), _ms(2024, 5, 28))
    assert got == [datetime(2024, 5, 12), datetime(2024, 5, 19)]


def test_months_interior_only(spark):
    got = _axis(spark, "MONTHS", "UTC", _ms(2024, 1, 15), _ms(2024, 4, 10))
    assert got == [datetime(2024, 2, 1), datetime(2024, 3, 1)]


def test_quarters_asymmetric(spark):
    # start rounds DOWN to its quarter (not advanced); end shrinks one
    # quarter: [2024-02-10, 2024-11-20] → Q1, Q2, Q3 starts.
    got = _axis(spark, "QUARTERS", "UTC", _ms(2024, 2, 10), _ms(2024, 11, 20))
    assert got == [datetime(2024, 1, 1), datetime(2024, 4, 1), datetime(2024, 7, 1)]


def test_days_la_uses_local_calendar(spark):
    # 2024-05-01 05:00 UTC is still 04-30 in LA; 05-04 20:00 UTC is
    # 05-04 13:00 LA → interior local days 05-01..05-03, each rendered
    # as LA-midnight in UTC (07:00).
    got = _axis(spark, "DAYS", "America/Los_Angeles", _ms(2024, 5, 1, 5), _ms(2024, 5, 4, 20))
    assert got == [
        datetime(2024, 5, 1, 7),
        datetime(2024, 5, 2, 7),
        datetime(2024, 5, 3, 7),
    ]


def test_queries_self_heal_non_utc_default_session(spark):
    """The external driver runs queries on a VANILLA session whose
    default timezone is the machine's — the engine's naive-UTC
    timestamp math must not depend on it. Every query path resets the
    session to UTC via ensure_engine_confs (load_table), so a session
    that starts in Asia/Tokyo must produce bit-identical results to a
    UTC one. Pins the contract end-to-end on the most tz-sensitive
    registered query (tz-parameterized week/quarter rollups) plus a
    serving query (clamped dense axis + local-date rendering)."""
    from white_elephant_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.001"
    qs = all_queries()
    for name in ("rollup_time_units_tz", "usage_csv_table_days"):
        fn = qs[name].fn
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = sorted(map(tuple, fn(spark, sf).collect()))
        # A caller-mangled session: the query must self-heal.
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        try:
            got = sorted(map(tuple, fn(spark, sf).collect()))
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        assert got == want, name
