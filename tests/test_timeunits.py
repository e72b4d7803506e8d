"""Golden tests for W1-W7 timezone bucketing, including DST
transitions — the reference's highest-risk semantics (SURVEY.md §7.4:
java.util.Calendar DST handling in ComputeUsagePerHour.java:347-355,
TimeZoneConversion.java:23-83)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from white_elephant_spark.functions import timeunits as tu

LA = "America/Los_Angeles"
IST = "Asia/Kolkata"


def _bucket_one(spark, ts: str, unit: str, zone: str) -> datetime:
    df = spark.createDataFrame([(ts,)], "ts string").select(
        tu.bucket(F.col("ts").cast("timestamp_ntz"), unit, zone).alias("b")
    )
    return df.collect()[0]["b"]


def test_hour_passthrough(spark):
    assert _bucket_one(spark, "2024-05-01 13:45:12", "HOURS", "UTC") == datetime(2024, 5, 1, 13)


def test_day_la(spark):
    # 2024-05-02 03:00 UTC is 2024-05-01 20:00 PDT → local midnight 05-01 = 07:00 UTC
    assert _bucket_one(spark, "2024-05-02 03:00:00", "DAYS", LA) == datetime(2024, 5, 1, 7)


def test_day_la_dst_spring_forward(spark):
    # 2024-03-10: PST→PDT at 02:00 local. 2024-03-10 23:00 UTC = 16:00 PDT;
    # local midnight 03-10 was still PST (UTC-8) → 08:00 UTC.
    assert _bucket_one(spark, "2024-03-10 23:00:00", "DAYS", LA) == datetime(2024, 3, 10, 8)


def test_day_kolkata_half_hour_offset(spark):
    # 2024-05-01 20:00 UTC = 2024-05-02 01:30 IST → local midnight 05-02
    # = 2024-05-01 18:30 UTC.
    assert _bucket_one(spark, "2024-05-01 20:00:00", "DAYS", IST) == datetime(2024, 5, 1, 18, 30)


def test_week_is_sunday_based(spark):
    # 2024-05-08 is a Wednesday; Sunday of that week is 2024-05-05.
    assert _bucket_one(spark, "2024-05-08 12:00:00", "WEEKS", "UTC") == datetime(2024, 5, 5)
    # A Sunday maps to itself.
    assert _bucket_one(spark, "2024-05-05 00:00:00", "WEEKS", "UTC") == datetime(2024, 5, 5)


def test_week_la_crossing_dst(spark):
    # Week containing the 2024-03-10 spring-forward: Sunday 03-10 local
    # midnight was PST → 08:00 UTC, even queried from a PDT instant.
    assert _bucket_one(spark, "2024-03-13 12:00:00", "WEEKS", LA) == datetime(2024, 3, 10, 8)


def test_month_quarter(spark):
    assert _bucket_one(spark, "2024-05-31 23:59:59", "MONTHS", "UTC") == datetime(2024, 5, 1)
    assert _bucket_one(spark, "2024-05-31 23:59:59", "QUARTERS", "UTC") == datetime(2024, 4, 1)
    # Quarter start in LA: Q2 local midnight 04-01 PDT = 07:00 UTC.
    assert _bucket_one(spark, "2024-05-15 12:00:00", "QUARTERS", LA) == datetime(2024, 4, 1, 7)


def test_bucket_sql_matches_spark(spark):
    """Cross-engine parity: DuckDB rendering of every unit/zone equals
    the Spark expression on a grid of instants spanning DST changes."""
    import duckdb

    instants = [
        "2024-03-10 09:30:00",
        "2024-03-10 10:30:00",
        "2024-11-03 08:30:00",
        "2024-11-03 09:30:00",
        "2024-01-01 00:00:00",
        "2024-12-31 23:59:59",
        "2024-07-04 17:45:00",
    ]
    con = duckdb.connect()
    for unit in tu.UNITS:
        for zone in ("UTC", LA, IST):
            got_spark = [
                _bucket_one(spark, ts, unit, zone) for ts in instants
            ]
            got_duck = [
                con.execute(
                    "SELECT " + tu.bucket_sql(f"TIMESTAMP '{ts}'", unit, zone)
                ).fetchone()[0]
                for ts in instants
            ]
            assert got_spark == got_duck, (unit, zone)


def test_day_la_dst_fall_back(spark):
    # 2024-11-03: PDT→PST at 02:00 local (25-hour civil day).
    # 2024-11-04 06:00 UTC = 2024-11-03 22:00 PST — still 11-03 local;
    # local midnight 11-03 was PDT (UTC-7) → 07:00 UTC.
    assert _bucket_one(spark, "2024-11-04 06:00:00", "DAYS", LA) == datetime(2024, 11, 3, 7)
    # First instant of 11-04 local: midnight is PST (UTC-8) → 08:00 UTC.
    assert _bucket_one(spark, "2024-11-04 08:30:00", "DAYS", LA) == datetime(2024, 11, 4, 8)


def test_week_la_dst_fall_back(spark):
    # Sunday 2024-11-03 is the transition day itself; any time that
    # week rounds to Sunday 00:00 PDT = 07:00 UTC (midnight precedes
    # the 02:00 fall-back, so it's still PDT).
    assert _bucket_one(spark, "2024-11-06 12:00:00", "WEEKS", LA) == datetime(2024, 11, 3, 7)
