"""Ordered funnel (operators/funnel.py): hand-verified micro-case plus
a DuckDB oracle cross-check on the events corpus."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from white_elephant_spark.operators.funnel import funnel_report, funnel_times

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture()
def tiny(spark):
    rows = [
        # u1 completes view -> click -> purchase in order
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "purchase", 30),
        # u2 clicks before viewing: click must not count; re-click later
        ("u2", "click", 5), ("u2", "view", 10), ("u2", "purchase", 15),
        # u3 stops after view
        ("u3", "view", 40), ("u3", "purchase", 35),  # purchase BEFORE view: no
        # u4 never views
        ("u4", "click", 1), ("u4", "purchase", 2),
    ]
    return spark.createDataFrame(rows, "user_id string, event_type string, ts long")


def test_funnel_times_order_semantics(tiny):
    times = {
        r["user"]: r
        for r in funnel_times(
            tiny,
            [F.col("event_type") == s for s in ("view", "click", "purchase")],
        ).collect()
    }
    assert set(times) == {"u1", "u2", "u3"}  # u4 never entered
    assert (times["u1"]["t1"], times["u1"]["t2"], times["u1"]["t3"]) == (10, 20, 30)
    # u2: click at 5 precedes view(10) -> not counted; no later click
    assert times["u2"]["t2"] is None and times["u2"]["t3"] is None
    # u3: purchase(35) precedes view(40) -> funnel stops at step 1
    assert times["u3"]["t2"] is None


def test_funnel_report_shape(tiny):
    rep = funnel_report(
        tiny,
        {s: F.col("event_type") == s for s in ("view", "click", "purchase")},
    ).collect()
    assert [r["users"] for r in rep] == [3, 1, 1]
    assert rep[0]["pct_of_first"] == 1.0
    assert rep[1]["pct_of_prev"] == pytest.approx(1 / 3)


def test_funnel_max_span(tiny):
    times = {
        r["user"]: r
        for r in funnel_times(
            tiny,
            [F.col("event_type") == s for s in ("view", "click")],
            max_span=F.lit(5),
        ).collect()
    }
    # u1's click at 20 is 10 past t1=10 -> outside the 5-tick horizon
    assert times["u1"]["t2"] is None


def test_cohort_retention(spark):
    from white_elephant_spark.operators.funnel import cohort_retention

    # Two weekly cohorts; u1/u2 join week 0 (u2 churns), u3 joins week 1.
    w = 7 * 86400
    rows = [
        ("u1", 0), ("u1", w), ("u1", 2 * w),
        ("u2", 3600),
        ("u3", w + 60), ("u3", 2 * w + 60),
    ]
    ev = spark.createDataFrame(rows, "user_id string, e long").select(
        "user_id", F.timestamp_seconds(F.col("e") + 4 * 86400).alias("ts")
    )  # +4d aligns epoch (Thursday) to the Monday week boundary
    got = {
        (r["cohort"].isoformat(), r["period_offset"]): (r["active_users"], r["retention"])
        for r in cohort_retention(ev, unit="week").collect()
    }
    cohorts = sorted({c for c, _ in got})
    c0, c1 = cohorts[0], cohorts[1]
    assert got[(c0, 0)] == (2, 1.0)
    assert got[(c0, 1)][0] == 1 and got[(c0, 1)][1] == pytest.approx(0.5)
    assert got[(c0, 2)][0] == 1
    assert got[(c1, 0)] == (1, 1.0)
    assert got[(c1, 1)] == (1, 1.0)


def test_funnel_matches_duckdb_oracle(spark):
    from white_elephant_spark.sources.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts")
    )
    got = sorted(
        (r["user"], r["t1"], r["t2"], r["t3"])
        for r in funnel_times(
            ev,
            [F.col("event_type") == s for s in ("view", "click", "purchase")],
        ).collect()
    )
    exp = sorted(
        duckdb.sql(
            f"""
            WITH e AS (SELECT user_id, event_type,
                              CAST(epoch_us(ts) AS BIGINT) AS ts
                       FROM '{SF_EVENTS}'),
            s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
            s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
                   WHERE e.event_type='click' AND e.ts >= s1.t1 GROUP BY 1),
            s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
                   WHERE e.event_type='purchase' AND e.ts >= s2.t2 GROUP BY 1)
            SELECT s1.user_id, s1.t1, s2.t2, s3.t3
            FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
            """
        ).fetchall()
    )
    assert got == exp
