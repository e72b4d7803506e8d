"""Property-based invariants for the A1 hour explode (SURVEY §5.3):
whatever the attempt timing, the bucketized measures must re-total to
the attempt-level facts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from white_elephant_spark.operators import usage

HOUR = 3_600_000

attempt = st.tuples(
    st.integers(min_value=1, max_value=90 * 24 * HOUR),  # startTime
    st.integers(min_value=1, max_value=30 * HOUR),  # duration ms
    st.integers(min_value=0, max_value=10**9),  # cpu ms
    st.integers(min_value=0, max_value=10**6),  # spilled
    st.integers(min_value=0, max_value=10**9),  # shuffle bytes
)


def _df(spark, atts):
    rows = [
        (
            f"a{i}", f"u{i}", "c1", "MAP", "SUCCESS", False, s, s + d,
            {"CPU_MILLISECONDS": cpu, "SPILLED_RECORDS": sp, "REDUCE_SHUFFLE_BYTES": sh},
        )
        for i, (s, d, cpu, sp, sh) in enumerate(atts)
    ]
    return spark.createDataFrame(
        rows,
        "taskAttemptId string, user string, cluster string, type string,"
        " taskStatus string, excess boolean, startTime long, finishTime long,"
        " counters map<string,long>",
    )


@settings(max_examples=12, deadline=None)
@given(st.lists(attempt, min_size=1, max_size=25))
def test_explode_invariants(spark, atts):
    exploded = usage.explode_attempt_hours(_df(spark, atts))
    per = (
        exploded.groupBy("user")
        .agg(
            F.sum("elapsedMs").alias("ms"),
            F.sum("started").alias("st"),
            F.sum("finished").alias("fi"),
            F.sum("cpuMsProrated").alias("cpu"),
            F.sum("spilledRecords").alias("sp"),
            F.count("*").alias("nb"),
        )
        .collect()
    )
    by_id = {r["user"]: r for r in per}
    assert len(by_id) == len(atts)
    for i, (s, d, cpu, sp, sh) in enumerate(atts):
        r = by_id[f"u{i}"]
        # bucket overlaps re-total to the attempt duration, exactly
        assert r["ms"] == d
        # the attempt starts once and finishes once
        assert r["st"] == 1 and r["fi"] == 1
        # bucket count is the hour span
        assert r["nb"] == (s + d - 1) // HOUR - s // HOUR + 1
        # per-bucket floored proration never exceeds the counter and
        # loses at most 1 per bucket
        assert r["cpu"] <= cpu and r["cpu"] >= cpu - r["nb"]
        assert r["sp"] <= sp and r["sp"] >= sp - r["nb"]


def test_zero_duration_attempt_emits_nothing(spark):
    df = _df(spark, [(HOUR, 0, 5, 5, 5)])
    assert usage.explode_attempt_hours(df).count() == 0


def test_shuffle_bytes_repeat_not_prorated(spark):
    # 2.5-hour attempt touching 3 buckets: each repeats the counter.
    df = _df(spark, [(30 * 60000, 150 * 60000, 0, 0, 777)])
    rows = usage.explode_attempt_hours(df).select("reduceShuffleBytes").collect()
    assert [r[0] for r in rows] == [777, 777, 777]
