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


def _ref_write_stats(s, e, cpu, sp, sh):
    """Literal rendering of the documented reference loop semantics
    (ComputeUsagePerHour.java:270-338 writeStats, per SURVEY §4):
    walk hour buckets while currentTime < end; prorate cpu/spilled by
    overlap fraction with a per-bucket (long) cast on spilled; repeat
    shuffle bytes unprorated; inclusive boundary tests for
    started/finished. Returns [(bucket_ms, started, finished,
    elapsed_ms, cpu_ms_floored, spilled, shuffle)]."""
    out = []
    cur = s
    while cur < e:
        bucket = (cur // HOUR) * HOUR
        nxt = min(bucket + HOUR, e)
        pct = (nxt - cur) / (e - s)
        started = 1 if (bucket + HOUR >= s and s >= bucket) else 0
        finished = 1 if (bucket + HOUR >= e and e >= bucket) else 0
        out.append(
            (
                bucket,
                started,
                finished,
                nxt - cur,
                int(pct * cpu),
                int(pct * sp),
                sh,
            )
        )
        cur = nxt
    return out


# Boundary-heavy timings: mix arbitrary ms with exactly-hour-aligned
# start/end values — the quirk cases (end on a boundary books
# `finished` into the PRECEDING hour; the boundary bucket itself is
# never emitted) only occur at alignment, which uniform ms sampling
# essentially never hits.
_time = st.one_of(
    st.integers(min_value=1, max_value=90 * 24 * HOUR),
    st.integers(min_value=1, max_value=90 * 24).map(lambda h: h * HOUR),
)
aligned_attempt = st.tuples(
    _time,
    st.one_of(
        st.integers(min_value=1, max_value=30 * HOUR),
        st.integers(min_value=1, max_value=30).map(lambda h: h * HOUR),
    ),
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=0, max_value=10**6),
    st.integers(min_value=0, max_value=10**9),
)


@settings(max_examples=10, deadline=None)
@given(st.lists(aligned_attempt, min_size=1, max_size=12))
def test_explode_matches_reference_loop_per_bucket(spark, atts):
    # Row-for-row differential: the declarative explode must equal the
    # reference's imperative walk on every bucket — values, flags, and
    # which bucket carries them.
    got = (
        usage.explode_attempt_hours(_df(spark, atts))
        .select(
            "user",
            "time",
            "started",
            "finished",
            "elapsedMs",
            "cpuMsProrated",
            "spilledRecords",
            "reduceShuffleBytes",
        )
        .collect()
    )
    from datetime import datetime, timezone

    def _ms(dt):  # naive NTZ datetime -> epoch ms (UTC semantics)
        return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)

    by_user = {}
    for r in got:
        by_user.setdefault(r["user"], []).append(
            (
                _ms(r["time"]),
                r["started"],
                r["finished"],
                r["elapsedMs"],
                r["cpuMsProrated"],
                r["spilledRecords"],
                r["reduceShuffleBytes"],
            )
        )
    for i, (s, d, cpu, sp, sh) in enumerate(atts):
        want = _ref_write_stats(s, s + d, cpu, sp, sh)
        assert sorted(by_user.get(f"u{i}", [])) == sorted(want)


def test_zero_duration_attempt_emits_nothing(spark):
    df = _df(spark, [(HOUR, 0, 5, 5, 5)])
    assert usage.explode_attempt_hours(df).count() == 0


def test_shuffle_bytes_repeat_not_prorated(spark):
    # 2.5-hour attempt touching 3 buckets: each repeats the counter.
    df = _df(spark, [(30 * 60000, 150 * 60000, 0, 0, 777)])
    rows = usage.explode_attempt_hours(df).select("reduceShuffleBytes").collect()
    assert [r[0] for r in rows] == [777, 777, 777]
