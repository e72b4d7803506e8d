"""Golden-semantics tests for the temporal operators (as-of join,
interval join, sessionization) on constructed inputs."""

from __future__ import annotations

from datetime import datetime

import pytest

from white_elephant_spark.operators import temporal

T = datetime


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0, 0), 100.0),
            (1, T(2024, 1, 1, 12, 0, 0), 110.0),
            (2, T(2024, 1, 1, 11, 0, 0), 50.0),
        ],
        "key long, qts timestamp_ntz, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 0, 0)),   # before any quote -> null
            (1, T(2024, 1, 1, 10, 0, 0)),  # equal ts -> inclusive match
            (1, T(2024, 1, 1, 11, 59, 59)),
            (1, T(2024, 1, 1, 13, 0, 0)),
            (2, T(2024, 1, 1, 23, 0, 0)),
            (3, T(2024, 1, 1, 10, 0, 0)),  # key with no quotes
        ],
        "key long, tts timestamp_ntz",
    )


def test_asof_backward(quotes, trades):
    out = temporal.asof_join(
        trades, quotes, key="key", left_time="tts", right_time="qts"
    ).collect()
    got = {(r.key, r.tts): r.px for r in out}
    assert got[(1, T(2024, 1, 1, 9, 0, 0))] is None
    assert got[(1, T(2024, 1, 1, 10, 0, 0))] == 100.0  # inclusive
    assert got[(1, T(2024, 1, 1, 11, 59, 59))] == 100.0
    assert got[(1, T(2024, 1, 1, 13, 0, 0))] == 110.0
    assert got[(2, T(2024, 1, 1, 23, 0, 0))] == 50.0
    assert got[(3, T(2024, 1, 1, 10, 0, 0))] is None
    assert len(out) == 6  # every left row survives


def test_asof_forward(quotes, trades):
    out = temporal.asof_join(
        trades, quotes, key="key", left_time="tts", right_time="qts",
        direction="forward",
    ).collect()
    got = {(r.key, r.tts): r.px for r in out}
    assert got[(1, T(2024, 1, 1, 9, 0, 0))] == 100.0
    assert got[(1, T(2024, 1, 1, 10, 0, 0))] == 100.0  # inclusive
    assert got[(1, T(2024, 1, 1, 13, 0, 0))] is None
    assert got[(2, T(2024, 1, 1, 23, 0, 0))] is None


def test_interval_join_bounds(spark):
    wins = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 0, 0), T(2024, 1, 3, 0, 0, 0))],
        "ws timestamp_ntz, we timestamp_ntz",
    )
    facts = spark.createDataFrame(
        [
            (1, T(2023, 12, 31, 23, 59, 59)),  # just before
            (2, T(2024, 1, 1, 0, 0, 0)),       # start inclusive
            (3, T(2024, 1, 2, 12, 0, 0)),      # inside
            (4, T(2024, 1, 3, 0, 0, 0)),       # end exclusive
        ],
        "fid long, fts timestamp_ntz",
    )
    out = temporal.interval_join(
        facts, wins, fact_time="fts", win_start="ws", win_end="we"
    )
    assert sorted(r.fid for r in out.collect()) == [2, 3]


def test_interval_join_coarse_and_fine_buckets_lose_nothing(spark):
    # Regression: facts used to be truncated to the DAY regardless of
    # `bucket`, so any coarser bucket dropped pairs whose fact day fell
    # between window-sequence steps. The epoch grid must be lossless at
    # every width.
    wins = spark.createDataFrame(
        [(T(2024, 1, 1, 0, 0, 0), T(2024, 1, 4, 0, 0, 0))],
        "ws timestamp_ntz, we timestamp_ntz",
    )
    facts = spark.createDataFrame(
        [(1, T(2024, 1, 2, 12, 0, 0)), (2, T(2024, 1, 3, 6, 0, 0))],
        "fid long, fts timestamp_ntz",
    )
    for bucket in ("2 days", "1 week", "6 hours", "90 minutes"):
        got = sorted(
            r.fid
            for r in temporal.interval_join(
                facts, wins, "fts", "ws", "we", bucket=bucket
            ).collect()
        )
        assert got == [1, 2], bucket
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucket"):
        temporal.interval_join(facts, wins, "fts", "ws", "we", bucket="1 month")


def test_asof_null_times_never_match(spark):
    # DuckDB ASOF contract: l.t >= NULL is never true. A right row
    # with a NULL time must not become anyone's match (it used to sort
    # first under asc_nulls_first and match EVERY backward row), and a
    # left row with a NULL time keeps a NULL attach in both directions.
    quotes = spark.createDataFrame(
        [(1, None, 666.0), (1, T(2024, 1, 1, 10, 0, 0), 100.0)],
        "key long, qts timestamp_ntz, px double",
    )
    trades = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 0, 0)), (1, T(2024, 1, 1, 11, 0, 0)), (1, None)],
        "key long, tts timestamp_ntz",
    )
    back = {
        (r.key, r.tts): r.px
        for r in temporal.asof_join(trades, quotes, "key", "tts", "qts").collect()
    }
    assert back[(1, T(2024, 1, 1, 9, 0, 0))] is None  # not 666.0
    assert back[(1, T(2024, 1, 1, 11, 0, 0))] == 100.0
    assert back[(1, None)] is None
    fwd = {
        (r.key, r.tts): r.px
        for r in temporal.asof_join(
            trades, quotes, "key", "tts", "qts", direction="forward"
        ).collect()
    }
    assert fwd[(1, T(2024, 1, 1, 9, 0, 0))] == 100.0
    assert fwd[(1, T(2024, 1, 1, 11, 0, 0))] is None
    assert fwd[(1, None)] is None


def test_sessionize_gap_cut(spark):
    ev = spark.createDataFrame(
        [
            (7, T(2024, 1, 1, 0, 0, 0), 1),
            (7, T(2024, 1, 1, 0, 29, 0), 2),   # within gap
            (7, T(2024, 1, 1, 0, 59, 0), 3),   # exactly 30 min -> same session
            (7, T(2024, 1, 1, 1, 29, 1), 4),   # 30min 1s -> new session
            (8, T(2024, 1, 1, 0, 0, 0), 5),    # other user independent
        ],
        "user_id long, ts timestamp_ntz, event_id long",
    )
    out = temporal.sessionize(ev, gap_minutes=30, tiebreak="event_id").collect()
    seq = {r.event_id: r.session_seq for r in out}
    assert seq == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_scd2_segments_runs_and_validity(spark):
    ev = spark.createDataFrame(
        [
            (1, T(2024, 1, 1), "a"),
            (1, T(2024, 1, 2), "a"),   # same run
            (1, T(2024, 1, 3), "b"),   # change
            (1, T(2024, 1, 4), "a"),   # back to a -> NEW segment, not merged
            (2, T(2024, 1, 1), "x"),
        ],
        "user_id long, ts timestamp_ntz, event_type string",
    )
    out = temporal.scd2_segments(ev).collect()
    u1 = sorted(
        [r for r in out if r.key == 1], key=lambda r: r.valid_from
    )
    assert [(r.state, r.n_events, r.is_current) for r in u1] == [
        ("a", 2, False), ("b", 1, False), ("a", 1, True)
    ]
    # half-open chaining: each valid_to equals the next valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from and u1[2].valid_to is None
    u2 = [r for r in out if r.key == 2]
    assert len(u2) == 1 and u2[0].is_current


def test_asof_forward_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1), 10), (1, T(2024, 2, 1), 11)],
        "k long, t timestamp_ntz, payload long",
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 3), 5.0)], "k long, rt timestamp_ntz, state double"
    )
    out = temporal.asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        direction="forward", tolerance_ms=5 * 86_400_000,
    ).collect()
    by = {r.payload: r for r in out}
    assert by[10].state == 5.0          # 2 days ahead, inside tolerance
    assert by[11].state is None         # next match is in the past -> none
    assert len(out) == 2                # left rows all preserved


def test_asof_both_matches_two_single_direction_joins(quotes, trades):
    # The fused both-directions pass (one exchange, two sorts) must
    # agree with the two single-direction joins on every row —
    # inclusive ties, before-any-state nulls, keys with no right rows.
    both = temporal.asof_join_both(
        trades, quotes, key="key", left_time="tts", right_time="qts"
    ).collect()
    back = {
        (r.key, r.tts): r.px
        for r in temporal.asof_join(
            trades, quotes, key="key", left_time="tts", right_time="qts"
        ).collect()
    }
    fwd = {
        (r.key, r.tts): r.px
        for r in temporal.asof_join(
            trades, quotes, key="key", left_time="tts", right_time="qts",
            direction="forward",
        ).collect()
    }
    assert len(both) == 6
    for r in both:
        assert r.px == back[(r.key, r.tts)], (r.key, r.tts)
        assert r.fwd_px == fwd[(r.key, r.tts)], (r.key, r.tts)


def test_asof_both_tolerances(quotes, trades):
    # Per-direction tolerances null out far matches independently.
    both = {
        (r.key, r.tts): (r.px, r.fwd_px)
        for r in temporal.asof_join_both(
            trades, quotes, key="key", left_time="tts", right_time="qts",
            backward_tolerance_ms=3_600_000,      # 1h back
            forward_tolerance_ms=3_600_000,       # 1h fwd
        ).collect()
    }
    # 13:00 trade: backward quote at 12:00 is within 1h, kept
    assert both[(1, T(2024, 1, 1, 13, 0, 0))] == (110.0, None)
    # 09:00 trade: forward quote at 10:00 within 1h
    assert both[(1, T(2024, 1, 1, 9, 0, 0))] == (None, 100.0)
    # 23:00 trade (key 2): backward quote at 11:00 is 12h away -> null
    assert both[(2, T(2024, 1, 1, 23, 0, 0))] == (None, None)


def test_asof_both_null_times(spark):
    # NULL right times are dropped from state; NULL left times attach
    # nothing in either direction but survive.
    left = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0, 0)), (1, None)], "key long, tts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, T(2024, 1, 1, 9, 0, 0), 1.0), (1, None, 99.0)],
        "key long, qts timestamp_ntz, px double",
    )
    rows = {
        r.tts: (r.px, r.fwd_px)
        for r in temporal.asof_join_both(
            left, right, key="key", left_time="tts", right_time="qts"
        ).collect()
    }
    assert rows[T(2024, 1, 1, 10, 0, 0)] == (1.0, None)
    assert rows[None] == (None, None)
