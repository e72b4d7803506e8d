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
