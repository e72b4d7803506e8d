"""Measurement tooling: bench artifact parsing, the regression
tripwire's comparison base, the SCALING↔BENCH cross-check, and the
sf1 gate-section renderer. All driver-side pure functions — no Spark.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from bench import _bench_times, prior_bench  # noqa: E402
from append_gate_sections import gate_section, selfcheck_section  # noqa: E402


# ------------------------------------------------- artifact parsing


def test_bench_times_plain_and_wrapped():
    assert _bench_times({"queries": {"a": 1.0}}) == {"a": 1.0}
    assert _bench_times({"parsed": {"queries": {"b": 2}}}) == {"b": 2.0}


def test_bench_times_truncated_tail():
    # The driver may keep only the TAIL of the JSON line, cut
    # mid-object so the first decodable object is the queries dict.
    tail = '{"q1": 0.5, "q2": 1.5}, "sf": 0.1, "value": 99.0}'
    assert _bench_times({"tail": tail}) == {"q1": 0.5, "q2": 1.5}
    assert _bench_times({"tail": "not json"}) == {}
    assert _bench_times({}) == {}


def test_prior_bench_same_sf_only(tmp_path):
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"sf": 0.1, "queries": {"a": 1.0}})
    )
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"sf": 1.0, "queries": {"a": 9.0}})
    )
    # newest artifact is sf1 — an sf0.1 run must skip it and use r03
    fname, times = prior_bench(str(tmp_path), 0.1)
    assert fname == "BENCH_r03.json" and times == {"a": 1.0}
    # and no comparable prior at an unseen SF
    assert prior_bench(str(tmp_path), 0.01) == (None, {})


def test_prior_bench_prefers_most_recent_round(tmp_path):
    for r, t in [(2, 5.0), (10, 7.0)]:
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(
            json.dumps({"sf": 0.1, "queries": {"a": t}})
        )
    fname, times = prior_bench(str(tmp_path), 0.1)
    assert fname == "BENCH_r10.json" and times == {"a": 7.0}


# --------------------------------------------- SCALING↔BENCH check


def test_crosscheck_flags_only_big_real_gaps(tmp_path):
    import scale_probe

    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps(
            {
                "sf": 0.1,
                "queries": {"noise": 0.30, "real": 1.00, "fine": 2.00},
            }
        )
    )
    lines = scale_probe._bench_crosscheck(
        "/root/testdata/sf0.1",
        # noise: 1.7x but only 0.2s apart -> not flagged
        # real: 3x and 2s apart -> flagged
        # fine: within factor -> not flagged
        {"noise": 0.50, "real": 3.00, "fine": 2.40},
        repo=str(tmp_path),
    )
    text = "\n".join(lines)
    assert "| real | 3.00 | 1.00 | 3.0 |" in text
    assert "| noise |" not in text and "| fine |" not in text


def test_crosscheck_silent_without_comparable_artifact(tmp_path):
    import scale_probe

    assert (
        scale_probe._bench_crosscheck("/x/sf1", {"a": 1.0}, repo=str(tmp_path)) == []
    )


# ------------------------------------------------- gate rendering


def test_gate_section_timeouts_and_ratio():
    bench = {
        "queries": {"a": 6.0, "b": 33.6, "c": 4.3},
        "duckdb_queries": {"a": -1.0, "b": 91.5, "c": 88.6},
    }
    text = gate_section(bench)
    # ratio over measured twins only: 43.9 / 180.1
    assert "**0.244**" in text and "`a`" in text
    assert "Spark total **43.900s**" in text


def test_selfcheck_section_mentions_result():
    text = selfcheck_section("50/50 passed", "/tmp/x.log")
    assert "**50/50 passed**" in text and "/tmp/x.log" in text
