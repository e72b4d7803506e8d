"""Roster gate: the driver records at most 50 correctness rows, so
registry enumeration order is load-bearing (r9: the 51st query,
scd2_user_segments, silently lost its driver row). These tests pin
the explicit order and the round-close diff tool that names any
query without a row."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roster_check import artifact_rows, diff, latest_artifact, row_green  # noqa: E402
from white_elephant_spark.plans.registry import ENUMERATION_ORDER, all_queries  # noqa: E402

DRIVER_ROSTER_CAP = 50


def test_enumeration_order_is_exactly_the_registry():
    # Adding a query without placing it in ENUMERATION_ORDER is red:
    # an unplaced query lands AFTER the designated overflow tail and
    # could silently push a §2 query past the driver's 50-row cap.
    names = list(all_queries())
    assert names == list(ENUMERATION_ORDER)
    assert len(set(ENUMERATION_ORDER)) == len(ENUMERATION_ORDER)


def test_overflow_queries_enumerate_past_the_cap_only():
    # Everything inside the first 50 positions gets a driver row;
    # designated overflow (beyond-reference extensions with committed
    # selfcheck stand-ins) sits strictly after. scd2_user_segments is
    # the only overflow entry today.
    names = list(all_queries())
    overflow = names[DRIVER_ROSTER_CAP:]
    assert overflow == ["scd2_user_segments"]


def test_row_green_semantics():
    assert row_green({"err": None, "rows_match": True, "schema_match": True, "hash_match": True})
    assert not row_green({"err": "boom", "rows_match": True})
    assert not row_green({"err": None, "rows_match": True, "hash_match": False})
    # rows-only driver check: absent axes are not failures
    assert row_green({"err": None, "rows_match": True})


def test_diff_names_missing_and_unknown():
    rows = {
        "a": {"err": None, "rows_match": True, "hash_match": True},
        "b": {"err": "x"},
        "zombie": {"err": None, "rows_match": True},
    }
    green, red, missing, unknown = diff(["a", "b", "c"], rows)
    assert green == ["a"] and red == ["b"] and missing == ["c"]
    assert unknown == ["zombie"]


def test_latest_artifact_and_rows(tmp_path):
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"a": {"err": None}}))
    (tmp_path / "CORRECTNESS_r10.json").write_text(
        json.dumps({"b": {"err": None, "rows_match": True}, "meta": "not-a-row"})
    )
    p = latest_artifact(str(tmp_path))
    assert p is not None and p.endswith("CORRECTNESS_r10.json")
    rows = artifact_rows(p)
    assert list(rows) == ["b"]  # non-row values filtered


def test_live_artifact_gap_is_named_overflow_only():
    # Against the committed artifact of record: every query the driver
    # dropped must be a designated overflow entry — never a §2 query.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = latest_artifact(repo)
    if p is None:
        return  # fresh checkout without driver artifacts
    names = list(all_queries())
    _green, red, missing, _unknown = diff(names, artifact_rows(p))
    assert red == []
    overflow = set(names[DRIVER_ROSTER_CAP:])
    assert set(missing) <= overflow, (
        f"non-overflow queries missing driver rows: {sorted(set(missing) - overflow)}"
    )
