"""Exact-substring span removal (operators/spans.py)."""

from __future__ import annotations

import pytest

from white_elephant_spark.operators.spans import remove_repeated_spans

SHARED = "the quick brown fox jumps over the lazy"  # 8 tokens


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, f"intro one {SHARED} outro one"),
        (2, f"different opening here {SHARED} and a different close"),
        (3, "entirely unique content with no shared spans at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_owner_keeps_span_others_lose_it(corpus):
    out = {r["id"]: r for r in remove_repeated_spans(corpus, n=8).collect()}
    # doc 1 (min id) owns the span and keeps everything
    assert out[1]["text"] == f"intro one {SHARED} outro one"
    assert out[1]["n_removed"] == 0
    # doc 2 loses exactly the 8 shared tokens, keeps its own words
    assert SHARED.split()[0] not in out[2]["text"].split() or "quick" not in out[2]["text"]
    assert out[2]["text"] == "different opening here and a different close"
    assert out[2]["n_removed"] == 8
    # doc 3 untouched
    assert out[3]["text"] == "entirely unique content with no shared spans at all"
    assert out[3]["n_removed"] == 0


def test_overlapping_shared_region_removed_once(spark):
    # Two docs share a 10-token run -> three overlapping 8-grams in
    # doc 2; covered positions must union, not double-remove.
    run = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"p q {run} r")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in remove_repeated_spans(df, n=8).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == "p q r"
    assert out[2]["n_removed"] == 10


def test_idempotent(corpus):
    once = remove_repeated_spans(corpus, n=8).select("id", "text")
    twice = remove_repeated_spans(
        once.withColumnRenamed("id", "doc_id"), n=8
    ).select("id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_short_docs_pass_through(spark):
    df = spark.createDataFrame([(1, "too short"), (2, "too short")], "doc_id long, text string")
    out = {r["id"]: r for r in remove_repeated_spans(df, n=8).collect()}
    # both below gram length: nothing repeated at n=8, nothing removed
    assert out[1]["text"] == "too short" and out[2]["text"] == "too short"
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0
