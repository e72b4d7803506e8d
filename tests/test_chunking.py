"""Document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from white_elephant_spark.operators.chunking import chunk_documents
from white_elephant_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _mk(spark, n_tokens: int):
    text = " ".join(f"w{i}" for i in range(1, n_tokens + 1))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_short_doc_single_chunk(spark):
    out = chunk_documents(_mk(spark, 5), size=8, overlap=2).collect()
    assert len(out) == 1
    assert out[0]["chunk_text"] == "w1 w2 w3 w4 w5"
    assert out[0]["n_tokens"] == 5 and out[0]["chunk_idx"] == 0


def test_exact_multiple(spark):
    out = sorted(chunk_documents(_mk(spark, 8), size=8, overlap=2).collect())
    assert len(out) == 1 and out[0]["n_tokens"] == 8


def test_windows_cover_and_overlap(spark):
    out = {r["chunk_idx"]: r for r in chunk_documents(_mk(spark, 20), size=8, overlap=2).collect()}
    # step = 6; starts 1, 7, 13 (end-aligned to 20-8+1=13)
    assert len(out) == 3
    assert out[0]["chunk_text"].split()[0] == "w1"
    assert out[1]["chunk_text"].split()[0] == "w7"
    assert out[2]["chunk_text"].split()[0] == "w13"
    assert all(r["n_tokens"] == 8 for r in out.values())
    # coverage: union of windows is every token
    seen = set()
    for r in out.values():
        seen.update(r["chunk_text"].split())
    assert seen == {f"w{i}" for i in range(1, 21)}
    # consecutive overlap >= 2
    assert set(out[0]["chunk_text"].split()) & set(out[1]["chunk_text"].split()) == {"w7", "w8"}


def test_end_aligned_final_window(spark):
    out = sorted(
        chunk_documents(_mk(spark, 10), size=8, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # step 6; last_start = 3 -> starts [1, 3]; both full-width
    assert [r["chunk_text"].split()[0] for r in out] == ["w1", "w3"]
    assert all(r["n_tokens"] == 8 for r in out)


def test_invalid_overlap_rejected(spark):
    with pytest.raises(ValueError):
        chunk_documents(_mk(spark, 10), size=8, overlap=8)


def test_corpus_coverage_properties(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, size=64, overlap=8)
    from pyspark.sql import functions as F

    stats = chunks.groupBy("id").agg(
        F.max("n_tokens").alias("mx"), F.count(F.lit(1)).alias("nc")
    )
    assert stats.filter(F.col("mx") > 64).count() == 0
    assert chunks.count() >= docs.count()  # every non-empty doc chunked
