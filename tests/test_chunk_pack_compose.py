"""Composition: chunk long documents, then pack the chunks to a token
budget — the curation → chunking → packing tail of a training-data
pipeline, end to end on the corpus tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from white_elephant_spark.operators.chunking import chunk_documents
from white_elephant_spark.operators.packing import pack_linear
from white_elephant_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
CHUNK = 64
BUDGET = 256


def test_chunk_then_pack(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, size=CHUNK, overlap=8).select(
        # synthetic stable id per chunk for the packer
        (F.col("id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("n_tokens"),
    )
    n_chunks = chunks.count()
    packed = pack_linear(chunks, "n_tokens", budget=BUDGET, shards=4)
    assert packed.count() == n_chunks  # every chunk lands in a bin
    # Linear-packing contract: a chunk starts inside its bin
    # (bin_offset < budget) and chunks never exceed the chunk size.
    bad = packed.filter(
        (F.col("bin_offset") >= BUDGET) | (F.col("n_tokens") > CHUNK) | (F.col("bin") < 0)
    )
    assert bad.count() == 0
    # Bins actually fill: within each shard, consecutive chunks share
    # bins (fewer bins than chunks by a wide margin).
    n_bins = packed.select("shard", "bin").distinct().count()
    assert n_bins * 2 < n_chunks


def test_pack_linear_is_partition_independent(spark):
    """The packer's docstring contract: exact integer math over a
    (shard, id-ordered) window means ANY partitioning of the input
    produces the identical (shard, bin, bin_offset) per document —
    the property that makes the assignment reproducible across
    cluster sizes and engines. Pin it by packing the same chunk set
    under three adversarial partitionings."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    chunks = chunk_documents(docs, size=CHUNK, overlap=8).select(
        (F.col("id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
        F.col("n_tokens"),
    )
    want = sorted(
        map(tuple, pack_linear(chunks, "n_tokens", budget=BUDGET, shards=4).collect())
    )
    for variant in (
        chunks.repartition(17),
        chunks.repartition(3, "n_tokens"),
        chunks.coalesce(1),
    ):
        got = sorted(
            map(tuple, pack_linear(variant, "n_tokens", budget=BUDGET, shards=4).collect())
        )
        assert got == want
