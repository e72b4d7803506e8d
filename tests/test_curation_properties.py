"""Property-based invariants for the curation-tail operators: the
blocked fuzzy join must equal the brute-force edit-distance join on
ANY input (the prefix-filter/short-string/ultra-short split has no
blind spots), and chunking/packing keep their coverage and budget
contracts for arbitrary documents."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from white_elephant_spark.operators.chunking import chunk_documents
from white_elephant_spark.operators.fuzzy import fuzzy_join
from white_elephant_spark.operators.packing import pack_linear

# Tiny alphabet + short lengths concentrate probability mass on the
# adversarial cases: equal strings, one-edit pairs, strings below the
# q-gram completeness bound, and the ultra-short (< d chars) tail.
short_word = st.text(alphabet="ab", min_size=0, max_size=7)


def _edit_distance(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


@settings(max_examples=10, deadline=None)
@given(
    lnames=st.lists(short_word, min_size=1, max_size=6),
    rnames=st.lists(short_word, min_size=1, max_size=6),
    max_dist=st.integers(min_value=1, max_value=2),
)
def test_fuzzy_join_equals_brute_force(spark, lnames, rnames, max_dist):
    left = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lnames)], "lid long, lname string"
    )
    right = spark.createDataFrame(
        [(100 + i, n) for i, n in enumerate(rnames)], "rid long, rname string"
    )
    got = {
        (r.lid, r.rid, r.edit_dist)
        for r in fuzzy_join(left, right, "lname", "rname", max_dist=max_dist, q=2).collect()
    }
    want = {
        (i, 100 + j, _edit_distance(a, b))
        for i, a in enumerate(lnames)
        for j, b in enumerate(rnames)
        if _edit_distance(a, b) <= max_dist
    }
    assert got == want


doc_text = st.lists(
    st.text(alphabet="xyz", min_size=1, max_size=4), min_size=1, max_size=40
).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(doc_text, min_size=1, max_size=5),
    size=st.integers(min_value=2, max_value=12),
    overlap=st.integers(min_value=0, max_value=6),
)
def test_chunking_covers_every_token(spark, texts, size, overlap):
    if overlap >= size:
        overlap = size - 1
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    chunks = chunk_documents(docs, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        rows = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        # every chunk is a contiguous token window of at most `size`
        # tokens, the first starts at token 0, consecutive chunks
        # overlap by at least `overlap` when the doc spans several,
        # and the union covers every token exactly once or more.
        covered: set[int] = set()
        step = size - overlap
        for r in rows:
            ctoks = r["chunk_text"].split(" ") if r["chunk_text"] else [""]
            assert len(ctoks) == r["n_tokens"] <= size
            # locate the window by its known start formula
            start = min(r["chunk_idx"] * step, max(0, len(toks) - size))
            assert ctoks == toks[start : start + size]
            covered.update(range(start, start + len(ctoks)))
        assert covered == set(range(len(toks)))


@settings(max_examples=10, deadline=None)
@given(
    ntoks=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=30),
    budget=st.integers(min_value=8, max_value=64),
    shards=st.integers(min_value=1, max_value=4),
)
def test_packing_offsets_and_bins_consistent(spark, ntoks, budget, shards):
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate(ntoks)], "doc_id long, ntok long"
    )
    packed = pack_linear(docs, "ntok", budget=budget, shards=shards).collect()
    assert len(packed) == len(ntoks)
    by_shard: dict[int, list] = {}
    for r in packed:
        assert 0 <= r["bin_offset"] < budget
        assert r["bin"] >= 0
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["doc_id"] % shards == shard
            # linear-packing law: a doc starts where the running token
            # count left off, in its (cum // budget) bin
            assert r["bin"] == cum // budget
            assert r["bin_offset"] == cum % budget
            cum += r["n_tokens"]
