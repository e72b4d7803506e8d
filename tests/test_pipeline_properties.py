"""Property-based invariants for the training-pipeline operators:
whatever the corpus, the derived scores stay inside their contracts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from white_elephant_spark.operators import contamination, relevance, similarity

word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
doc = st.lists(word, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(doc, min_size=2, max_size=10))
def test_contamination_fraction_bounds(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    ev = docs.filter(F.col("doc_id") % 2 == 0)
    out = contamination.ngram_contamination(docs, ev, n=2).collect()
    for r in out:
        assert 0.0 <= r.contam_frac <= 1.0
        if r.doc_id % 2 == 0:
            # eval docs fully overlap themselves
            assert r.contam_frac == 1.0


@settings(max_examples=10, deadline=None)
@given(st.lists(doc, min_size=1, max_size=10))
def test_surprisal_bounds_and_mean(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r.doc_id: r.surprisal for r in relevance.unigram_surprisal(docs).collect()}
    # inverse-probability scores: every doc ≥ 1 (a token can't be more
    # frequent than the corpus), and the token-weighted mean over the
    # corpus equals the vocabulary size (Σ_w c(w)·N/c(w) / N = |V|)
    assert all(s >= 1.0 - 1e-9 for s in out.values())
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w")).distinct().count()
    )
    idx = relevance.term_index(docs)
    lens = {r.doc_id: r.dl for r in idx.groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()}
    n = sum(lens.values())
    weighted = sum(out[d] * lens[d] for d in out) / n
    # per-doc sums are DECIMAL(27,4)-routed, so the identity holds to
    # the 1e-4 quantum times the doc count, not machine epsilon
    assert abs(weighted - vocab) < 1e-3 * vocab + 1e-3


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-4.0, max_value=4.0, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    ).filter(lambda vs: any(any(abs(x) > 1e-3 for x in v) for v in vs))
)
def test_sq8_quantization_bounds(spark, vecs):
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    out = (
        df.crossJoin(F.broadcast(similarity.sq8_scale(df)))
        .select(similarity.sq8_quantize("embedding", 3).alias("q"))
        .collect()
    )
    flat = [x for r in out for x in r.q]
    # symmetric int8 range, and the max-|component| row hits ±127
    assert all(-127 <= x <= 127 for x in flat)
    assert max(abs(x) for x in flat) == 127
