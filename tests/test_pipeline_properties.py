"""Property-based invariants for the training-pipeline operators:
whatever the corpus, the derived scores stay inside their contracts —
plus the adversarial log-parser fuzz (mangled/truncated/interleaved
lines drop, never raise; ParseJobsFromLogs.java:205-262,622-669)."""

from __future__ import annotations

import random
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from white_elephant_spark.operators import (
    contamination,
    parse,
    reconstruct,
    relevance,
    similarity,
)

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


# ------------------------------------------- adversarial parser fuzz
#
# The reference's parser contract is drop-don't-error
# (ParseJobsFromLogs.java:205-262 classify-or-skip, 622-669 partial
# fragments): on a 100 TB raw-log corpus every malformation occurs, so
# beyond the planted poison lines of the golden tests, randomized
# truncation/mangling/duplication/interleaving must (a) never raise
# and (b) leave the surviving jobs exactly equal to the clean-subset
# result.


def _clean_corpus(n_jobs: int, n_tasks: int, n_atts: int) -> list[str]:
    """Conflict-free fixture lines: one job line per job, one task
    line per task, one attempt line per attempt (so the golden result
    is order-independent by construction)."""
    lines = []
    for j in range(n_jobs):
        lines.append(
            f'Job JOBID="job_7_{j}" USER="u{j}" JOB_STATUS="SUCCESS" '
            f'SUBMIT_TIME="100" FINISH_TIME="9000" TOTAL_MAPS="{n_tasks}" '
            'FAILED_MAPS="0" .'
        )
        for t in range(n_tasks):
            tid = f"task_7_{j}_m_{t}"
            lines.append(
                f'Task TASKID="{tid}" TASK_TYPE="MAP" TASK_STATUS="SUCCESS" '
                f'START_TIME="{200 + t}" FINISH_TIME="{8000 + t}" .'
            )
            for k in range(n_atts):
                status = "SUCCESS" if k == 0 else "FAILED"
                lines.append(
                    f'MapAttempt TASK_TYPE="MAP" TASKID="{tid}" '
                    f'TASK_ATTEMPT_ID="attempt_7_{j}_m_{t}_{k}" '
                    f'TASK_STATUS="{status}" START_TIME="{300 + 10 * k}" '
                    f'FINISH_TIME="{700 + 10 * k}" '
                    'COUNTERS="[(CPU_MILLISECONDS)(c)(60000)]" .'
                )
    return lines


def _mangle(line: str, cut: float) -> str:
    """Truncate at a relative position, break the leading keyword's
    case, and destroy every digit — provably unclassifiable: the
    ^-anchored Job/MapAttempt/Task regexes miss the lowercased head,
    and the USER=-plus-job_\\d+_\\d+ fallback misses without digits."""
    s = line[: max(1, int(len(line) * cut))]
    return re.sub(r"\d", "x", s[0].lower() + s[1:])


def _nested_rows(spark, lines: list[str]):
    df = _lines(spark, lines)
    jobs = reconstruct.merge_job_fragments(parse.parse_job_lines(df))
    tasks = reconstruct.merge_task_fragments(parse.parse_task_lines(df))
    atts = reconstruct.reconstruct_attempts(parse.parse_attempt_lines(df))
    return sorted(
        map(str, reconstruct.to_nested_jobs(jobs, tasks, atts).collect())
    )


def _lines(spark, rows):
    from white_elephant_spark.sources.catalog import ensure_engine_confs

    ensure_engine_confs(spark)
    return spark.createDataFrame(
        [(i + 1, line) for i, line in enumerate(rows)], "seq int, line string"
    )


# digit-free noise alphabet: can never form a job id, a task id, or a
# ^-anchored keyword, so noise is unclassifiable by construction
_noise = st.text(alphabet='abc xyz_=.()" ', min_size=0, max_size=40)


@settings(max_examples=6, deadline=None)
@given(
    n_jobs=st.integers(1, 2),
    n_tasks=st.integers(1, 2),
    n_atts=st.integers(1, 2),
    mangle_mask=st.lists(st.booleans(), min_size=14, max_size=14),
    cuts=st.lists(st.floats(0.05, 1.0), min_size=14, max_size=14),
    dup_mask=st.lists(st.booleans(), min_size=14, max_size=14),
    noise=st.lists(_noise, max_size=5),
    seed=st.integers(0, 2**32 - 1),
)
def test_parser_fuzz_drops_never_errors(
    spark, n_jobs, n_tasks, n_atts, mangle_mask, cuts, dup_mask, noise, seed
):
    clean = _clean_corpus(n_jobs, n_tasks, n_atts)
    kept, corpus = [], list(noise)
    for i, line in enumerate(clean):
        if mangle_mask[i % len(mangle_mask)]:
            corpus.append(_mangle(line, cuts[i % len(cuts)]))
        else:
            kept.append(line)
            corpus.append(line)
            if dup_mask[i % len(dup_mask)]:
                corpus.append(line)  # re-read fragment: merge idempotent
    random.Random(seed).shuffle(corpus)
    got = _nested_rows(spark, corpus)  # must not raise
    assert got == _nested_rows(spark, kept)


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
