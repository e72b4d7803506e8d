"""Per-stage growth decomposition for the heaviest headline queries.

SCALING.md's third decade (sf1 → sf10) shows total-time growth factors
of ~5-7x on 10x data for `fuzzy_doc_match`, `corpus_curation` and
`dedup_clusters` — below the 15x superlinear flag, but carrying an
unattributed term: is it a fixed local-mode overhead being amortized,
an honestly-linear stage with a log factor, or a stage quietly going
superlinear one decade before it blows up? This tool answers by
timing each query's constituent stages at BOTH scale factors and
printing the per-stage growth table (the round-9 SemDeDup
decomposition — which found the O(N²) driver-training cliff — done
systematically).

Stages reuse the exact plan builders the registered queries call
(`plans.text_queries._dc_simhash_leg` / `_dc_semantic_leg`, the
`operators.contamination/dedup/spans` branch functions,
`operators.fuzzy` internals), so a stage time IS that stage of the
real query, not a reimplementation. Branch stages re-execute their
shared upstream scan (no persist), so stage times don't sum to the
full-query time; the signal is each stage's GROWTH FACTOR in
isolation.

Measurement policy = bench.py's: noop-sink materialization,
best-of-2, third run under 8s. Steady-state registry serving (the
bench posture): run `bench.py` or the probe at the same SF first if
you want cold trains excluded — or just ignore the first-run column.

Usage:
  python tools/stage_decompose.py SF_A_DIR SF_B_DIR [--queries a,b]
Prints one markdown table per query (paste into SCALING.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPARK = None


def _t(build, sf_dir: str) -> float:
    # Timer covers BUILD + sink, exactly like bench.py/scale_probe:
    # several stages do eager driver-side work during plan
    # construction (registry serves, connected-components iterations,
    # localCheckpoints) — timing the sink alone hides it (the round-6
    # SCALING-vs-BENCH discrepancy, and a first cut of this tool
    # reported the simhash CC leg FASTER at sf10 than sf1 because the
    # CC iterations ran outside the clock).
    t0 = time.time()
    build(_SPARK, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _cold(sf_dir: str) -> bool:
    """bench.py's reps cache-mode rule: SF>=1 measures cache-cold
    (clearCache between best-of-N reps), sub-1 SFs assisted."""
    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    try:
        return bool(m) and float(m.group(1).rstrip(".")) >= 1.0
    except ValueError:
        return False


def _best(build, sf_dir: str) -> float:
    import gc

    from bench import THIRD_RUN_BELOW

    cold = _cold(sf_dir)

    def _between():
        if cold and _SPARK is not None:
            _SPARK.catalog.clearCache()
            gc.collect()

    best = _t(build, sf_dir)
    _between()
    best = min(best, _t(build, sf_dir))
    if best <= THIRD_RUN_BELOW:
        _between()
        best = min(best, _t(build, sf_dir))
    return best


# --------------------------------------------------------------- stages
# Each entry: (stage label, builder(spark, sf_dir) -> DataFrame).
# Builders lean on the SAME module-level helpers the queries use.


def _fuzzy_stages():
    from pyspark.sql import functions as F

    from white_elephant_spark.operators import fuzzy
    from white_elephant_spark.plans.text_queries import _FZ_TITLE, _fz_probe
    from white_elephant_spark.sources.catalog import load_table

    def base(spark, sf_dir):
        return load_table(spark, sf_dir, "documents").selectExpr(
            "doc_id", f"{_FZ_TITLE} AS title"
        )

    def dirty(spark, sf_dir):
        return (
            base(spark, sf_dir)
            .filter(F.col("doc_id") % 5 == 0)
            .selectExpr(
                "doc_id AS probe_id", f"{_fz_probe('title', 'doc_id')} AS probe_title"
            )
        )

    def served(spark, sf_dir, i):
        from white_elephant_spark import models

        def build():
            return fuzzy.build_fuzzy_index(base(spark, sf_dir), "title", q=5, max_dist=2)[i]

        return models.get_or_train(
            spark, sf_dir, "documents", f"fz_{('freq', 'rpre')[i]}",
            (5, 2, "fzidx-v1"), build,
            save=models.df_save, load=models.df_load(),
        )

    def probe_prefix(spark, sf_dir):
        d = dirty(spark, sf_dir)
        ls = (
            d.select(F.col("probe_title").alias("_ls"))
            .distinct()
            .withColumn("_ll", F.length("_ls"))
        )
        return fuzzy._prefix_grams(
            ls, "_ls", "_ll", served(spark, sf_dir, 0), 5, 11, default_zero=True
        )

    def candidates(spark, sf_dir):
        lpre = probe_prefix(spark, sf_dir)
        rpre = served(spark, sf_dir, 1)
        return (
            lpre.join(rpre, "_gram")
            .filter(F.abs(F.col("_ll") - F.col("_rl")) <= 2)
            .select("_ls", "_rs")
            .distinct()
        )

    def verify(spark, sf_dir):
        c = candidates(spark, sf_dir)
        return c.filter(F.levenshtein("_ls", "_rs") <= 2).withColumn(
            "edit_dist", F.levenshtein("_ls", "_rs")
        )

    return [
        ("probe_build (scan+corrupt)", dirty),
        ("index_serve (freq+rpre registry read)", lambda s, d: served(s, d, 1)),
        ("probe_prefix (gram explode+rank)", probe_prefix),
        ("candidates (prefix equi-join+len band)", candidates),
        ("verify (levenshtein gate)", verify),
    ]


def _curation_stages():
    from pyspark.sql import functions as F

    from white_elephant_spark.operators import contamination, dedup, spans
    from white_elephant_spark.plans.curation_queries import _docs_with_copies

    def docs(spark, sf_dir):
        return _docs_with_copies(spark, sf_dir)

    def contam(spark, sf_dir):
        d = docs(spark, sf_dir)
        return contamination.ngram_contamination(
            d, d.filter(F.col("doc_id") % 101 == 0), n=5
        )

    def interdoc(spark, sf_dir):
        return dedup.interdoc_repeated_ngrams(docs(spark, sf_dir), n=8)

    def spanrw(spark, sf_dir):
        return spans.remove_repeated_spans(docs(spark, sf_dir), n=8)

    def full(spark, sf_dir):
        from white_elephant_spark.plans.registry import all_queries

        return all_queries()["corpus_curation"].fn(spark, sf_dir)

    return [
        ("docs_scan (+planted copies)", docs),
        ("contamination (bcast eval 5-grams)", contam),
        ("interdoc_repeated (8-gram df agg)", interdoc),
        ("span_rewrite (strip+reassemble)", spanrw),
        # The registered composed query (round 13: interdoc + span
        # share ONE gram scan and ONE gram aggregation) — the branch
        # stages above time the standalone operators, so their sum
        # exceeds the composed plan by the shared work.
        ("FULL query (shared gram scan)", full),
    ]


def _clusters_stages():
    from white_elephant_spark.operators import dedup
    from white_elephant_spark.plans.text_queries import (
        _dc_semantic_leg,
        _dc_simhash_leg,
        _docs_with_copies,
    )

    def full(s, d):
        from white_elephant_spark.plans.registry import all_queries

        return all_queries()["dedup_clusters"].fn(s, d)

    return [
        ("docs_scan (+planted copies)", lambda s, d: _docs_with_copies(s, d)),
        ("simhash_fps (64-bit fingerprints)", lambda s, d: dedup.simhash64(_docs_with_copies(s, d))),
        ("simhash_leg (bands+CC+label)", _dc_simhash_leg),
        ("semantic_leg (cells+verify+CC)", _dc_semantic_leg),
        ("FULL query (both legs)", full),
    ]


def _annlsh_stages():
    from pyspark.sql import functions as F

    from white_elephant_spark.plans.text_queries import (
        _annlsh_enc,
        _annlsh_knn_leg,
        _annlsh_nd_enc,
        _annlsh_nd_leg,
    )

    def knn_candidates(spark, sf_dir):
        # The kNN leg's candidate set BEFORE scoring/ranking (ids
        # only): broadcast queries × corpus bucket-overlap join — the
        # term the S-curve argument says must grow ∝ queries×corpus.
        enc = _annlsh_enc(spark, sf_dir)
        q = enc.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("buckets").alias("qb")
        )
        c = enc.select(F.col("vec_id").alias("nbr_id"), F.col("buckets").alias("cb"))
        return (
            F.broadcast(q)
            .join(
                c,
                F.arrays_overlap(F.col("qb"), F.col("cb"))
                & (F.col("query_id") != F.col("nbr_id")),
            )
            .select("query_id", "nbr_id")
        )

    return [
        ("lsh_enc_serve (registry read, 12t x 3p)", _annlsh_enc),
        ("nd_enc_serve (registry read, 4t x 16p)", _annlsh_nd_enc),
        ("knn_candidates (bcast bucket-overlap, ids only)", knn_candidates),
        ("knn_leg (candidates + cosine + rank top-10)", _annlsh_knn_leg),
        ("neardup_leg (band join + cos>=0.999 verify)", _annlsh_nd_leg),
    ]


STAGES = {
    "fuzzy_doc_match": _fuzzy_stages,
    "corpus_curation": _curation_stages,
    "dedup_clusters": _clusters_stages,
    "ann_lsh_topk": _annlsh_stages,
}


def main() -> None:
    global _SPARK
    argv = [a for a in sys.argv[1:]]
    only = None
    if "--queries" in argv:
        i = argv.index("--queries")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    if len(argv) != 2:
        sys.exit("usage: stage_decompose.py SF_A_DIR SF_B_DIR [--queries a,b]")
    dir_a, dir_b = argv

    from white_elephant_spark.plans.registry import all_queries
    from white_elephant_spark.session import get_spark

    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "16"))
    _SPARK = get_spark(
        "stage-decompose",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    lbl = lambda p: os.path.basename(os.path.normpath(p))  # noqa: E731

    mode = lambda d: "cold" if _cold(d) else "assisted"  # noqa: E731
    print(
        f"Reps cache mode: {lbl(dir_a)}={mode(dir_a)},"
        f" {lbl(dir_b)}={mode(dir_b)} (SF>=1 clears the block cache"
        " between best-of-N reps — bench.py's rule)."
    )
    for name in only or list(STAGES):
        stages = STAGES[name]()
        print(f"\n### `{name}` — per-stage growth {lbl(dir_a)} → {lbl(dir_b)}\n")
        print(f"| stage | t({lbl(dir_a)}) s | t({lbl(dir_b)}) s | growth |")
        print("|---|---|---|---|")
        rows = []
        # Stage lists that already carry a FULL entry (curation,
        # clusters) would otherwise time the composed query twice.
        extra = (
            []
            if any(lab.startswith("FULL query") for lab, _ in stages)
            else [("FULL query", qs[name].fn)]
        )
        for label, build in stages + extra:
            ta = _best(build, dir_a)
            tb = _best(build, dir_b)
            g = tb / ta if ta > 0 else float("inf")
            rows.append((label, ta, tb, g))
            print(f"| {label} | {ta:.2f} | {tb:.2f} | {g:.1f}x |")
            _SPARK.catalog.clearCache()
        sys.stdout.flush()


if __name__ == "__main__":
    main()
