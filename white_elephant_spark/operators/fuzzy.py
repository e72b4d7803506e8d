"""Blocked fuzzy string join: edit-distance matching without the
cartesian product — the entity-resolution step of a curation pipeline
(matching near-identical titles, author names, URLs across sources).

Spark-first shape (the Ed-Join prefix-filter design, Xiao et al.;
q-gram count bounds from Gravano et al.):

- **distinct-string skeleton**: matching is a property of the string
  value, so the join runs over ``SELECT DISTINCT col`` of each side
  and the verified pairs re-attach to full rows by string equality at
  the end. Duplicate-heavy columns (catalog names, URLs) collapse
  before any expensive work.
- **prefix filter**: d edits destroy at most d·q of a string's
  positional q-grams, so if both sides order their gram multisets by
  one global total order, two strings within edit distance d must
  share a gram among their first ``d·q + 1`` grams. Only that prefix
  is indexed — candidate volume is per-string-constant, not
  per-string-length. The global order used is ascending corpus
  frequency (any consistent order is *correct*; rarest-first makes
  prefix grams selective, which is the entire performance story on
  low-entropy corpora where every string shares its common grams).
- **length band**: |len(a) − len(b)| ≤ d is necessary, filtered
  inside the candidate join.
- **short-string fallback**: the count bound guarantees a shared
  gram only when max(|a|,|b|) ≥ q·(d+1); pairs where BOTH sides are
  below that length (few, tiny strings) join on a length band
  instead (|Δlen| ≤ d is necessary for ed ≤ d).
- **exact verify**: ``levenshtein`` (JVM codegen) once per surviving
  *distinct* pair.

The shuffle keys are the gram-frequency lookup, the per-string
regroup, and the candidate pair set; volume is O(corpus grams) +
O(candidates), never |L|×|R|. Hot grams are excluded from prefixes by
construction wherever a rarer gram exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from white_elephant_spark.session import persist_reuse


def _grams(col, q: int):
    """array<string> of positional q-grams (may repeat; order = position)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(q - 1), F.lit(1)))
    return F.transform(idx, lambda i: col.substr(i, F.lit(q)))


def _prefix_grams(
    df: DataFrame,
    scol: str,
    lcol: str,
    freq: DataFrame,
    q: int,
    k: int,
    default_zero: bool = False,
) -> DataFrame:
    """Explode ``df[scol]`` to its ``k`` rarest grams (global
    frequency order, gram text as tie-break): (scol, lcol, _gram).

    ``default_zero`` ranks grams ABSENT from ``freq`` at frequency 0
    (rarest) — the indexed path, where ``freq`` counts corpus grams
    only and a probe-side gram may be unseen. Prefix-filter
    completeness needs only that both sides rank by the SAME total
    order, which (coalesce(freq, 0), gram) is."""
    g = df.select(scol, lcol, F.explode(_grams(F.col(scol), q)).alias("_gram"))
    if default_zero:
        ranked = g.join(freq, "_gram", "left").withColumn(
            "_freq", F.coalesce(F.col("_freq"), F.lit(0).cast("long"))
        )
    else:
        ranked = g.join(freq, "_gram")
    # Regroup per string, order grams by (freq, gram), keep first k.
    return (
        ranked.groupBy(scol, lcol)
        .agg(F.slice(F.array_sort(F.collect_list(F.struct("_freq", "_gram"))), 1, k).alias("_pre"))
        .select(scol, lcol, F.explode("_pre._gram").alias("_gram"))
    )


def build_fuzzy_index(
    right: DataFrame, right_col: str, q: int = 2, max_dist: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Corpus-side Ed-Join artifacts — the train-once/serve-many half
    of :func:`fuzzy_join`. Returns ``(freq, rpre)``:

    - ``freq``: (_gram, _freq) — positional q-gram frequencies over
      the DISTINCT corpus strings. This is the global gram order both
      sides rank prefixes by (probe grams unseen in the corpus rank
      rarest at 0 — see :func:`_prefix_grams`).
    - ``rpre``: (_rs, _rl, _gram) — each distinct corpus string's
      ``max_dist·q + 1`` rarest grams, pre-exploded for the candidate
      equi-join.

    Both are deterministic artifacts of the corpus alone (probe-side
    frequencies no longer perturb the order — any consistent total
    order preserves the Ed-Join completeness guarantee, and the
    post-verify result is blocking-independent), so they belong in
    the model registry next to the LSH sketch index: maintained with
    the corpus, served from parquet, never recomputed per query."""
    rs = (
        right.select(F.col(right_col).alias("_rs"))
        .distinct()
        .withColumn("_rl", F.length("_rs"))
    )
    freq = (
        rs.select(F.explode(_grams(F.col("_rs"), q)).alias("_gram"))
        .groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_freq"))
    )
    rpre = _prefix_grams(rs, "_rs", "_rl", freq, q, max_dist * q + 1)
    return freq, rpre


def _prefix_candidates(
    ls: DataFrame, rs: DataFrame, q: int, max_dist: int
) -> DataFrame:
    """Ed-Join candidate pairs at gram width ``q``: shared rarest-
    prefix gram + length band. Complete for pairs whose longer side
    has at least ``q·(max_dist+1)`` characters."""
    k = max_dist * q + 1
    # One consistent global gram order for both sides: ascending
    # frequency over the union of the two distinct-string corpora.
    grams_union = ls.select(F.explode(_grams(F.col("_ls"), q)).alias("_gram")).unionAll(
        rs.select(F.explode(_grams(F.col("_rs"), q)).alias("_gram"))
    )
    freq = grams_union.groupBy("_gram").agg(F.count(F.lit(1)).alias("_freq"))

    lpre = _prefix_grams(ls, "_ls", "_ll", freq, q, k)
    rpre = _prefix_grams(rs, "_rs", "_rl", freq, q, k)

    return (
        lpre.join(rpre, "_gram")
        .filter(F.abs(F.col("_ll") - F.col("_rl")) <= max_dist)
        .select("_ls", "_rs")
    )


def _match_pairs(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int,
    q: int,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Distinct (left_col → _ls, right_col → _rs, edit_dist) value
    pairs within edit distance ``max_dist``. Only the string columns
    are shuffled, and every join is an equi-join — no nested-loop
    band join at any length.

    ``index`` is a prebuilt ``(freq, rpre)`` — optionally
    ``(freq, rpre, min_rl)`` — from :func:`build_fuzzy_index` at the
    SAME (q, max_dist): the corpus scan, gram-frequency aggregate,
    and corpus-prefix regroup are then served instead of recomputed,
    and only the probe side is processed per call. ``min_rl`` is the
    corpus-wide minimum string length (a registry-memoized scalar):
    when it is ≥ q·(max_dist+1), the short/ultra legs' CORPUS sides
    are provably empty — a below-bound probe against an at-or-above-
    bound corpus string is already covered by the main leg's
    completeness guarantee (it needs only max(|a|,|b|) ≥ q·(d+1)) —
    so both legs prune out of the plan statically."""
    # feeds the main-leg prefix regroup AND the short/ultra legs —
    # without the cache the probe scan+distinct exchange runs 3x
    ls = persist_reuse(
        left.select(F.col(left_col).alias("_ls"))
        .distinct()
        .withColumn("_ll", F.length("_ls"))
    )
    min_complete = q * (max_dist + 1)
    min_rl = None
    if index is not None:
        freq, rpre = index[0], index[1]
        if len(index) > 2:
            min_rl = index[2]
        lpre = _prefix_grams(
            ls, "_ls", "_ll", freq, q, max_dist * q + 1, default_zero=True
        )
        cand = (
            lpre.join(rpre, "_gram")
            .filter(F.abs(F.col("_ll") - F.col("_rl")) <= max_dist)
            .select("_ls", "_rs")
        )
        if min_rl is not None and min_rl >= min_complete:
            # Stats-pruned: no corpus string below the completeness
            # bound, so the short/ultra legs are empty by construction
            # — drop their ~8 stages from the plan entirely.
            return (
                cand.distinct()
                .withColumn("edit_dist", F.levenshtein(F.col("_ls"), F.col("_rs")))
                .filter(F.col("edit_dist") <= max_dist)
            )
        # Corpus sides of the short/ultra legs derive from the served
        # index (every string, short ones included, carries prefix
        # rows in rpre); the filtered distinct is bounded by the
        # below-completeness-length tail, not the corpus.
        rshort = (
            rpre.filter(F.col("_rl") < min_complete).select("_rs", "_rl").distinct()
        )
        sr = rshort
        ur = rshort.filter(F.col("_rl") <= max_dist)
    else:
        rs = (
            right.select(F.col(right_col).alias("_rs"))
            .distinct()
            .withColumn("_rl", F.length("_rs"))
            .persist()  # feeds the main, short, and ultra legs
        )
        cand = _prefix_candidates(ls, rs, q, max_dist)
        sr = rs.filter(F.col("_rl") < min_complete)
        ur = rs.filter(F.col("_rl") <= max_dist)

    # Pairs with both sides shorter than q·(d+1) have no shared-gram
    # guarantee at width q (a single edit can rewrite every q-gram).
    # Recurse the same prefix filter at q=1: d edits alter at most d
    # characters of the multiset, so short pairs whose longer side has
    # ≥ d+1 characters must share a character among their d+1 rarest
    # — an equi-join on the character, never all-pairs within the
    # short set (a corpus of millions of short titles stays
    # candidate-bounded by character selectivity).
    sl = ls.filter(F.col("_ll") < min_complete)
    short_cand = _prefix_candidates(sl, sr, 1, max_dist)

    # Ultra-short remainder: both sides ≤ d characters (d edits can
    # rewrite the whole string — no shared-gram guarantee at any
    # width). The length band becomes an equi-join by exploding each
    # left length to its ≤ 2d+1 admissible partner lengths; the value
    # universe at ≤ d chars is alphabet-bounded, so the per-length
    # buckets cannot grow with the corpus.
    ul = ls.filter(F.col("_ll") <= max_dist).select(
        "_ls",
        F.explode(
            F.sequence(
                F.greatest(F.col("_ll") - max_dist, F.lit(0)),
                F.col("_ll") + max_dist,
            )
        ).alias("_rl"),
    )
    ultra_cand = ul.join(ur, "_rl").select("_ls", "_rs")

    return (
        cand.unionByName(short_cand)
        .unionByName(ultra_cand)
        .distinct()
        .withColumn("edit_dist", F.levenshtein(F.col("_ls"), F.col("_rs")))
        .filter(F.col("edit_dist") <= max_dist)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Pairs (all left columns, all right columns, ``edit_dist``) with
    ``levenshtein(left_col, right_col) <= max_dist``. Inputs should
    carry disjoint column names (alias beforehand). ``index`` serves
    the corpus-side blocking artifacts (:func:`build_fuzzy_index`,
    same (q, max_dist)) instead of recomputing them per call."""
    pairs = _match_pairs(left, right, left_col, right_col, max_dist, q, index=index)
    return (
        left.join(pairs, left[left_col] == pairs["_ls"])
        .join(right, pairs["_rs"] == right[right_col])
        .select(*left.columns, *right.columns, "edit_dist")
    )
