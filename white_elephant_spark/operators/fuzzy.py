"""Blocked fuzzy string join: edit-distance matching without the
cartesian product — the entity-resolution step of a curation pipeline
(matching near-identical titles, author names, URLs across sources).

Spark-first shape:

- **q-gram blocking**: explode each string's positional q-grams; a
  candidate pair must share at least one q-gram AND have lengths
  within ``max_dist``. By the q-gram count filter (Gravano et al.,
  approximate string joins), any pair within edit distance d shares
  ≥ max(|a|,|b|) - q + 1 - d·q grams — which is ≥ 1 whenever
  max(|a|,|b|) ≥ q·(d + 1). The shared-gram join is therefore
  COMPLETE for strings at least that long.
- **short-string fallback**: strings below the completeness bound are
  few and tiny; they join on a length-band key (complete because
  |len(a) - len(b)| ≤ d is necessary for ed ≤ d).
- **exact verify**: ``levenshtein`` (JVM codegen) on the candidate
  set only.

The shuffle key is the gram (or the length band); candidate volume is
bounded by gram selectivity, never |L|×|R|. Hot grams ("the ") behave
like any hot join key — AQE skew splitting applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qgrams(col, q: int):
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(q - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(q))))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Pairs (all left columns, all right columns, ``edit_dist``) with
    ``levenshtein(left_col, right_col) <= max_dist``. Inputs should
    carry disjoint column names (alias beforehand)."""
    min_complete = q * (max_dist + 1)

    def prep(df: DataFrame, col: str, side: str) -> DataFrame:
        return df.withColumn(f"_len_{side}", F.length(F.col(col)))

    l_ = prep(left, left_col, "l")
    r_ = prep(right, right_col, "r")

    # long-string path: shared-q-gram block. Complete when EITHER side
    # reaches the bound (the count filter uses max(|a|,|b|)), so the
    # right side only needs to be within max_dist below it — without
    # the slack, a bound-length left and a bound-minus-one right would
    # fall between the two paths.
    lg = l_.filter(F.col("_len_l") >= min_complete).withColumn(
        "_g", F.explode(_qgrams(F.col(left_col), q))
    )
    rg = r_.filter(F.col("_len_r") >= min_complete - max_dist).withColumn(
        "_g", F.explode(_qgrams(F.col(right_col), q))
    )
    long_cand = (
        lg.join(rg, "_g")
        .filter(F.abs(F.col("_len_l") - F.col("_len_r")) <= max_dist)
        .drop("_g")
        .dropDuplicates(left.columns + right.columns)
    )

    # short-string fallback: length-band block (|Δlen| ≤ d necessary)
    ls = l_.filter(F.col("_len_l") < min_complete)
    rs = r_.filter(F.col("_len_r") < min_complete + max_dist)
    short_cand = ls.join(
        rs, F.abs(F.col("_len_l") - F.col("_len_r")) <= max_dist
    )

    out = []
    for cand in (long_cand, short_cand):
        out.append(
            cand.withColumn(
                "edit_dist", F.levenshtein(F.col(left_col), F.col(right_col))
            )
            .filter(F.col("edit_dist") <= max_dist)
            .drop("_len_l", "_len_r")
        )
    both = out[0].unionByName(out[1])
    return both.dropDuplicates(left.columns + right.columns)
