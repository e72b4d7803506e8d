"""Skew-resistant aggregation via key salting.

The reference's cube keys are naturally skewed: one heavy Hadoop user
can own most attempt rows in an hour, so a plain
``groupBy(user, hour)`` sends that user's entire volume to a single
reducer (the same hot-key problem its 1-reducer-per-GB sizing heuristic
papers over, ComputeUsagePerHour.java:148-149 in /root/reference).

Two defenses, composable:

1. AQE skew-join splitting — enabled session-wide
   (``spark.sql.adaptive.skewJoin.enabled``, session.py) — fixes
   skewed *joins* at runtime.
2. Salted two-phase aggregation (this module) — fixes skewed
   *aggregations*: append a deterministic salt in [0, n) to the key,
   partially aggregate on (key, salt) so a hot key spreads over ``n``
   tasks, then re-aggregate on the key alone. Exact for additive
   measures (sum/count/min/max) — the final result is independent of
   how rows landed in salt slots.

Only worth it when a key's row share exceeds ~1/shuffle-partitions;
for uniform keys the extra exchange is pure overhead, so this is an
opt-in operator, not a default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from white_elephant_spark.functions.compat import dec

_SALT = "__salt__"


def with_salt(df: DataFrame, n_salt: int) -> DataFrame:
    """Salt in [0, n_salt) from the row's position, not its content:
    a content hash would send *identical* hot rows (the exact skew
    case) to one shard. ``monotonically_increasing_id`` round-robins
    contiguous rows across shards and stays stable for a fixed input
    partitioning, with no ``rand()`` non-determinism."""
    return df.withColumn(
        _SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    )


def salted_rollup(
    df: DataFrame,
    keys: list[str],
    dsum_cols: list[str] = (),
    isum_cols: list[str] = (),
    count_alias: str | None = "n",
    n_salt: int = 32,
) -> DataFrame:
    """Two-phase exact rollup: ``groupBy(keys+salt)`` partials, then
    ``groupBy(keys)`` finals. Output columns: ``sum_<col>`` (double,
    via the DECIMAL convention of functions/compat.py), ``<col>``
    for integer sums, and ``count_alias`` for the row count."""
    partial_aggs: list[Column] = [
        F.sum(dec(c)).alias(f"__p_{c}") for c in dsum_cols
    ] + [F.sum(c).alias(f"__pi_{c}") for c in isum_cols]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("__pn"))

    partial = with_salt(df, n_salt).groupBy(*keys, _SALT).agg(*partial_aggs)

    final_aggs: list[Column] = [
        F.sum(f"__p_{c}").cast("double").alias(f"sum_{c}") for c in dsum_cols
    ] + [F.sum(f"__pi_{c}").cast("long").alias(c) for c in isum_cols]
    if count_alias:
        final_aggs.append(F.sum("__pn").cast("long").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
