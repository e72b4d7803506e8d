"""Join-skew hardening: AQE's skew-join split on a planted hot key.

The reference's per-user fan-out (ComputeUsagePerHour walks every
line of every user's jobs) is exactly the shape that melts a shuffle
join at 100 TB: one hot foreign key owns a third of the fact table,
so one sort-merge partition gets a third of the shuffle while its
peers finish in seconds. The engine's contract for that shape is
runtime, not plan-time: AQE (`spark.sql.adaptive.skewJoin`, ON in the
engine's production defaults, session.py) measures the actual
partition sizes after the shuffle and splits the oversized partition
into advisory-sized slices, replicating the matching build rows —
exact results, no salting rewrite needed on the join path. (The
salting rewrite remains the AGGREGATION answer —
`skew_salted_event_rollup` — where there is no build side to
replicate.)

These tests plant the skew explicitly and assert both halves of the
contract: the result is exact, and the executed adaptive plan really
did split (the `skew=true` marker on the sort-merge join). Bench and
scale-probe runs keep AQE off (toy-scale stage costs), so this is
deliberately an execution test, not a bench row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT_SHARE_ROWS = 500_000  # rows on the single hot key
COLD_KEYS = 3_000
COLD_ROWS = 100_000


@pytest.fixture()
def skewed(spark):
    """(fact, dim): fact fk distribution is ~50% one hot key, dim keys
    unique — the skewed-probe / unique-build join AQE can split."""
    hot = spark.range(HOT_SHARE_ROWS).select(
        F.lit(0).cast("long").alias("k"), (F.col("id") % 97).alias("v")
    )
    cold = spark.range(COLD_ROWS).select(
        (F.col("id") % COLD_KEYS + 1).cast("long").alias("k"),
        (F.col("id") % 89).alias("v"),
    )
    fact = hot.unionAll(cold)
    dim = spark.range(COLD_KEYS + 1).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") % 7).cast("long").alias("seg"),
    )
    return fact, dim


def _skew_session(spark):
    """Session conf pairs (set, restore) forcing the skew path to be
    observable at test scale: SMJ instead of broadcast (the dim is
    tiny here; at 100 TB it would be too big to broadcast), thresholds
    lowered so a ~MB hot partition already counts as skewed."""
    # coalescePartitions OFF: the skew rule matches
    # SMJ(Sort(ShuffleStage)) and must see the raw 8-way layout, and a
    # test-scale hot partition is exactly what coalesce would fold
    # away. Production keeps both ON; at real sizes they compose.
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }


def _with_confs(spark, confs):
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_skew_join(spark, skewed):
    """Bare join (the skew rule declines to split when a downstream
    aggregation would force an extra shuffle — there, salting or
    forceOptimizeSkewedJoin is the lever); executed plan must carry
    the skew=true marker and the row count must be exact."""
    fact, dim = skewed
    old = _with_confs(spark, _skew_session(spark))
    try:
        joined = fact.join(dim, "k")
        n = 0
        hot = 0
        for r in joined.toLocalIterator():
            n += 1
            hot += r["seg"] == 0 and r["k"] == 0
        # executed (final) adaptive plan — only meaningful post-action
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        _restore(spark, old)
    # exactness: every fact row matched exactly one dim row
    assert n == HOT_SHARE_ROWS + COLD_ROWS
    assert hot >= HOT_SHARE_ROWS
    # the contract itself: AQE recognized and split the skewed side
    assert "skew=true" in plan, plan[:2000]


def test_skew_split_matches_unskewed_result(spark, skewed):
    """Same join with AQE off (plain SMJ) — byte-identical aggregate,
    proving the split is pure execution strategy, not semantics."""
    fact, dim = skewed
    base_confs = _skew_session(spark)
    on = _with_confs(spark, base_confs)
    try:
        with_split = sorted(
            (r["seg"], r["n"], r["sv"])
            for r in fact.join(dim, "k")
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        )
    finally:
        _restore(spark, on)
    base_confs["spark.sql.adaptive.enabled"] = "false"
    off = _with_confs(spark, base_confs)
    try:
        without = sorted(
            (r["seg"], r["n"], r["sv"])
            for r in fact.join(dim, "k")
            .groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        )
    finally:
        _restore(spark, off)
    assert with_split == without
