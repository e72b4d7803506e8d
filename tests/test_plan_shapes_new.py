"""Plan-shape guards for the round-3 operators: the properties that
matter at 100 TB, asserted on the physical plan."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from white_elephant_spark.operators.funnel import cohort_retention, funnel_times
from white_elephant_spark.operators.spans import remove_repeated_spans, span_removed_counts
from white_elephant_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def test_span_removal_never_cartesian(spark):
    for df in (
        span_removed_counts(_docs(spark), n=8),
        remove_repeated_spans(_docs(spark), n=8),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # gram-frequency join is an equi-join on the digest
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_rollup_reuses_the_fact_exchange(spark):
    """rollup_time_units_tz shuffles the fact table ONCE into the
    30-minute partial; the five (unit, zone) branches reuse that
    exchange instead of re-shuffling the facts (the round-3 plan did
    five full-fact shuffles)."""
    from white_elephant_spark.plans.registry import all_queries

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = all_queries()["rollup_time_units_tz"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert plan.count("ReusedExchange") >= 4


def test_fuzzy_join_has_no_nested_loop(spark):
    """Every fuzzy-join stage — main Ed-Join pass, q=1 short-string
    pass, exploded-length ultra-short pass — is an equi-join; no
    length-band nested loop survives at any string length."""
    from white_elephant_spark.operators.fuzzy import fuzzy_join

    docs = _docs(spark)
    left = docs.selectExpr("doc_id AS lid", "substr(text, 1, 12) AS lname")
    right = docs.selectExpr("doc_id AS rid", "substr(text, 1, 12) AS rname")
    plan = _plan(fuzzy_join(left, right, "lname", "rname", max_dist=2, q=5))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_funnel_joins_are_equi_joins(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts")
    )
    df = funnel_times(ev, [F.col("event_type") == s for s in ("view", "click", "purchase")])
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the event-type filters reach the scan
    assert "PushedFilters" in plan


def test_cohort_retention_two_aggregations_one_join(spark):
    ev = load_table(spark, SF, "events").select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    plan = _plan(cohort_retention(ev, unit="week"))
    assert "CartesianProduct" not in plan
    # first-seen agg + distinct + final agg: partial aggregation
    # (map-side combine) must appear before every exchange
    assert len(re.findall(r"HashAggregate", plan)) >= 4


def test_funnel_query_is_one_fused_pipeline(spark):
    """event_funnel_cohorts: the two funnel row-kinds come from ONE
    fused pipeline (funnel_first_and_any + explode of structs) — one
    hash(user) Exchange for the funnel half, no cartesian, and the
    fact table is scanned at most 3x total (tagged once + the cohort
    leg's own two scans). The round-4 shape was 18 exchanges and ~8
    scans across three separately-planned legs."""
    from white_elephant_spark.plans.registry import all_queries

    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = all_queries()["event_funnel_cohorts"].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one hash(user) exchange feeds the stacked funnel window chains;
    # the second is the cohort leg's own first-seen aggregation
    assert len(re.findall(r"Exchange hashpartitioning\(user#", plan)) == 2
    # tagged (funnel half, once) + the cohort leg's first-seen (used
    # by both the join and the sizes branch) and active scans
    assert len(re.findall(r"Scan parquet", plan)) <= 4
