"""Relational-surface queries: pivot, cube, set operations, JSON
extraction, deterministic per-group sampling — the remaining ANSI/
DataFrame API surface a reference user would expect an analytics
engine to cover, each oracle-paired."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from white_elephant_spark.functions.compat import dsum, sql_dsum
from white_elephant_spark.plans.registry import register
from white_elephant_spark.sources.catalog import load_table

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_COLS = ", ".join(
    sql_dsum("CASE WHEN event_type = '%s' THEN value END" % t) + " AS " + t
    for t in _EVENT_TYPES
)


@register(
    "pivot_event_values",
    oracle=f"""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, {_PIVOT_COLS}
FROM events GROUP BY 1
""",
    tags=("pivot", "agg"),
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type value matrix via ``pivot`` with an explicit
    value list (never the implicit-distinct form — that takes an
    extra collect-distinct job and makes the output schema
    data-dependent, both wrong at scale). The oracle is the
    conditional-aggregation expansion pivot desugars to."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(dsum("value"))
    )


@register(
    "cube_order_stats",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("cube", "agg"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) with grouping indicators —
    all four aggregation levels in one pass (Spark expands the
    grouping sets before the shuffle, so it is still a single
    exchange). Extends the reference's fixed dimension cube
    (aggregate! blocks) to the ad-hoc multi-level form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


# INTERSECT/EXCEPT set algebra is attested through
# semi_anti_customer_join (probe='setops_repeat_no_f' rows — exact
# membership, hash-verified); the standalone repeat_customers_setops
# slot was folded away to stay inside the driver's 50-query budget.


@register(
    "json_props_rollup",
    oracle=f"""
SELECT event_type, json_extract_string(props, '$.k') AS k,
       CAST(COUNT(*) AS BIGINT) AS n, {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
""",
    tags=("json", "agg"),
)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction in the hot path (``get_json_object``,
    JVM-side) feeding a rollup — the semi-structured column pattern;
    null extractions group as their own bucket in both engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.get_json_object(F.col("props"), "$.k").alias("k")
    ).agg(F.count("*").alias("n"), dsum("value").alias("total_value"))


