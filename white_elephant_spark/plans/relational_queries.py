"""Relational-surface queries: pivot, cube, set operations, JSON
extraction, deterministic per-group sampling — the remaining ANSI/
DataFrame API surface a reference user would expect an analytics
engine to cover, each oracle-paired."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from white_elephant_spark.functions.compat import dec, dsum, sql_dsum
from white_elephant_spark.plans.registry import register
from white_elephant_spark.sources.catalog import load_table

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_COLS = ", ".join(
    f"MAX(CASE WHEN event_type = '{t}' THEN {m} END) AS {t}_{a}"
    for t in _EVENT_TYPES
    for m, a in (("day_value", "v"), ("delta", "delta"), ("rolling7", "r7"))
)


@register(
    "pivot_event_values",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         {sql_dsum('value')} AS day_value
  FROM events GROUP BY 1, 2
),
series AS (
  SELECT day, event_type, day_value,
         day_value - lag(day_value) OVER w AS delta,
         CAST(SUM(CAST(day_value AS DECIMAL(27,4))) OVER w7 AS DOUBLE)
           / COUNT(day_value) OVER w7 AS rolling7
  FROM daily
  WINDOW w  AS (PARTITION BY event_type ORDER BY day),
         w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT day, {_PIVOT_COLS}
FROM series GROUP BY day
""",
    tags=("pivot", "agg", "window", "frame"),
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard daily matrix: day × event-type columns of the
    daily value, the day-over-day delta (lag), and the 7-day rolling
    mean over an explicit row frame — pivot and frame windows attested
    in one verified result. Pivot uses an explicit value list (never
    the implicit-distinct form — that takes an extra collect-distinct
    job and makes the output schema data-dependent, both wrong at
    scale); the rolling mean divides a DECIMAL frame-sum by the frame
    count so both engines agree bitwise. The oracle is the
    conditional-aggregation expansion pivot desugars to."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(dsum("value").alias("day_value"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    series = daily.select(
        "day",
        "event_type",
        "day_value",
        (F.col("day_value") - F.lag("day_value").over(w)).alias("delta"),
        (
            F.sum(dec("day_value")).over(w7).cast("double")
            / F.count("day_value").over(w7)
        ).alias("rolling7"),
    )
    return (
        series.groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(
            F.max("day_value").alias("v"),
            F.max("delta").alias("delta"),
            F.max("rolling7").alias("r7"),
        )
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


