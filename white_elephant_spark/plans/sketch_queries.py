"""Sketch queries: deterministic HLL / count-min / Bloom over the
events and customer tables — approximate operators whose sketches are
engine-portable, so even the approximation error is oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from white_elephant_spark.operators import sketches
from white_elephant_spark.plans.registry import register
from white_elephant_spark.sources.catalog import load_table
from white_elephant_spark.session import persist_reuse


# sql_hll_estimate emits "<ctes> SELECT ... FROM regs"; rewrap its
# final SELECT as one more CTE so the query can join the exact count.
_HLL_CTES = (
    sketches.sql_hll_estimate("ev", "user_id", p=8)
    .strip()
    .replace(")\nSELECT ", "),\nest AS (SELECT ", 1)
    .replace("FROM regs", "FROM regs),", 1)
)


# sql_cms_estimate likewise ends in a bare SELECT; rewrap as a CTE.
_CMS_SQL = sketches.sql_cms_estimate("evt", "event_type", "kt", "event_type", d=4, w=64).strip()
_CMS_CTES, _CMS_TAIL = _CMS_SQL.rsplit("\nSELECT", 1)
_CMS_CTES = f"{_CMS_CTES},\ncmsq AS (SELECT{_CMS_TAIL})"


def _sql_bloom_pos(expr: str, j: int, m: int) -> str:
    return f"CAST(({sketches.sql_hash64(expr, f'bloom{j}')}) % {m} AS INTEGER)"


@register(
    "sketch_estimates",
    oracle=f"""
WITH ev AS (SELECT user_id FROM events),
{_HLL_CTES}
exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct FROM ev),
evt AS (SELECT event_type FROM events),
kt AS (SELECT DISTINCT event_type FROM events),
{_CMS_CTES},
cnts AS (SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS exact FROM events GROUP BY 1),
bk AS (SELECT value FROM events ORDER BY md5(CAST(event_id AS VARCHAR)) LIMIT 256),
bkq AS (SELECT quantile_cont(value, 0.5) AS p50e, quantile_cont(value, 0.95) AS p95e FROM bk),
fullq AS (SELECT quantile_cont(value, 0.5) AS p50x, quantile_cont(value, 0.95) AS p95x FROM events),
evg AS (SELECT event_type, user_id FROM events),
{sketches.sql_hll_estimate_by('evg', 'event_type', 'user_id', p=8).strip().lstrip()}
, exact_by AS (
  SELECT event_type AS grp, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_d
  FROM events GROUP BY 1
),
hv AS (SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal >= 9000),
bloombits AS (
  SELECT DISTINCT pos FROM (
    {' UNION ALL '.join(f"SELECT {_sql_bloom_pos('c_custkey', j, 1024)} AS pos FROM hv" for j in range(3))}
  )
),
bloomprobe AS (
  SELECT user_id,
         {' AND '.join(f"({_sql_bloom_pos('user_id', j, 1024)}) IN (SELECT pos FROM bloombits)" for j in range(3))}
           AS might_contain,
         user_id IN (SELECT c_custkey FROM hv) AS actual
  FROM events
),
bloomrow AS (
  SELECT CAST(SUM(CASE WHEN might_contain THEN 1 ELSE 0 END) AS DOUBLE) AS n_maybe,
         CAST(SUM(CASE WHEN actual THEN 1 ELSE 0 END) AS DOUBLE) AS n_actual
  FROM bloomprobe
)
SELECT 'hll_distinct_users' AS sketch, 'user_id' AS key,
       hll_estimate AS estimate, CAST(exact_distinct AS DOUBLE) AS exact,
       (hll_estimate - exact_distinct) / exact_distinct AS rel_err
FROM est CROSS JOIN exact
UNION ALL
SELECT 'cms_count' AS sketch, cmsq.key AS key,
       CAST(est AS DOUBLE) AS estimate, CAST(cnts.exact AS DOUBLE) AS exact,
       (CAST(est AS DOUBLE) - cnts.exact) / cnts.exact AS rel_err
FROM cmsq JOIN cnts ON cmsq.key = cnts.key
UNION ALL
SELECT 'bottomk_p50' AS sketch, 'value' AS key,
       p50e AS estimate, p50x AS exact, (p50e - p50x) / p50x AS rel_err
FROM bkq CROSS JOIN fullq
UNION ALL
SELECT 'bottomk_p95' AS sketch, 'value' AS key,
       p95e AS estimate, p95x AS exact, (p95e - p95x) / p95x AS rel_err
FROM bkq CROSS JOIN fullq
UNION ALL
SELECT 'hll_users_by_type' AS sketch, hll_by.grp AS key,
       hll_estimate AS estimate, CAST(exact_d AS DOUBLE) AS exact,
       (hll_estimate - exact_d) / exact_d AS rel_err
FROM hll_by JOIN exact_by ON hll_by.grp = exact_by.grp
UNION ALL
SELECT 'bloom_prefilter' AS sketch, 'user_id' AS key,
       n_maybe AS estimate, n_actual AS exact,
       (n_maybe - n_actual) / greatest(n_actual, 1.0) AS rel_err
FROM bloomrow
""",
    tags=("sketch", "agg"),
)
def sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch surface in one verified result, each row
    (sketch, key, estimate, exact, rel_err):

    - deterministic HyperLogLog (p=8, md5 hash, trailing-zero rank)
      distinct-user estimate — engine-portable sketch (unlike
      ``approx_count_distinct``, whose HLL++ state is
      engine-private), MAX-merged registers, one narrow shuffle of
      ≤2^p rows;
    - count-min (4×64 integer cells) frequency estimates for every
      distinct event type — overestimates only, by construction; the
      d×w sketch merges by cell sum and broadcasts to the probe side;
    - bottom-k (k=256, md5-ranked) quantile sketch for p50/p95 of the
      event value — the mergeable KLL-style shape: per-partition
      bottom-k then global bottom-k (Spark plans orderBy+limit as
      TakeOrdered, never a global sort), a deterministic hash-uniform
      sample whose quantiles estimate the population's;
    - Bloom-filter semi-join prefilter (3 hashes × 1024 bits) probing
      events membership against the high-balance customer key set —
      estimate/exact/rel_err expose the realized false-positive rate.

    Even the approximation *error* is hash-checked, because all four
    sketches are exact deterministic functions of the input.

    Scan economy (round 13): the events fact is read FOUR times —
    (grp, register) HLL state, per-type stats, the fused bloom+exact
    scalar pass, and the bottom-k TakeOrdered — where the previous
    shape read it seven times. The global HLL re-rolls the per-type
    register state (max is associative, so max-over-groups == the
    global register state bit-for-bit); the CMS cells aggregate the
    per-type counts with the type count as the cell weight (sum of
    ones per type == the count — cell-exact); the CMS probe keys and
    both exact comparison columns come from the same per-type stats
    row. All pure reassociations over identical row sets — every
    output value, including the approximation errors, is unchanged
    (the oracle SQL is untouched and hash-matches)."""
    ev = load_table(spark, sf_dir, "events")
    # One (grp, register) HLL state feeds BOTH estimate rows: per-type
    # directly, global by re-rolling registers across groups.
    regs_by = persist_reuse(sketches.hll_registers_by(ev, "event_type", "user_id", p=8))
    by = sketches.hll_estimate_by_from(regs_by, p=8)
    est = sketches.hll_estimate_from(
        regs_by.groupBy("register").agg(F.max("max_rank").alias("max_rank")), p=8
    )
    # One per-type aggregation carries the exact count (CMS comparison
    # column AND the CMS cell weights), the exact distinct users (HLL
    # comparison column), and the distinct type list (CMS probe keys).
    tstats = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("exact"),
        F.count_distinct("user_id").cast("long").alias("exact_d"),
    ).persist()
    sketch = sketches.cms_table(
        tstats, "event_type", weight=F.col("exact"), d=4, w=64
    )
    cms = sketches.cms_estimate(
        sketch, tstats.select("event_type"), "event_type", d=4, w=64
    )
    cms_rows = cms.join(tstats, cms.key == tstats.event_type).select(
        F.lit("cms_count").alias("sketch"),
        "key",
        F.col("est").cast("double").alias("estimate"),
        F.col("exact").cast("double").alias("exact"),
        ((F.col("est").cast("double") - F.col("exact")) / F.col("exact")).alias("rel_err"),
    )
    # Bottom-k quantile sketch: md5 of the unique event id is a
    # uniform rank, so the 256 lowest-ranked rows are a deterministic
    # uniform sample; orderBy+limit plans as per-partition TakeOrdered
    # (no global sort), and two bottom-k samples merge by re-ranking —
    # the property that makes this a sketch, not just a sample.
    samp = (
        ev.select("value", F.md5(F.col("event_id").cast("string")).alias("h"))
        .orderBy("h")
        .limit(256)
    )
    bkq = samp.agg(
        F.expr("percentile(value, 0.5)").alias("p50e"),
        F.expr("percentile(value, 0.95)").alias("p95e"),
    )
    # Per-group HLL comparison: the estimates come from regs_by above;
    # the exact distinct-user column rides the shared per-type stats.
    exact_by = tstats.select(F.col("event_type").alias("grp"), "exact_d")
    by_rows = by.join(exact_by, "grp").select(
        F.lit("hll_users_by_type").alias("sketch"),
        F.col("grp").alias("key"),
        F.col("hll_estimate").alias("estimate"),
        F.col("exact_d").cast("double").alias("exact"),
        ((F.col("hll_estimate") - F.col("exact_d")) / F.col("exact_d")).alias("rel_err"),
    )
    # Bloom-filter semi-join prefilter (folded in from the former
    # bloom_prefilter_events slot): the high-balance customer key set
    # lights 3×md5 bits in a 1024-bit filter; the big (events) side is
    # probed map-side via one broadcast row — no shuffle of the probe
    # side, the standard 100 TB prefilter before an expensive join.
    # estimate = rows the filter lets through, exact = true members,
    # rel_err = realized false-positive inflation — reproduced exactly
    # by the oracle because the hash family is fixed.
    hv = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 9000)
        .select("c_custkey")
        .distinct()
    )
    bits = sketches.bloom_bits(hv, "c_custkey", m=1024, k=3)
    probed = sketches.bloom_probe(
        ev.select("user_id", "value"), bits, "user_id", m=1024, k=3
    )
    flagged = probed.join(
        hv.select(F.col("c_custkey").alias("user_id")).withColumn("actual", F.lit(True)),
        "user_id",
        "left",
    ).withColumn("actual", F.coalesce(F.col("actual"), F.lit(False)))
    # Scalar legs consolidated (r7 verdict): the four single-row
    # comparison rows (HLL vs exact distinct, two bottom-k quantiles
    # vs exact, Bloom pass-through vs membership) previously each
    # attached their exact counterpart with its own single-row
    # broadcast join AND re-planned shared subtrees per union leg
    # (the bottom-k TakeOrdered pipeline executed twice). The exact
    # scalars AND the bloom pass-through counts now fold into ONE
    # aggregate over the bloom-probed events scan (the added
    # might_contain/actual columns are map-side broadcast
    # attachments, so count_distinct/percentile see the identical
    # row multiset), the one-row frames chain through two single-row
    # broadcast attachments, and the four output rows come from one
    # explode(array(struct...)) — nothing re-planned.
    exacts = flagged.agg(
        F.count_distinct("user_id").cast("long").alias("exact_distinct"),
        F.expr("percentile(value, 0.5)").alias("p50x"),
        F.expr("percentile(value, 0.95)").alias("p95x"),
        F.sum(F.when(F.col("might_contain"), 1).otherwise(0))
        .cast("double")
        .alias("n_maybe"),
        F.sum(F.when(F.col("actual"), 1).otherwise(0)).cast("double").alias("n_actual"),
    )
    def _row(sketch: str, key: str, estimate, exact, rel_err):
        return F.struct(
            F.lit(sketch).alias("sketch"),
            F.lit(key).alias("key"),
            estimate.alias("estimate"),
            exact.alias("exact"),
            rel_err.alias("rel_err"),
        )

    scalar_rows = (
        est.crossJoin(F.broadcast(exacts))
        .crossJoin(F.broadcast(bkq))
        .select(
            F.explode(
                F.array(
                    _row(
                        "hll_distinct_users",
                        "user_id",
                        F.col("hll_estimate"),
                        F.col("exact_distinct").cast("double"),
                        (F.col("hll_estimate") - F.col("exact_distinct"))
                        / F.col("exact_distinct"),
                    ),
                    _row(
                        "bottomk_p50",
                        "value",
                        F.col("p50e"),
                        F.col("p50x"),
                        (F.col("p50e") - F.col("p50x")) / F.col("p50x"),
                    ),
                    _row(
                        "bottomk_p95",
                        "value",
                        F.col("p95e"),
                        F.col("p95x"),
                        (F.col("p95e") - F.col("p95x")) / F.col("p95x"),
                    ),
                    _row(
                        "bloom_prefilter",
                        "user_id",
                        F.col("n_maybe"),
                        F.col("n_actual"),
                        (F.col("n_maybe") - F.col("n_actual"))
                        / F.greatest(F.col("n_actual"), F.lit(1.0)),
                    ),
                )
            ).alias("r")
        )
        .select("r.*")
    )
    return scalar_rows.unionByName(cms_rows).unionByName(by_rows)
