"""Streaming cube refresh: file-diff ingest, cross-run state,
watermark late-data eviction (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from white_elephant_spark.streaming import cube_stream as cs

HOUR = 3_600_000


def _attempts(spark, rows):
    return spark.createDataFrame(
        [
            (
                "j1", "t1", aid, "u0", "c1", "MAP", "SUCCESS", False, s, f,
                {"CPU_MILLISECONDS": f - s, "SPILLED_RECORDS": 0, "REDUCE_SHUFFLE_BYTES": 3},
            )
            for aid, s, f in rows
        ],
        cs.ATTEMPT_SCHEMA,
    )


def test_two_runs_match_batch_recompute(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "cube", "ckpt"))
    gen1 = [("a1", 1 * HOUR, 3 * HOUR), ("a2", 5 * HOUR + 600_000, 5 * HOUR + 1_200_000)]
    gen2 = [("a3", 2 * HOUR + 1800_000, 3 * HOUR + 1800_000)]  # overlaps a1's hour 2

    _attempts(spark, gen1).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.agg(F.sum("elapsedMs")).first()[0] == 2 * HOUR + 600_000

    _attempts(spark, gen2).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt)  # checkpoint: only gen2 files read

    got = spark.read.parquet(out).drop("day")
    # full-batch recompute over all attempts
    from white_elephant_spark.operators import usage

    full = usage.aggregate_usage_exact(
        usage.explode_attempt_hours(
            usage.filter_usable_attempts(_attempts(spark, gen1 + gen2))
        )
    )
    a = sorted(map(tuple, got.select(*full.columns).collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b


def test_watermark_drops_late_rows(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "cube", "ckpt"))
    # run 1: buckets at hour 1 and hour 48 → watermark advances to ~46h
    _attempts(
        spark, [("a1", 1 * HOUR, 2 * HOUR), ("a2", 48 * HOUR, 49 * HOUR)]
    ).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt, watermark="2 hours")

    # run 2: a late attempt back at hour 1 — older than the watermark
    _attempts(spark, [("late", 1 * HOUR, 2 * HOUR)]).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt, watermark="2 hours")

    got = spark.read.parquet(out).filter(F.hour("time") == 1).agg(F.sum("elapsedMs"))
    # hour-1 bucket still holds only a1's contribution
    assert got.first()[0] == HOUR
