"""applyInPandasWithState job sessionization: running updates, then
event-time-timeout closure across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from white_elephant_spark.streaming import stateful

HOUR = 3_600_000
SCHEMA = "jobId string, startTime long, finishTime long"


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _run(spark, inp, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    q = (
        stateful.sessionize_jobs(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _e: df.write.mode("append").parquet(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_null_gated_trigger_with_stale_timeout_does_not_kill_query(spark, tmp_path):
    """Regression: when EVERY row of a trigger for a key dies on the
    null gate, the state's `last` is stale while the watermark —
    advanced by other keys — may already exceed last+gap. An unclamped
    setTimeoutTimestamp then raises INVALID_TIMEOUT_TIMESTAMP inside
    the UDF and one malformed row kills the whole streaming query
    (reproduced before the clamp). Two single-file triggers in ONE run
    so no no-data batch closes the session in between: file 1 = A's
    valid session + a far-future key C (watermark to ~4h); file 2 = an
    admitted A row with null startTime. The query must survive, drop
    the row, and still close A by timeout."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(
        [("A", 0, HOUR // 2), ("C", 5 * HOUR, 5 * HOUR + 60000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(
        [("A", None, 4 * HOUR + 30 * 60000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    # file 3 advances the watermark past A's clamped timeout so the
    # session still closes inside this run (via the no-data batch).
    spark.createDataFrame(
        [("C", 6 * HOUR, 6 * HOUR + 60000)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(inp)
    )
    q = (
        stateful.sessionize_jobs(stream, gap="30 minutes", watermark="1 hour")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(lambda df, _e: df.write.mode("append").parquet(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # unclamped: raises StreamingQueryException here

    rows = spark.read.parquet(out).collect()
    a_final = [r for r in rows if r["jobId"] == "A" and r["final"]]
    # A closed by the clamped timeout; the null-timed row never counted
    assert len(a_final) == 1
    assert a_final[0]["nAttempts"] == 1 and a_final[0]["lastFinish"] == HOUR // 2


def test_sessionize_running_then_final(spark, tmp_path):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # job A: two attempts ending by t=1h; job B: active out at t=5h
    _write(
        spark,
        [("A", 0, HOUR // 2), ("A", HOUR // 2, HOUR), ("B", 5 * HOUR, 5 * HOUR + 60000)],
        inp,
    )
    _run(spark, inp, out, ckpt)
    running = {r["jobId"]: r for r in spark.read.parquet(out).filter(~F.col("final")).collect()}
    assert running["A"]["nAttempts"] == 2
    assert running["A"]["firstStart"] == 0 and running["A"]["lastFinish"] == HOUR
    assert running["B"]["nAttempts"] == 1

    # new attempt for B only; watermark (≈ 5h - 1h = 4h) is far past
    # A's timeout (1h + 30min) → A closes with final=True
    _write(spark, [("B", 6 * HOUR, 6 * HOUR + 60000)], inp)
    _run(spark, inp, out, ckpt)

    final = {r["jobId"]: r for r in spark.read.parquet(out).filter(F.col("final")).collect()}
    assert set(final) == {"A"}
    assert final["A"]["nAttempts"] == 2 and final["A"]["lastFinish"] == HOUR
    # B kept running: its second batch row accumulates state
    b_rows = [
        r
        for r in spark.read.parquet(out).filter(~F.col("final")).collect()
        if r["jobId"] == "B"
    ]
    assert max(r["nAttempts"] for r in b_rows) == 2
