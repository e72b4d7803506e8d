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


# ------------------------------------------------- stream-stream join


def test_windowed_stream_join_streaming_matches_batch(spark, tmp_path):
    """The watermarked stream-stream join must emit exactly the pairs
    the same join yields on the at-rest data (batch twin), and run as
    a genuine streaming query (append mode, bounded state)."""
    import datetime as dt

    from white_elephant_spark.streaming.join_stream import windowed_stream_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, minute, uid, etype):
        return (eid, t0 + dt.timedelta(minutes=minute), uid, etype)

    rows = [
        ev(1, 0, 1, "click"),
        ev(2, 5, 1, "error"),    # within 10 min of click 1 → pair
        ev(3, 20, 1, "error"),   # > 10 min after click 1 → no pair
        ev(4, 18, 2, "click"),
        ev(5, 19, 2, "error"),   # pairs with click 4
        ev(6, 19, 3, "error"),   # no click for user 3
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    batch = spark.createDataFrame(rows, schema)
    clicks_b = batch.filter(F.col("event_type") == "click")
    errors_b = batch.filter(F.col("event_type") == "error")
    expected = sorted(
        (r.l_event_id, r.r_event_id)
        for r in windowed_stream_join(clicks_b, errors_b).collect()
    )
    assert expected == [(1, 2), (4, 5)]

    src = str(tmp_path / "src")
    batch.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    joined = windowed_stream_join(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "error"),
    )
    out = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.l_event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    )
    assert got == expected


def test_sliding_window_stream_counts_match_batch(spark, tmp_path):
    """Sliding-window aggregation (1h window, 15m slide) under a
    watermark: each event lands in 4 overlapping windows; streaming
    totals must equal the batch twin of the same window spec."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=7 * i), i % 3, "e", float(i))
        for i in range(40)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    batch = spark.createDataFrame(rows, schema)
    win = F.window("ts", "1 hour", "15 minutes")
    expected = sorted(
        (r.window.start, r.window.end, r.n)
        for r in batch.groupBy(win).agg(F.count("*").alias("n")).collect()
    )
    # every event contributes to exactly 60/15 = 4 windows
    assert sum(n for _, _, n in expected) == 4 * len(rows)

    src = str(tmp_path / "src")
    batch.write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(win)
        .agg(F.count("*").alias("n"))
        .select("window.start", "window.end", "n")
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.start, r.end, r.n) for r in spark.read.parquet(out).collect()
    )
    # append mode only emits windows the watermark has closed; with
    # availableNow the final watermark closes all but the last open
    # windows — compare the emitted subset against the batch twin
    exp_map = {(s, e): n for s, e, n in expected}
    assert len(got) > 0
    for s, e, n in got:
        assert exp_map[(s, e)] == n


# ---------------------------------------------------------------------------
# Fault injection on the I5 upsert sink: the reference loads each file
# atomically and re-loads changed files idempotently
# (usage_file_load_task.rb:150-163 delete-then-reload); the streaming
# twin must survive a kill at every point of the upsert — before the
# write, mid-write (tasks aborted, nothing committed), after a partial
# partition rewrite, and a full batch REPLAY after checkpoint loss —
# with no duplicate keys and no lost partitions.
# ---------------------------------------------------------------------------


def _cube(spark, rows):
    from white_elephant_spark.operators import usage

    return usage.aggregate_usage_exact(
        usage.explode_attempt_hours(usage.filter_usable_attempts(_attempts(spark, rows)))
    )


def _snapshot(spark, path):
    df = spark.read.parquet(path).drop("day")
    return sorted(map(tuple, df.select(sorted(df.columns)).collect()))


def _assert_keys_unique(spark, path):
    from white_elephant_spark.operators import usage

    dup = (
        spark.read.parquet(path)
        .groupBy(*usage.KEY_COLS)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_upsert_kill_midwrite_initial_load_then_retry(spark, tmp_path):
    # Poisoned rows make write TASKS throw after some tasks already
    # wrote files — Spark's commit protocol must leave no committed
    # partition, and the retry must produce exactly the clean result.
    out = str(tmp_path / "cube")
    gen = [("a1", 1 * HOUR, 3 * HOUR), ("a2", 30 * HOUR, 31 * HOUR)]  # two days
    clean = _cube(spark, gen)
    poisoned = clean.withColumn(
        "elapsedMs",
        F.when(
            F.to_date("time") > F.lit("1970-01-01").cast("date"),
            F.raise_error(F.lit("injected mid-write kill")).cast("long"),
        ).otherwise(F.col("elapsedMs")),
    )
    import pytest

    with pytest.raises(Exception, match="injected mid-write kill"):
        cs.upsert_batch(poisoned, out)
    # no committed partition dirs from the aborted job
    import os

    committed = [d for d in os.listdir(out) if d.startswith("cluster=")] if os.path.isdir(out) else []
    assert committed == []

    cs.upsert_batch(clean, out)  # retry of the same epoch, clean
    got = _snapshot(spark, out)
    want = sorted(map(tuple, clean.select(sorted(clean.columns)).collect()))
    assert got == want
    _assert_keys_unique(spark, out)


def test_upsert_kill_mid_merge_leaves_old_cube_intact(spark, tmp_path):
    # Kill DURING the incremental upsert (the poison fires while the
    # merge materializes, before any file of the overwrite lands): the
    # previously-committed cube must read back bit-identical, and the
    # retried epoch must converge to the batch recompute.
    out = str(tmp_path / "cube")
    gen1 = [("a1", 1 * HOUR, 3 * HOUR), ("a2", 30 * HOUR, 31 * HOUR)]
    cs.upsert_batch(_cube(spark, gen1), out)
    before = _snapshot(spark, out)

    gen2 = [("a3", 2 * HOUR + 1800_000, 3 * HOUR + 1800_000)]  # updates day 1
    upd = _cube(spark, gen1 + gen2)
    poisoned = upd.withColumn(
        "cpuMsProrated",
        F.when(
            F.col("elapsedMs") >= 0,
            F.raise_error(F.lit("injected upsert kill")).cast("long"),
        ).otherwise(F.col("cpuMsProrated")),
    )
    import pytest

    with pytest.raises(Exception, match="injected upsert kill"):
        cs.upsert_batch(poisoned, out)
    assert _snapshot(spark, out) == before  # nothing lost, nothing torn

    cs.upsert_batch(upd, out)  # retry
    want = sorted(map(tuple, upd.select(sorted(upd.columns)).collect()))
    assert _snapshot(spark, out) == want
    _assert_keys_unique(spark, out)


def test_upsert_partial_partition_rewrite_then_full_rerun(spark, tmp_path):
    # The half-committed crash state dynamic overwrite can leave: ONE
    # affected day partition already rewritten, the other not. Rerunning
    # the full batch (what Structured Streaming does after a crash —
    # same epoch, same data) must converge with no duplicates.
    out = str(tmp_path / "cube")
    gen1 = [("a1", 1 * HOUR, 3 * HOUR), ("a2", 30 * HOUR, 31 * HOUR)]
    cs.upsert_batch(_cube(spark, gen1), out)

    gen2 = [
        ("a3", 2 * HOUR + 1800_000, 3 * HOUR + 1800_000),  # updates day 1
        ("a4", 30 * HOUR + 600_000, 30 * HOUR + 1_200_000),  # updates day 2
    ]
    upd = _cube(spark, gen1 + gen2)
    # crash after only day-1's partition was rewritten
    cs.upsert_batch(upd.filter(F.to_date("time") == F.lit("1970-01-01").cast("date")), out)
    # epoch retry: the full batch again
    cs.upsert_batch(upd, out)

    want = sorted(map(tuple, upd.select(sorted(upd.columns)).collect()))
    assert _snapshot(spark, out) == want
    _assert_keys_unique(spark, out)


def test_refresh_replay_after_checkpoint_loss_is_idempotent(spark, tmp_path):
    # Lose the checkpoint AFTER a successful refresh: the file source
    # re-reads every input file and the upsert replays every key. The
    # cube must come out unchanged — replacement semantics, not append.
    import shutil

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "cube", "ckpt"))
    gen1 = [("a1", 1 * HOUR, 3 * HOUR)]
    gen2 = [("a3", 2 * HOUR + 1800_000, 3 * HOUR + 1800_000)]
    _attempts(spark, gen1).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt)
    _attempts(spark, gen2).write.mode("append").parquet(inp)
    cs.run_refresh(spark, inp, out, ckpt)
    expected = _snapshot(spark, out)

    shutil.rmtree(ckpt)  # checkpoint gone: full replay of all files
    cs.run_refresh(spark, inp, out, str(tmp_path / "ckpt2"))
    assert _snapshot(spark, out) == expected
    _assert_keys_unique(spark, out)


# ------------------- fault injection: dedup / join state-store paths
# (The cube upsert's kill/retry suite above covers the foreachBatch
# sink; these cover the OTHER recovery mechanism — the keyed state
# store + file-source WAL. Two real crash windows per stream:
#   1. task failure MID-BATCH: the offset log has pinned the batch's
#      file list, no sink commit, no state commit → restart replays
#      the identical micro-batch against the prior state version;
#   2. crash BETWEEN sink commit and commit-log write: the parquet
#      sink's _spark_metadata already records the batch → the replay
#      must not double its rows.)


def _drop_last_commit(commits_dir):
    """Remove the highest-numbered commit marker plus any sidecar
    files for it (Spark 4's ChecksumCheckpointFileManager writes
    ``N.checksum`` next to ``N`` — leaving either half makes the
    replay see a torn, not missing, commit)."""
    import os

    last = max(
        (f for f in os.listdir(commits_dir) if f.isdigit()), key=int
    )
    for f in os.listdir(commits_dir):
        # marker "N", checksum "N.checksum", Hadoop CRC ".N.crc"
        if f == last or f.startswith(last + ".") or f.startswith(f".{last}."):
            os.remove(os.path.join(commits_dir, f))


def _write_events(spark, rows, path, mode="append"):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (eid, t0 + dt.timedelta(minutes=m), uid, etype, 1.0)
        for eid, m, uid, etype in rows
    ]
    from white_elephant_spark.streaming.dedup_stream import EVENT_SCHEMA

    df = spark.createDataFrame(data, EVENT_SCHEMA)
    df.write.mode(mode).parquet(path)
    return df


def _single_parquet_file(spark, rows, dest, tmp_path, tag):
    """One self-contained .parquet FILE (not a directory) with the
    event schema — what the in-place fix of a corrupt file needs.
    coalesce(1) so the single part file actually HOLDS the rows (a
    multi-part write puts them in one shard and empties the rest)."""
    import datetime as dt
    import glob
    import shutil

    from white_elephant_spark.streaming.dedup_stream import EVENT_SCHEMA

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (eid, t0 + dt.timedelta(minutes=m), uid, etype, 1.0)
        for eid, m, uid, etype in rows
    ]
    staging = str(tmp_path / f"_stage_{tag}")
    spark.createDataFrame(data, EVENT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(staging)
    part = glob.glob(staging + "/part-*.parquet")[0]
    shutil.copyfile(part, dest)


def test_dedup_stream_kill_midbatch_then_replay_exactly_once(spark, tmp_path):
    import os

    import pytest

    from white_elephant_spark.streaming import dedup_stream as ds

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    # cycle 1: three events, one intra-batch duplicate delivery
    _write_events(spark, [(1, 0, 1, "a"), (2, 1, 1, "b"), (1, 0, 1, "a")], inp)
    ds.run_dedup_cycle(spark, inp, out, ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2]

    # cycle 2: new event + re-delivery of event 1, PLUS a file the
    # batch cannot read — the batch's offset entry pins all three
    # files, then a read task throws mid-batch: no sink commit, no
    # state commit.
    _write_events(spark, [(3, 2, 2, "c"), (1, 0, 1, "a")], inp)
    poison = os.path.join(inp, "zz-injected.parquet")
    with open(poison, "wb") as fh:
        fh.write(b"this is not a parquet file")
    with pytest.raises(Exception):
        ds.run_dedup_cycle(spark, inp, out, ckpt)
    # the aborted batch must not have published rows
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2]

    # operator fixes the file IN PLACE (same path the WAL pinned) with
    # one more re-delivery of a seen key; restart replays the same
    # micro-batch against the surviving state.
    _single_parquet_file(spark, [(2, 1, 1, "b")], poison, tmp_path, "fix")
    ds.run_dedup_cycle(spark, inp, out, ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3]

    # state not lost: a third cycle of pure re-deliveries emits nothing
    _write_events(spark, [(1, 0, 1, "a"), (2, 1, 1, "b"), (3, 2, 2, "c")], inp)
    ds.run_dedup_cycle(spark, inp, out, ckpt)
    assert sorted(
        r.event_id for r in spark.read.parquet(out).collect()
    ) == [1, 2, 3]


def test_dedup_stream_commitlog_loss_replays_without_duplicates(spark, tmp_path):
    # Crash window 2: batch fully processed and the parquet sink's
    # _spark_metadata committed, but the checkpoint's commit marker was
    # never written. Restart replays the batch; the sink's own log must
    # swallow the duplicate delivery (exactly-once end to end).
    import os

    from white_elephant_spark.streaming import dedup_stream as ds

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    _write_events(spark, [(1, 0, 1, "a"), (2, 1, 1, "b")], inp)
    ds.run_dedup_cycle(spark, inp, out, ckpt)
    _write_events(spark, [(3, 2, 2, "c"), (2, 1, 1, "b")], inp)
    ds.run_dedup_cycle(spark, inp, out, ckpt)
    expected = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert expected == [1, 2, 3]

    # simulate the crash: drop the LAST commit marker (and its
    # checksum sidecar — Spark 4's ChecksumCheckpointFileManager)
    _drop_last_commit(os.path.join(ckpt, "commits"))
    ds.run_dedup_cycle(spark, inp, out, ckpt)  # replays the batch
    assert (
        sorted(r.event_id for r in spark.read.parquet(out).collect()) == expected
    )


def _join_cycle(spark, ldir, rdir, out, ckpt):
    from white_elephant_spark.streaming.dedup_stream import (
        EVENT_SCHEMA,
        read_event_stream,
    )
    from white_elephant_spark.streaming.join_stream import windowed_stream_join

    joined = windowed_stream_join(
        read_event_stream(spark, ldir), read_event_stream(spark, rdir)
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_join_stream_kill_midbatch_replay_pairs_once_state_intact(spark, tmp_path):
    import os

    import pytest

    ldir, rdir, out, ckpt = (str(tmp_path / d) for d in ("l", "r", "out", "ckpt"))
    # cycle 1: a click buffers in left state; no right side yet
    _write_events(spark, [(10, 0, 1, "click")], ldir)
    _write_events(spark, [(90, 0, 9, "error")], rdir)  # user 9: never pairs
    _join_cycle(spark, ldir, rdir, out, ckpt)
    assert spark.read.parquet(out).count() == 0

    # cycle 2: the matching error arrives — but a corrupt right-side
    # file kills the batch after the WAL pinned it
    _write_events(spark, [(20, 5, 1, "error")], rdir)
    poison = os.path.join(rdir, "zz-injected.parquet")
    with open(poison, "wb") as fh:
        fh.write(b"garbage")
    with pytest.raises(Exception):
        _join_cycle(spark, ldir, rdir, out, ckpt)
    assert spark.read.parquet(out).count() == 0  # nothing published

    # fix in place (another error for the SAME click — both must pair,
    # proving the click survived in buffered state across the crash)
    _single_parquet_file(spark, [(21, 6, 1, "error")], poison, tmp_path, "jfix")
    _join_cycle(spark, ldir, rdir, out, ckpt)
    got = sorted(
        (r.l_event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    )
    assert got == [(10, 20), (10, 21)]

    # replaying re-delivered right rows must not re-emit pairs: the
    # stream-stream join keys buffered rows exactly-once per input row
    _write_events(spark, [(20, 5, 1, "error")], rdir)
    _join_cycle(spark, ldir, rdir, out, ckpt)
    got2 = sorted(
        (r.l_event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    )
    # the re-delivered error is a NEW input row to the join (the join
    # dedups nothing by itself — that's dedup_stream's contract
    # upstream); what must hold is determinism: exactly one new pair,
    # no replay of old ones
    assert got2 == [(10, 20), (10, 20), (10, 21)]


def test_join_stream_commitlog_loss_replays_without_duplicate_pairs(spark, tmp_path):
    import os

    ldir, rdir, out, ckpt = (str(tmp_path / d) for d in ("l", "r", "out", "ckpt"))
    _write_events(spark, [(10, 0, 1, "click"), (11, 1, 2, "click")], ldir)
    _write_events(spark, [(20, 5, 1, "error"), (21, 6, 2, "error")], rdir)
    _join_cycle(spark, ldir, rdir, out, ckpt)
    expected = sorted(
        (r.l_event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    )
    assert expected == [(10, 20), (11, 21)]

    _drop_last_commit(os.path.join(ckpt, "commits"))
    _join_cycle(spark, ldir, rdir, out, ckpt)  # replay of the same batch
    got = sorted(
        (r.l_event_id, r.r_event_id) for r in spark.read.parquet(out).collect()
    )
    assert got == expected
