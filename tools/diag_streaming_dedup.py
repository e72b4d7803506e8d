"""Per-cycle cost decomposition of streaming_dedup_join (r13 verdict
next-round #4): is the query's wall time a data-independent fixed term
(checkpoint commits + state-store setup per availableNow cycle) or does
it scale with the corpus?

Times each phase of the registered query's exact shape — ingest write,
dedup cycle 1 (2x events), dedup cycle 2 (1x events), the stream-stream
join cycle, and the batch re-reads — at one or more SF dirs, with the
same session posture the query itself pins (shuffle partitions = 32 for
the stateful stages). Optionally overrides the state store provider
(SPARK_GRAFT_STATE_PROVIDER=rocksdb) to A/B HDFS-backed vs RocksDB.

Usage: python tools/diag_streaming_dedup.py [sf_dir ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def run(spark, sf_dir: str) -> dict[str, float]:
    from white_elephant_spark.sources.catalog import load_table
    from white_elephant_spark.streaming import dedup_stream as ds
    from white_elephant_spark.streaming import join_stream as js

    root = os.path.join("/tmp", "diag_streaming_dedup")
    shutil.rmtree(root, ignore_errors=True)
    inp, out, jout, ckpt, jckpt = (
        os.path.join(root, d) for d in ("in", "out", "jout", "ckpt", "jckpt")
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    t: dict[str, float] = {}
    try:
        t0 = time.time()
        ev.unionAll(ev).write.mode("append").parquet(inp)
        t["ingest_write_2x"] = time.time() - t0

        t0 = time.time()
        ds.run_dedup_cycle(spark, inp, out, ckpt, horizon="60 days")
        t["dedup_cycle1"] = time.time() - t0

        t0 = time.time()
        ev.write.mode("append").parquet(inp)
        t["ingest_write_1x"] = time.time() - t0

        t0 = time.time()
        ds.run_dedup_cycle(spark, inp, out, ckpt, horizon="60 days")
        t["dedup_cycle2"] = time.time() - t0

        dd = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", "1000000")
            .parquet(out)
        )
        joined = js.windowed_stream_join(
            dd.filter(F.col("event_type") == "click"),
            dd.filter(F.col("event_type") == "error"),
            key="user_id",
            window="10 minutes",
        )
        t0 = time.time()
        q = (
            joined.writeStream.outputMode("append")
            .option("checkpointLocation", jckpt)
            .foreachBatch(lambda df, _e: df.write.mode("append").parquet(jout))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t["join_cycle"] = time.time() - t0

        t0 = time.time()
        n_out = spark.read.parquet(out).count()
        n_j = spark.read.parquet(jout).count() if os.path.isdir(jout) else 0
        t["batch_rereads"] = time.time() - t0
        t["_rows_out"] = float(n_out)
        t["_rows_join"] = float(n_j)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        shutil.rmtree(root, ignore_errors=True)
    return t


def main() -> None:
    from white_elephant_spark.session import get_spark

    provider = os.environ.get("SPARK_GRAFT_STATE_PROVIDER", "")
    extra = {"spark.sql.adaptive.enabled": "false"}
    if provider == "rocksdb":
        extra["spark.sql.streaming.stateStore.providerClass"] = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        extra[
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        ] = "true"
    spark = get_spark("diag-streaming-dedup", shuffle_partitions=8, extra_conf=extra)
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    reps = int(os.environ.get("DIAG_REPS", "2"))
    for sf_dir in dirs:
        for r in range(reps):
            t = run(spark, sf_dir)
            parts = " ".join(
                f"{k}={v:.2f}" for k, v in t.items() if not k.startswith("_")
            )
            total = sum(v for k, v in t.items() if not k.startswith("_"))
            print(
                f"RESULT {sf_dir} rep{r} provider={provider or 'hdfs'} "
                f"total={total:.2f} {parts} rows_out={t['_rows_out']:.0f} "
                f"rows_join={t['_rows_join']:.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
