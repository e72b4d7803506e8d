"""Streaming observability (streaming/monitor.py): observe() metrics
inside micro-batches + bounded listener history + on-progress hook."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from white_elephant_spark.streaming.monitor import MetricsListener, with_batch_metrics


def test_batch_metrics_and_listener(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 2 == 0).cast("double").alias("value"),
    )
    base.write.mode("overwrite").parquet(src)

    invalidations = []
    listener = MetricsListener(maxlen=8, on_progress=lambda e: invalidations.append(e))
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema("event_id long, value double").parquet(src)
        monitored = with_batch_metrics(
            stream,
            "ingest",
            {
                "rows": F.count(F.lit(1)),
                "nonzero": F.sum((F.col("value") > 0).cast("long")),
            },
        )
        q = (
            monitored.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName("monitored-ingest")
            .start()
        )
        q.awaitTermination(120)
        # Listener events are delivered asynchronously.
        deadline = time.time() + 30
        while time.time() < deadline and listener.observed_total("ingest", "rows") < 100:
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(listener)

    assert listener.observed_total("ingest", "rows") == 100
    assert listener.observed_total("ingest", "nonzero") == 50
    rows_seen = sum(e["num_input_rows"] for e in listener.history)
    assert rows_seen == 100
    assert invalidations and invalidations[-1]["query"] is not None
    assert len(listener.history) <= 8
    assert spark.read.parquet(out).count() == 100
