"""Streaming exactly-once dedup: continuous ingestion that emits each
logical record once, across micro-batches *and* across restarts.

The batch dedup operators (``operators/dedup.py``) assume the corpus
is at rest; an ingestion pipeline instead sees the same record
arrive repeatedly — retried uploads, at-least-once upstreams,
overlapping backfills. Structured Streaming's keyed state store is
the Spark-first answer: ``dropDuplicates`` on the record key keeps a
seen-set in checkpointed state, so re-deliveries are suppressed
within a batch, across batches, and across job restarts
(``availableNow`` cycles), while the watermark bounds the state to
the dedup horizon — at 100 TB/day an unbounded seen-set is a memory
leak, so the horizon *is* the scalability contract: a duplicate
older than the watermark is admitted (and must be caught by the
at-rest batch pass), in exchange for O(horizon) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)


def run_dedup_cycle(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon: str = "30 days",
    observe_name: str | None = None,
) -> None:
    """One ``availableNow`` ingestion cycle: drain all new files,
    emit only records whose key was never seen inside the watermark
    horizon, append to the parquet sink. State (seen keys + watermark)
    lives in the checkpoint and carries to the next cycle.

    ``observe_name`` attaches per-batch data-plane counters
    (:func:`~white_elephant_spark.streaming.monitor.with_batch_metrics`)
    around the dedup state: ``<name>_in.rows`` counts arrivals before
    the seen-set, ``<name>_out.rows`` counts survivors — the
    rows-seen / rows-deduped pair an ingestion dashboard plots, at
    map-side-accumulator cost (no second pass over the batch)."""
    from pyspark.sql import functions as F

    from white_elephant_spark.streaming.monitor import with_batch_metrics

    src = read_event_stream(spark, input_dir)
    if observe_name:
        src = with_batch_metrics(
            src, f"{observe_name}_in", {"rows": F.count(F.lit(1))}
        )
    # dropDuplicatesWithinWatermark, NOT dropDuplicates(["event_id"]):
    # plain key-dedup only evicts state when the event-time column is
    # part of the key, so on bare event_id the watermark would advance
    # while ZERO seen-keys are ever cleaned — unbounded state growth,
    # the exact leak the horizon exists to prevent. The WithinWatermark
    # variant evicts each key once its last sighting falls behind the
    # horizon, which is precisely the documented semantics.
    deduped = src.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    if observe_name:
        deduped = with_batch_metrics(
            deduped, f"{observe_name}_out", {"rows": F.count(F.lit(1))}
        )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
