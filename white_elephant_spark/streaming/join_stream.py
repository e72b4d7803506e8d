"""Watermarked stream-stream join: correlate two live event streams
inside a bounded time window, exactly-once.

The batch as-of/interval joins (``operators/temporal.py``) answer the
at-rest form of this question; ingestion pipelines need the *online*
form — e.g. attribute every ``error`` event to the ``click`` by the
same user that preceded it within the attribution window, while both
sides are still arriving out of order.

Spark-first shape (the Structured Streaming stream-stream inner join):

- both sides carry a **watermark** — the lateness contract that lets
  the state store discard buffered rows once no match can arrive;
- the join condition combines the equality key (shuffle key; both
  sides hash-partition on it, so matching rows co-locate) with a
  **time-range predicate** that bounds how long a row waits — state
  per key is O(window), not O(stream);
- at 100 TB/day the two knobs ARE the capacity plan: watermark bounds
  replay/lateness, the range predicate bounds buffered state. Without
  either, a stream-stream join is an unbounded-memory plan and Spark
  rejects it in append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    window: str = "10 minutes",
    left_watermark: str = "30 minutes",
    right_watermark: str = "30 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Inner-join two streaming DataFrames on ``key`` where the right
    event lands in ``(left_ts, left_ts + window]`` — "right happened
    after left, within the window". Columns are prefixed ``l_``/``r_``
    so both sides survive the join unambiguously.

    Works identically on batch DataFrames (the watermark is a no-op
    there), which is how the oracle/tests pin the semantics.
    """
    lw = left.withWatermark(left_ts, left_watermark).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    rw = right.withWatermark(right_ts, right_watermark).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {window}")
        )
    )
    return lw.join(rw, cond, "inner")
