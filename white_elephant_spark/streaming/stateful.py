"""Custom stateful streaming operator: job-run sessionization.

The reference reconstructs job entities by shuffling all of a job's
log fragments to one reducer after the day's logs are complete
(J1, parsing/ParseJobsFromLogs.java:166-170). The streaming analog
can't wait for "complete": attempts trickle in, and a job is *done*
when no new attempt has arrived for a gap of event time.

``applyInPandasWithState`` holds one state row per jobId —
(firstStart, lastFinish, nAttempts) — updated per micro-batch
(Arrow-batched, no per-row Python), and an **event-time timeout**
closes the session: when the watermark passes lastFinish + gap, the
job's final row is emitted and its state evicted. This is the
"custom stateful operator" surface of SURVEY §2.7 (I6) — the shape a
session window can't express directly because the close condition is
per-key, derived from state.

Scale: state is one tiny row per *open* job; eviction is driven by
the watermark, so memory is bounded by the number of jobs active
inside the gap horizon, not by history.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

OUTPUT_SCHEMA = StructType(
    [
        StructField("jobId", StringType()),
        StructField("firstStart", LongType()),
        StructField("lastFinish", LongType()),
        StructField("nAttempts", LongType()),
        StructField("final", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("firstStart", LongType()),
        StructField("lastFinish", LongType()),
        StructField("nAttempts", LongType()),
    ]
)


def _make_update(gap_ms: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (job_id,) = key
        if state.hasTimedOut:
            first, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "jobId": job_id,
                        "firstStart": first,
                        "lastFinish": last,
                        "nAttempts": n,
                        "final": True,
                    }
                ]
            )
            return
        first, last, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            # Null gate: Arrow hands nullable longs to pandas as
            # float64 with NaN — int(NaN) would kill the task (and
            # the whole streaming query), and rows without both times
            # can't bound a session, so they must not count either.
            pdf = pdf.dropna(subset=["startTime", "finishTime"])
            if len(pdf) == 0:
                continue
            lo = int(pdf["startTime"].min())
            hi = int(pdf["finishTime"].max())
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
            n += len(pdf)
        if last is None:
            # every row in this trigger was null-timed and no prior
            # state exists: nothing to bound a session with
            return
        state.update((first, last, n))
        # Close when event time moves `gap` past the last activity —
        # clamped just past the current watermark: when every row of a
        # trigger dies on the null gate, `last` stays at the prior
        # trigger's value while the watermark (advanced by OTHER keys)
        # may already exceed last+gap, and Spark rejects a timeout at
        # or before the watermark with INVALID_TIMEOUT_TIMESTAMP —
        # one malformed row would kill the whole query. Clamping means
        # "this session is already quiet past its close: time it out
        # at the next opportunity", which is the semantics the timeout
        # would have had anyway.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        yield pd.DataFrame(
            [
                {
                    "jobId": job_id,
                    "firstStart": first,
                    "lastFinish": last,
                    "nAttempts": n,
                    "final": False,
                }
            ]
        )

    return update


def sessionize_jobs(
    attempts: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """attempts (streaming; jobId/startTime/finishTime epoch-ms) →
    one running row per job per trigger and a ``final=True`` row when
    the job has been quiet for ``gap`` of event time."""
    gap_ms = _parse_duration_ms(gap)
    with_ts = attempts.withColumn(
        "eventTime", F.timestamp_millis(F.col("finishTime"))
    ).withWatermark("eventTime", watermark)
    return (
        with_ts.groupBy("jobId")
        .applyInPandasWithState(
            _make_update(gap_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_duration_ms(s: str) -> int:
    qty, unit = s.split()
    mult = {
        "millisecond": 1, "milliseconds": 1,
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(qty) * mult
