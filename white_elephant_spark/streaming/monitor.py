"""Streaming observability: per-batch data metrics without extra jobs.

The reference's loader logs progress per file and invalidates its
query cache when a load lands (server/app/usage_loader.rb:165-199 in
/root/reference); its batch jobs count skips via MR counters. The
streaming equivalents are:

- :func:`with_batch_metrics` — ``Dataset.observe`` on a *streaming*
  DataFrame: named aggregates computed inside each micro-batch as it
  executes (no second pass over the batch), surfaced through the
  progress listener.
- :class:`MetricsListener` — a ``StreamingQueryListener`` retaining a
  bounded history of per-batch progress (rows, observed metrics,
  watermark) and firing an optional callback — the hook where the
  reference invalidates its cache (I4) or a deployment emits to its
  metrics system.

Both are control-plane-only: no data-plane cost beyond the observed
aggregates' map-side accumulation, and the listener state is bounded
(``maxlen``), so a long-lived 100 TB/day ingestion can run them
forever.
"""

from __future__ import annotations

import json
from collections import deque
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["with_batch_metrics", "MetricsListener"]


def with_batch_metrics(df: DataFrame, name: str, metrics: dict[str, Column]) -> DataFrame:
    """Attach named per-batch aggregates to a streaming DataFrame.
    They appear in every progress event under
    ``progress.observedMetrics[name]`` (and in
    :class:`MetricsListener` history)."""
    return df.observe(name, *[c.alias(k) for k, c in metrics.items()])


class MetricsListener(StreamingQueryListener):
    """Bounded per-batch progress history + optional on-progress hook.

    ``history`` holds dicts: {query, batch_id, num_input_rows,
    observed, watermark}. ``on_progress(entry)`` runs on the listener
    thread — keep it cheap (cache invalidation, a metrics emit)."""

    def __init__(
        self,
        maxlen: int = 256,
        on_progress: Callable[[dict[str, Any]], None] | None = None,
    ):
        self.history: deque[dict[str, Any]] = deque(maxlen=maxlen)
        self._on_progress = on_progress

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # progress.json is the stable cross-version surface.
        d = json.loads(p.json)
        entry = {
            "query": d.get("name") or d.get("id"),
            "batch_id": d.get("batchId"),
            "num_input_rows": d.get("numInputRows", 0),
            "observed": d.get("observedMetrics", {}),
            "watermark": (d.get("eventTime") or {}).get("watermark"),
        }
        self.history.append(entry)
        if self._on_progress is not None:
            self._on_progress(entry)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def observed_total(self, metric_group: str, key: str) -> int:
        """Sum a named observed metric across retained batches."""
        total = 0
        for e in self.history:
            g = e["observed"].get(metric_group)
            if g and key in g:
                total += int(g[key])
        return total
