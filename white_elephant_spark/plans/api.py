"""Thin serving API — the reference's Sinatra routes as functions.

Mirrors server/app.rb:
- ``/api/clusters``  (:39-42)  → :meth:`UsageApi.clusters`
- ``/api/users``     (:32-37)  → :meth:`UsageApi.users`
- ``/api/usage``     (:44-107) → :meth:`UsageApi.usage` — same JSON
  shape: ``{times, users: [{user, data}], users_aggregated,
  num_aggregated_users, cluster}``
- ``/api/table``     (:110-157)→ :meth:`UsageApi.table_csv` — header
  ``time,user1,...``, local %Y-%m-%d dates, minutes→hours

:mod:`white_elephant_spark.server` wraps these 1:1 as a listening
``ThreadingHTTPServer`` (``python -m white_elephant_spark serve``);
everything heavy stays in Spark. Roll-ups are memoized via :class:`QueryCache` keyed by
(cluster, unit, zone, metric) — the user list deliberately excluded
(usage_data.rb:442-454 note), filtered post-cache.
"""

from __future__ import annotations

from datetime import timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from white_elephant_spark.plans import serving
from white_elephant_spark.plans.cache import QueryCache
from white_elephant_spark.plans.metrics import rollup_by_time


class UsageApi:
    def __init__(self, spark: SparkSession, cube: DataFrame, max_cache_entries: int = 64):
        self.spark = spark
        self.cube = cube
        self.cache = QueryCache(max_cache_entries)

    # -- dimension endpoints (A9) ------------------------------------
    def clusters(self) -> list[str]:
        rows = self.cube.select("cluster").distinct().orderBy("cluster").collect()
        return [r["cluster"] for r in rows]

    def users(self, cluster: str) -> list[str]:
        rows = (
            self.cube.filter(F.col("cluster") == cluster)
            .select("user")
            .distinct()
            .orderBy("user")
            .collect()
        )
        return [r["user"] for r in rows]

    # -- series machinery --------------------------------------------
    def _series(self, cluster: str, unit: str, zone: str, metric: str) -> DataFrame:
        key = (cluster, unit, zone, metric)
        return self.cache.get_or_build(
            key, lambda: rollup_by_time(self.cube, metric, cluster, unit, zone)
        )

    def _dense(
        self,
        cluster: str,
        unit: str,
        zone: str,
        metric: str,
        start_ms: int,
        end_ms: int,
        users: list[str],
        users_to_aggregate: list[str] | None,
    ) -> DataFrame:
        series = self._series(cluster, unit, zone, metric)
        clamp = serving.clamp_range(self.cube.filter(F.col("cluster") == cluster))
        axis = serving.dense_axis(self.spark, unit, zone, start_ms, end_ms, clamp=clamp)
        return serving.timeseries(series, axis, users, users_to_aggregate)

    # -- /api/usage (S10) --------------------------------------------
    def usage(
        self,
        start_ms: int,
        end_ms: int,
        unit: str,
        zone: str,
        users: list[str],
        cluster: str,
        metric: str = "minutesTotal",
        users_to_aggregate: list[str] | None = None,
    ) -> dict[str, Any]:
        dense = self._dense(
            cluster, unit, zone, metric, start_ms, end_ms, users, users_to_aggregate
        ).collect()
        buckets = sorted({r["bucket"] for r in dense})
        # Buckets come back as naive datetimes that *are* UTC instants
        # (the cube stores hour-aligned UTC); pin the conversion so the
        # reference's epoch-ms-UTC contract (server/app.rb:80-106)
        # holds on non-UTC driver hosts too — datetime.timestamp()
        # alone would re-interpret them in the OS zone.
        times = [int(b.replace(tzinfo=timezone.utc).timestamp() * 1000) for b in buckets]
        idx = {b: i for i, b in enumerate(buckets)}
        per_user: dict[str, list[float]] = {}
        for r in dense:
            per_user.setdefault(r["userName"], [0.0] * len(buckets))[idx[r["bucket"]]] = r[
                "value"
            ]
        agg = per_user.pop("__other__", None)
        return {
            "times": times,
            "users": [
                {"user": u, "data": per_user[u]} for u in users if u in per_user
            ],
            "users_aggregated": agg,
            "num_aggregated_users": len(users_to_aggregate or []),
            "cluster": cluster,
        }

    # -- /api/table (S11) --------------------------------------------
    def table_csv(
        self,
        start_ms: int,
        end_ms: int,
        unit: str,
        zone: str,
        users: list[str],
        cluster: str,
        metric: str = "minutesTotal",
    ) -> str:
        series = self._series(cluster, unit, zone, metric)
        clamp = serving.clamp_range(self.cube.filter(F.col("cluster") == cluster))
        axis = serving.dense_axis(self.spark, unit, zone, start_ms, end_ms, clamp=clamp)
        rows = serving.csv_table(series, axis, users, zone, to_hours=True).collect()
        out = ["time," + ",".join(users)]
        for r in rows:
            out.append(r["time"] + "," + ",".join(f"{r[u]:g}" for u in users))
        return "\n".join(out) + "\n"

    def on_data_loaded(self) -> None:
        """I4 — invalidate cached roll-ups after a refresh."""
        self.cache.invalidate()
