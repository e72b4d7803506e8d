"""Query-result cache (§3.2 step 3; SURVEY §4 "query-result caching").

The reference memoizes serving-layer query results in an unbounded
Guava cache keyed by the YAML-serialized (method, params)
(server/app/cache_builder.rb:15-49; usage_data.rb:29,442-454), with
two deliberate design points preserved here:

1. **The user list is NOT part of the cache key** — the cached cube
   groups by *all* users; user filtering happens after the cache hit
   (usage_data.rb:62-68), so one cached roll-up serves any user
   selection.
2. **Invalidation on data load** (usage_loader.rb:195-196): the
   loader bumps a generation counter; stale entries are dropped
   lazily.

Spark realization: the cached value is a **persisted DataFrame** (the
grouped cube for one (cluster, unit, zone, metric) shape), so a hit
costs one in-memory scan and the follow-up user filter/shaping stays
distributed. Entries are LRU-bounded (the reference's unbounded cache
is a leak at scale) and unpersisted on eviction/invalidation.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame


class QueryCache:
    """Thread-safe: the HTTP daemon serves concurrent handler threads
    against one cache, so mutation of the LRU map and generation
    counter is serialized under an RLock. ``build()`` itself runs
    under the lock too — concurrent misses on the same key must not
    both ``persist()`` (the loser's frame would leak in the block
    manager); Spark job parallelism is unaffected since the built
    DataFrame's *actions* happen outside the cache."""

    def __init__(self, max_entries: int = 64):
        self.max_entries = max_entries
        self._entries: OrderedDict[tuple, tuple[int, DataFrame]] = OrderedDict()
        self._generation = 0
        self._lock = threading.RLock()
        self.hits = 0
        self.misses = 0

    def get_or_build(self, key: tuple, build: Callable[[], DataFrame]) -> DataFrame:
        """Return the persisted DataFrame for ``key``, building (and
        persisting) it on miss. ``key`` must exclude per-request
        selections that are applied post-cache (the user list)."""
        with self._lock:
            hit = self._entries.get(key)
            if hit is not None and hit[0] == self._generation:
                self._entries.move_to_end(key)
                self.hits += 1
                return hit[1]
            if hit is not None:  # stale generation
                hit[1].unpersist()
                del self._entries[key]
            self.misses += 1
            df = build().persist()
            self._entries[key] = (self._generation, df)
            while len(self._entries) > self.max_entries:
                _, (_, old) = self._entries.popitem(last=False)
                old.unpersist()
            return df

    def invalidate(self) -> None:
        """I4 — called after a data load: all cached results are
        stale (usage_loader.rb:195-196). Lazy: entries unpersist on
        next touch or via clear()."""
        with self._lock:
            self._generation += 1

    def clear(self) -> None:
        with self._lock:
            for _, df in self._entries.values():
                df.unpersist()
            self._entries.clear()


class ReadWriteLock:
    """Drain lock for serving-vs-refresh: many concurrent readers
    (request handlers), one writer (the data refresh) that waits for
    in-flight readers to DRAIN before mutating shared Spark state.

    Why it exists: ``unpersist()`` on a cube that an in-flight query
    is actively scanning removes blocks out from under running tasks
    (local mode: blockNotFound → job failure → 500; a cluster retries
    but re-reads the whole lineage mid-query). The refresh hook must
    therefore run with zero readers in flight — found by the daemon
    soak test, not visible in any single-threaded path.

    A waiting writer also blocks NEW readers (no writer starvation
    under sustained request load); at refresh cadence (minutes-hours)
    the brief queueing is immaterial."""

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self) -> None:
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True

    def release_write(self) -> None:
        with self._cond:
            self._writer = False
            self._cond.notify_all()
