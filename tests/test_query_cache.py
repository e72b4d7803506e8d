"""QueryCache: hit reuse, user-filter-out-of-key, invalidation."""

from __future__ import annotations

from pyspark.sql import functions as F

from white_elephant_spark.plans.cache import QueryCache


def test_cache_hit_and_post_cache_user_filter(spark):
    cache = QueryCache()
    builds = []

    def build():
        builds.append(1)
        return spark.createDataFrame(
            [("u1", 10), ("u2", 20), ("u3", 30)], "userName string, value long"
        )

    key = ("alpha", "WEEKS", "UTC", "minutesTotal")  # no user list (§3.2 step 3)
    a = cache.get_or_build(key, build).filter(F.col("userName") == "u1")
    b = cache.get_or_build(key, build).filter(F.col("userName").isin("u2", "u3"))
    assert len(builds) == 1  # one build serves both user selections
    assert a.count() == 1 and b.count() == 2
    assert cache.hits == 1 and cache.misses == 1


def test_invalidation_rebuilds(spark):
    cache = QueryCache()
    builds = []

    def build():
        builds.append(1)
        return spark.range(3)

    cache.get_or_build(("k",), build)
    cache.invalidate()  # data load happened
    cache.get_or_build(("k",), build)
    assert len(builds) == 2
    cache.clear()


def test_lru_eviction(spark):
    cache = QueryCache(max_entries=2)
    for i in range(3):
        cache.get_or_build((i,), lambda i=i: spark.range(i + 1))
    assert len(cache._entries) == 2
    cache.clear()
