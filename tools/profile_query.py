"""Profile one or more registered queries with bench-identical session
settings: run each N times, print every run's wall time, and optionally
dump the formatted physical plan.

Usage: python tools/profile_query.py [--explain] [--runs N] name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    args = [a for a in args if a != "--explain"]
    runs = 3
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from white_elephant_spark.plans.registry import all_queries
    from white_elephant_spark.session import get_spark

    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "8"))
    spark = get_spark(
        "profile",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in args:
        q = qs[name]
        ts = []
        for _ in range(runs):
            t0 = time.time()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: {ts}")
        if explain:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            print(plan)


if __name__ == "__main__":
    main()
