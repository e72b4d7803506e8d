"""Dump `.explain("formatted")` for headline queries to a directory.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Bench-identical session (8 shuffle partitions, AQE off) so the plans
match what bench.py times. Writes <out_dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from white_elephant_spark.plans.registry import all_queries
    from white_elephant_spark.session import get_spark

    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "8"))
    spark = get_spark(
        "dump_plans",
        shuffle_partitions=parts,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    qs = all_queries()
    names = only or [n for n in bench.HEADLINE if n in qs]
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
