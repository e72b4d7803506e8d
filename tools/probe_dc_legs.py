"""One-off: attribute the sf100->sf200 dedup_clusters 3.9x to its legs.

Single cold run per (stage, sf) -- the growth factor at this magnitude
(minutes-long runs) dwarfs rep noise; clearCache between runs.
Stages reuse the exact builders of the registered query (same pattern
as tools/stage_decompose.py).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from white_elephant_spark.session import get_spark
from white_elephant_spark.operators import dedup
from white_elephant_spark.plans.text_queries import (
    _dc_semantic_leg,
    _dc_simhash_leg,
    _docs_with_copies,
)

parts = int(os.environ.get("SPARK_GRAFT_PROBE_PARTS", "16"))
spark = get_spark("leg-probe", shuffle_partitions=parts,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})

STAGES = [
    ("docs_scan", lambda s, d: _docs_with_copies(s, d)),
    ("simhash_fps", lambda s, d: dedup.simhash64(_docs_with_copies(s, d))),
    ("simhash_leg", _dc_simhash_leg),
    ("semantic_leg", _dc_semantic_leg),
]

for sf_dir in (".scratch/sf100", ".scratch/sf200"):
    for label, build in STAGES:
        spark.catalog.clearCache()
        import gc; gc.collect()
        spark.sparkContext.setJobDescription(f"leg-probe {label} {sf_dir}")
        t0 = time.time()
        build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t = time.time() - t0
        print(f"RESULT {sf_dir} {label} {t:.2f}s", flush=True)
