"""Sub-stage decomposition of dedup_clusters' simhash leg — the
fifth-decade residual carrier (r12 re-probe: leg 19.1x on 10x data;
net of the linear fingerprint recompute the band+CC+label sub-stages
grow ~37x). Times each sub-stage in isolation at each SF_DIR:

- fps+groups: fingerprint scan, persist materialization, distinct-fp
  collapse (the linear baseline the leg rides on)
- candidates: block-combination explode + self-join + exact Hamming
  filter, WITHOUT the distinct (the raw candidate volume)
- edges: full simhash_neardup_pairs (adds the distinct)
- cc: connected_components over the persisted edge set alone
- label+sink: the final doc->label joins and noop write

Usage: python tools/diag_simhash_leg.py SF_DIR [SF_DIR...]
(env: SPARK_DRIVER_MEM, SPARK_GRAFT_BENCH_PARTS)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from white_elephant_spark.operators import dedup
    from white_elephant_spark.operators.clustering import connected_components
    from white_elephant_spark.plans.text_queries import _docs_with_copies
    from white_elephant_spark.session import get_spark

    spark = get_spark(
        "diag-simhash-leg",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "16")),
    )
    for sf_dir in sys.argv[1:]:
        spark.catalog.clearCache()
        docs = _docs_with_copies(spark, sf_dir)
        t0 = time.time()
        fps = dedup.simhash64(docs).persist()
        groups = (
            fps.groupBy("simhash")
            .agg(F.min("id").alias("fid"))
            .select(F.col("fid").alias("id"), "simhash")
            .persist()
        )
        n_fps = groups.count()
        t_fps = time.time() - t0

        t0 = time.time()
        keys = dedup._block_combo_keys("simhash", 3)
        e = groups.select(
            F.col("id"), F.col("simhash").alias("fp"), F.posexplode(keys).alias("band", "bv")
        )
        a, b = e.alias("a"), e.alias("b")
        ham = F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id"), F.col("b.id"), ham.alias("h"))
        )
        n_cand = cand.count()
        n_hits = cand.where(F.col("h") <= 3).count()
        t_cand = time.time() - t0

        t0 = time.time()
        edges = dedup.simhash_neardup_pairs(groups).persist()
        n_edges = edges.count()
        t_edges = time.time() - t0

        t0 = time.time()
        comp = connected_components(edges)
        n_comp = comp.count()
        t_cc = time.time() - t0

        t0 = time.time()
        comp2 = connected_components(edges)  # state warm: repeat cost
        comp2.count()
        t_cc2 = time.time() - t0

        print(
            f"{os.path.basename(sf_dir)}: fps={n_fps} t_fps={t_fps:.1f}s |"
            f" candidates={n_cand} hits={n_hits} t_cand={t_cand:.1f}s |"
            f" edges={n_edges} t_edges={t_edges:.1f}s (distinct adds"
            f" {t_edges - 0:.1f}s over its own candidate pass) |"
            f" cc_rows={n_comp} t_cc={t_cc:.1f}s t_cc_repeat={t_cc2:.1f}s",
            flush=True,
        )
        fps.unpersist()
        groups.unpersist()
        edges.unpersist()


if __name__ == "__main__":
    main()
