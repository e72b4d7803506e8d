"""Sub-stage decomposition of dedup_clusters' SemDeDup leg.

The round-13 fifth-decade re-probe measured the semantic leg at
18.1x on 10x data (sf10 27.3s -> sf100 493.4s) — above the 15x flag
line for the first time (r12 measured 13.8x on the same corpora; the
sf10 side has since lost ~6s of memoized fixed cost, which inflates
the ratio). This tool names the carrier by timing each sub-stage in
isolation at each SF_DIR, against the same registry artifacts the
registered query serves (``plans.text_queries._sem_serving``):

- serve: vecs plan + registry read of the blocked cell index
  (parquet load, repartition, persist, count)
- encode+candidates: 6x8 sign-sketch Arrow pass + within-(cell,
  bucket) self-join + distinct (ids only) — the LSH blocking volume
- edges: full neardup_pairs_lsh (adds the two vector re-attach
  joins + exact strict-fold cosine >= 0.95)
- cc: connected_components over the persisted edge set alone
  (reports which path: <=1M edges -> driver union-find, else star
  contraction)
- full leg: the registered plan end-to-end (labeling + sizes + sink)

Usage: python tools/diag_semantic_leg.py SF_DIR [SF_DIR...]
(env: SPARK_DRIVER_MEM, SPARK_GRAFT_BENCH_PARTS)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from white_elephant_spark.operators import similarity
    from white_elephant_spark.operators.clustering import connected_components
    from white_elephant_spark.plans.text_queries import (
        _dc_semantic_leg,
        _sem_serving,
    )
    from white_elephant_spark.session import get_spark

    spark = get_spark(
        "diag-semantic-leg",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "16")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    for sf_dir in sys.argv[1:]:
        spark.catalog.clearCache()
        t0 = time.time()
        vecs, k_cells, cell_model, blocked, n_vecs = _sem_serving(spark, sf_dir)
        n_blocked = blocked.count()
        t_serve = time.time() - t0

        # Candidate generation exactly as neardup_pairs_lsh lays it
        # out (planes=6, tables=8, block_col=cluster_id), stopping
        # before the vector re-attach.
        t0 = time.time()
        bucket_arr = similarity.encoded_buckets_arrow(64, 6, 8)(F.col("embedding"))
        keyed = blocked.select(
            F.col("vec_id").alias("id"),
            F.col("cluster_id").alias("blk"),
            F.explode(bucket_arr).alias("bk"),
        )
        cand = (
            keyed.alias("a")
            .join(
                keyed.alias("b"),
                (F.col("a.bk") == F.col("b.bk"))
                & (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        )
        n_raw = cand.count()
        n_cand = cand.distinct().count()
        t_cand = time.time() - t0

        t0 = time.time()
        edges = (
            similarity.neardup_pairs_lsh(
                blocked,
                threshold=0.95,
                dim=64,
                planes=6,
                tables=8,
                block_col="cluster_id",
                n_rows=n_vecs,
            )
            .select("id_a", "id_b")
            .persist()
        )
        n_edges = edges.count()
        t_edges = time.time() - t0

        t0 = time.time()
        comp = connected_components(edges)
        n_comp = comp.count()
        t_cc = time.time() - t0

        t0 = time.time()
        _dc_semantic_leg(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t_full = time.time() - t0

        print(
            f"{os.path.basename(os.path.normpath(sf_dir))}: blocked={n_blocked}"
            f" k_cells={k_cells} t_serve={t_serve:.1f}s |"
            f" raw_cand={n_raw} cand={n_cand} t_cand={t_cand:.1f}s |"
            f" edges={n_edges} t_edges={t_edges:.1f}s |"
            f" cc_rows={n_comp} t_cc={t_cc:.1f}s"
            f" cc_path={'local' if n_edges * 2 <= 1_000_000 else 'contract'} |"
            f" t_full_leg={t_full:.1f}s",
            flush=True,
        )
        edges.unpersist()


if __name__ == "__main__":
    main()
