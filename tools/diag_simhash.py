"""One-off diagnostic for the fifth-decade simhash_leg growth (17.1x
on 10x data): counts the quantities that separate a real plan defect
from an amplifier artifact at each SF —

- docs / distinct fingerprints (the band join's node count),
- verified near-dup edges between DISTINCT fingerprints (CC input;
  >1M flips connected_components from the driver union-find to the
  distributed loop),
- block-scheme candidate volume Σ_buckets C(occ, 2) (what the join
  actually materializes before the Hamming filter),
- the top duplicate-cluster sizes (a max component that scales with
  the COPY COUNT is the cross-copy-planting signature — cipher-
  invariant texts (empty/punctuation-only) hash identically in every
  copy and collapse, but NEAR-invariant ones can land within Hamming
  3 across copies and plant C(copies, 2) edge mass no real corpus
  has).

Usage: python tools/diag_simhash.py SF_DIR [SF_DIR...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from white_elephant_spark.operators import dedup
    from white_elephant_spark.operators.dedup import _block_combo_keys
    from white_elephant_spark.plans.text_queries import _docs_with_copies
    from white_elephant_spark.session import get_spark

    spark = get_spark(
        "diag-simhash",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "16")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    for sf_dir in sys.argv[1:]:
        docs = _docs_with_copies(spark, sf_dir)
        fps = dedup.simhash64(docs).persist()
        n_docs = docs.count()
        groups = (
            fps.groupBy("simhash")
            .agg(F.min("id").alias("id"))
            .select("id", "simhash")
            .persist()
        )
        n_fps = groups.count()
        cand = (
            groups.select(F.posexplode(_block_combo_keys("simhash", 3)).alias("band", "bv"))
            .groupBy("band", "bv")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("c"))
            .collect()[0]["c"]
        )
        edges = dedup.simhash_neardup_pairs(groups).persist()
        n_edges = edges.count()
        # component sizes via the production path
        from white_elephant_spark.operators.clustering import fingerprint_clusters

        top = (
            fingerprint_clusters(docs, fps.select("id", "simhash"))
            .groupBy("cluster_id")
            .count()
            .orderBy(F.desc("count"))
            .limit(5)
            .collect()
        )
        print(
            f"{os.path.basename(sf_dir)}: docs={n_docs} distinct_fps={n_fps}"
            f" block_candidates={int(cand)} edges={n_edges}"
            f" top_clusters={[r['count'] for r in top]}",
            flush=True,
        )
        fps.unpersist()
        groups.unpersist()
        edges.unpersist()


if __name__ == "__main__":
    main()
