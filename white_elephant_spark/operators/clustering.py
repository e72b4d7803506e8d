"""Duplicate-cluster assembly: connected components over near-dup
pairs.

The dedup operators (``operators/dedup.py``) emit *pairs* — MinHash
band collisions, SimHash Hamming neighbors, embedding near-dups. A
training-data pipeline then needs *clusters*: every transitively
connected group collapsed to one representative so "A≈B, B≈C" drops
both B and C, not just one of them.

Spark-first shape: iterative **min-label propagation** over
DataFrames (the Pregel/GraphX pattern without the RDD API — Spark has
no built-in DataFrame connected-components). Each round is one
shuffle join (edges ⋈ labels on the edge key) plus one groupBy-min;
labels are ``localCheckpoint``-ed per round so the lineage stays flat
and each round's shuffle reuses the previous round's materialized
output. Convergence is O(graph diameter) rounds — near-dup clusters
are dense and shallow (duplicates of one document all link to each
other within 1-2 hops), so 3-5 rounds is typical; ``max_iter`` bounds
the pathological chain case.

This is a driver-side *loop*, not driver-side *data*: per round the
driver runs one count() action for the convergence test; all row data
stays distributed. That is the standard shape for iterative graph
algorithms on Spark (GraphX Pregel does exactly this under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the minimum node id reachable through the undirected
    pair graph (a deterministic canonical representative).

    Nodes not present in any pair are absent — union singletons in at
    the call site (see :func:`attach_clusters`)."""
    spark = pairs.sparkSession
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("label"))
        .select("node", F.least("node", "label").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # Propagate: each node offers its label to every neighbor;
        # a node keeps the min of its own label and all offers.
        offers = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.unionAll(offers)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("cluster_id"))


def attach_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Every document with its duplicate-cluster id and the cluster
    population: (doc_id, cluster_id, cluster_size, is_representative).
    Singletons (no near-dup pair) form their own cluster of size 1.

    The component join is on the document id — at corpus scale the
    label table is |nodes-in-pairs| rows (duplicate mass only, far
    smaller than the corpus), so Catalyst broadcasts it when small and
    hash-joins on the id otherwise."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
        )
    )


def sql_connected_components(pairs_cte: str) -> str:
    """DuckDB oracle twin: transitive closure by recursive CTE over a
    pairs CTE with columns (id_a, id_b); returns (node, cluster_id).
    O(V·E) — oracle-scale only, which is the point: the oracle derives
    the answer by brute closure, independently of the engine's
    iterative algorithm."""
    return f"""
edges AS (
  SELECT id_a AS src, id_b AS dst FROM {pairs_cte}
  UNION
  SELECT id_b AS src, id_a AS dst FROM {pairs_cte}
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
components AS (
  SELECT src AS node, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src
)
"""
