"""General k-means over an embedding column — the user-facing wrapper
around the IVF quantizer's exact distributed Lloyd machinery.

``operators/similarity.py`` already contains everything hard:
deterministic hash-sampled seeding (bounded driver collect),
Arrow-batched assignment against broadcast centroids, and exact
integer-micro-unit cell means (summation-order-independent, so a
cluster re-run reproduces the model bit-for-bit). This module exposes
it as a plain fit/predict pair for corpus segmentation use —
clustering docs by embedding before stratified sampling, building
coarse shards for ANN, topic-bucketing a corpus.

Scale contract: per iteration, one distributed assignment pass plus
one aggregation; only k centroid rows ever reach the driver. Nothing
depends on corpus size except the two linear passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from white_elephant_spark.operators import similarity

__all__ = ["kmeans_fit", "kmeans_predict", "kmeans_fit_predict"]


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float], float]]:
    """Fit k centroids: deterministic seeds + ``iters`` exact Lloyd
    steps. Returns [(centroid_id, vector, norm)] — centroid ids are
    the seed vectors' source ids (stable across runs)."""
    return similarity.ivf_refined_centroids(
        df, ncentroids=k, dim=dim, iters=iters, id_col=id_col, vec_col=vec_col
    )


def kmeans_predict(
    df: DataFrame,
    model: list[tuple[int, list[float], float]],
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine.
    Returns (id, cluster_id, cos_sim) — one Arrow-batched map over a
    broadcast model, no shuffle."""
    spark = df.sparkSession
    cents = spark.createDataFrame(
        [(cid, vec) for cid, vec, _ in model],
        "label bigint, centroid array<double>",
    )
    out = similarity.classify_by_centroid(
        df.withColumn("__lbl", F.lit(None).cast("string")),
        cents,
        id_col=id_col,
        label_col="__lbl",
        vec_col=vec_col,
        dim=dim,
    )
    return out.select(
        F.col("vec_id").alias(id_col),
        F.col("pred_label").alias("cluster_id"),
        "cos_sim",
    )


def kmeans_fit_predict(
    df: DataFrame,
    k: int,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    model = kmeans_fit(df, k, iters, dim, id_col, vec_col)
    return kmeans_predict(df, model, dim, id_col, vec_col)
