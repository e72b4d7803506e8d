"""Sequence packing: assign documents to fixed token-budget training
bins.

LLM pre-training consumes fixed-length token windows; the packing
step decides which documents share a window. The scalable shape is
**sharded linear packing**: hash-shard the corpus (shards are the
parallel unit — each packs independently), order documents
deterministically inside the shard, run a cumulative token sum, and
cut bins every ``budget`` tokens at document granularity. One shuffle
(on the shard key) + one window — no driver state, no global sort.
Exact integer math end-to-end, so any engine reproduces the same
(shard, bin, offset) for every document.

First-fit/best-fit bin packing would waste slightly less padding but
is inherently sequential per bin state; linear packing is the
standard large-corpus compromise (deterministic, embarrassingly
parallel, O(1) state per row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_linear(
    docs: DataFrame,
    token_col: str,
    budget: int,
    shards: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, bin, bin_offset) per document.

    ``shard = id mod shards``; docs order by id within the shard;
    ``bin`` is the running-token-count prefix divided by ``budget``
    (a document straddling a boundary belongs to the bin where it
    starts — consumers pad/splice at read time). All integer
    arithmetic.

    ``shards`` is the parallelism ceiling of the window stage —
    when omitted it defaults to ``sparkContext.defaultParallelism``
    so the packing scales with the cluster instead of a fixed
    constant. Registered queries pin it explicitly (the shard
    assignment is part of the deterministic output contract)."""
    if shards is None:
        shards = docs.sparkSession.sparkContext.defaultParallelism
    w = Window.partitionBy("shard").orderBy(id_col)
    tok = F.col(token_col)
    return (
        docs.select(
            F.col(id_col),
            (F.col(id_col) % shards).cast("int").alias("shard"),
            tok.cast("long").alias("n_tokens"),
        )
        .withColumn("_cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            "shard",
            "n_tokens",
            ((F.col("_cum") - F.col("n_tokens")) / budget)
            .cast("long")
            .alias("bin"),
            ((F.col("_cum") - F.col("n_tokens")) % budget).alias("bin_offset"),
        )
    )


def sql_pack_linear(
    from_cte: str, token_expr: str, budget: int, shards: int = 8, id_expr: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`pack_linear` over ``from_cte``."""
    return f"""
SELECT {id_expr}, shard, n_tokens,
       CAST((cum - n_tokens) // {budget} AS BIGINT) AS bin,
       CAST((cum - n_tokens) % {budget} AS BIGINT) AS bin_offset
FROM (
  SELECT {id_expr}, CAST({id_expr} % {shards} AS INTEGER) AS shard,
         {token_expr} AS n_tokens,
         SUM({token_expr}) OVER (PARTITION BY {id_expr} % {shards}
             ORDER BY {id_expr}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM {from_cte}
)
"""
