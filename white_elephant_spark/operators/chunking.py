"""Document chunking: split long documents into fixed-token windows
with overlap — the step between curation and sequence packing when
documents exceed the training context length.

Pure ``sequence`` + ``explode`` + ``slice`` over the token array (the
same JVM-expression shape as the hour explode, operators/usage.py):
chunk starts step by ``size - overlap``; each chunk re-joins its token
slice. Linear in tokens with constant factor ``1/(1-overlap_frac)``,
no UDF, no shuffle at all — chunking is embarrassingly parallel and
the plan is a single projection stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from white_elephant_spark.functions.text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each document into (id, chunk_idx, chunk_text,
    n_tokens) windows of ``size`` tokens stepping by ``size -
    overlap``. The final window is **end-aligned**: it starts at
    ``len - size + 1`` so it is always full-width (sliding-window
    convention — no short tail chunk; the cost is that the last pair
    of chunks may overlap by more than ``overlap``). A doc shorter
    than ``size`` yields exactly one (short) chunk. Every token lands
    in at least one chunk; consecutive chunks share at least
    ``overlap`` tokens when the doc spans multiple chunks.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap({overlap}) < size({size})")
    step = size - overlap
    toks = F.col("toks")
    n = F.size(toks)
    # Start positions (1-based): 1, 1+step, ... while start <= n - overlap
    # (so the last chunk has more than just overlapping tokens, except
    # for docs shorter than size which get the single start 1).
    last_start = F.greatest(F.lit(1), n - F.lit(size) + F.lit(1))
    n_chunks = F.floor((last_start - 1 + F.lit(step - 1)) / F.lit(step)) + 1
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1),
        lambda i: F.least(i * step + 1, last_start).cast("int"),
    )
    return (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks"))
        .filter(n > 0)
        .select("id", "toks", F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, F.col("start"), size)).alias("chunk_text"),
            F.least(F.size(toks) - F.col("start") + 1, F.lit(size))
            .cast("long")
            .alias("n_tokens"),
        )
    )
