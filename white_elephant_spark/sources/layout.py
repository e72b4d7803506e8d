"""Physical layout operators: z-order clustering and small-file
compaction.

The reference's only layout tool is its directory scheme
(``<cluster>/<yyyy>/<MMdd>`` — util/JobStatsProcessing.java:62-67 in
/root/reference) — one-dimensional pruning by day. At 100 TB a table
is usually filtered on *several* dimensions at once (user AND time,
cluster AND status), and a single sort order only helps the leading
column. Z-ordering interleaves the bits of several key columns into
one Morton code and sorts/range-partitions the write on it, so every
output file covers a small hyper-rectangle of the key space: parquet
footer min/max stats become tight on **all** interleaved columns and
the scan skips most files/row-groups for any conjunctive filter.

Compaction is the operational twin: long-running incremental ingest
(sources/incremental.py, streaming/cube_stream.py) accretes many
small files per partition; ``compact`` rewrites a partition into
few well-sized, optionally sorted files. The reference has the same
problem class (hourly Avro part-files per day) and no tool for it.

Both are plain DataFrame writes — Catalyst plans the range exchange,
the executor-side sort stays JVM, and ``maxRecordsPerFile`` bounds
file sizes without a per-file driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "write_zordered", "compact"]


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton (z-curve) interleave of ``cols``.

    Each input must already be a non-negative integral column scaled
    to ``[0, 2**bits)`` — callers rank/clamp first (see
    :func:`write_zordered`). Bit ``b`` of column ``i`` lands at output
    position ``b * n_cols + i``, so the resulting long orders the rows
    along the z-curve of the joint key space.

    Built as one JVM expression tree (``shiftright``/``shiftleft``/
    ``bitwiseOR``) — whole-stage codegen folds it into straight-line
    long arithmetic; no UDF, no Python in the hot path.
    """
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cs):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return out


def _scaled_rank(c: Column, bits: int) -> Column:
    """Percent-rank of ``c`` quantized to ``[0, 2**bits)``.

    Rank-based scaling (not min/max) keeps the z-curve resolution
    uniform under skewed value distributions — the same reason
    ``repartitionByRange`` samples quantiles rather than splitting the
    min/max span.
    """
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy(c))
    return F.least(
        F.floor(pr * (1 << bits)).cast("long"), F.lit((1 << bits) - 1).cast("long")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 12,
    num_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of
    ``zorder_cols``.

    Plan shape: rank-scale each key column → Morton-interleave →
    ``repartitionByRange`` on the z-value (one range exchange, sampled
    quantile bounds, so files get equal row counts even under skew) →
    sort within partitions → write. The z-value itself is dropped
    before writing; it exists only to drive the layout.

    Scale note: ``percent_rank`` over an unpartitioned window is a
    global sort of the *key columns only* — at 100 TB replace
    ``_scaled_rank`` with a precomputed quantile lookup (e.g.
    ``approxQuantile`` breakpoints broadcast as a ``CASE`` ladder) to
    keep it one pass; the interleave and write below are unchanged.
    ``num_files`` sizes the range exchange: pick ``table_size /
    target_file_size`` (a few hundred MB per file).
    """
    ranked = df.withColumn(
        "__z",
        zvalue([_scaled_rank(F.col(c), bits) for c in zorder_cols], bits),
    )
    w = (
        ranked.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def compact(
    df: DataFrame,
    path: str,
    num_files: int,
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Rewrite ``df`` (typically one ingest partition that has
    accreted many small files) into ``num_files`` well-sized parquet
    files at ``path``.

    ``sort_cols`` range-partitions + sorts the rewrite (keeps footer
    stats tight and merge-reads cheap); otherwise a round-robin
    ``repartition`` just evens out file sizes. ``maxRecordsPerFile``
    caps any single file regardless of partitioning.

    This is the idempotent-overwrite pattern (same committer semantics
    as the reference's staged rename, StagedOutputJob.java:170-214):
    the rewrite lands atomically per directory, readers never see a
    half-compacted mix.
    """
    if sort_cols:
        out = df.repartitionByRange(num_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(num_files)
    w = out.write.mode("overwrite")
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)
