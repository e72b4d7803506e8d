"""white_elephant_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of LinkedInAttic/white-elephant (reference studied at
/root/reference, cited by file:line in docstrings) on top of
Spark SQL / DataFrame / Catalyst / Structured Streaming, extended
with the operators a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``sources``    : readers/catalog for parquet/text/binary/streaming inputs
- ``functions``  : column-level expression builders (time units, text, compat)
- ``operators``  : DataFrame->DataFrame operators (usage cube, top-k, dedup,
                   similarity, parsing, entity reconstruction)
- ``plans``      : query-layer plan builders (metric catalog, rollups, axes)
- ``streaming``  : incremental / Structured Streaming ingestion
"""

__version__ = "0.1.0"
