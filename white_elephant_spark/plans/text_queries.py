"""Training-data-pipeline queries: dedup, similarity search, text
analysis over the documents/embeddings tables. Populated as the
operators land; see white_elephant_spark/operators/."""

from __future__ import annotations
