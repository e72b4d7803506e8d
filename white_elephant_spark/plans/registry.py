"""Query registry — the engine's declared capability surface.

Every operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) is exposed here as a named query over the driver's test
corpus, paired with an ANSI-SQL oracle that DuckDB runs on the same
parquet files. The driver compares row counts, schemas, and
order-insensitive value hashes — see ``__spark_entry__.py``.

Numeric convention: see ``white_elephant_spark.functions.compat`` —
double aggregates go through DECIMAL so results are order-independent
and hash-identical across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # ANSI SQL for DuckDB; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules that populate the registry.
    from white_elephant_spark.plans import (  # noqa: F401
        core_queries,
        curation_queries,
        pipeline_queries,
        relational_queries,
        scale_queries,
        sketch_queries,
        temporal_queries,
        text_queries,
    )

    return dict(_REGISTRY)
