"""Query registry — the engine's public query surface.

Every operator from SURVEY.md §2 (the relational core X6 plus the
LLM-pipeline extensions X1-X5) is a named ``QuerySpec``: a Spark
DataFrame-API implementation and, where SQL-expressible, a DuckDB oracle
producing identical rows (same column names, same values) for the
driver's differential correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name!r}")
    _REGISTRY[spec.name] = spec
    return spec


def registry() -> dict[str, QuerySpec]:
    # Import side-effect modules once, on first access.
    from . import (  # noqa: F401
        convert_gate,
        crawl,
        dedup,
        multimodal,
        pipeline,
        quality,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        similarity,
        streaming_gate,
        text,
    )

    return dict(_REGISTRY)
