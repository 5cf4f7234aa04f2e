"""LLM-data-pipeline query registry (dedup, similarity, text analysis,
multimodal) — filled in as operators land. Kept separate from the core
relational registry for clarity."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {}


def oracle_sql() -> dict[str, str]:
    return {}
