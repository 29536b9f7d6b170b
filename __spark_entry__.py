"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CEF decode->enrich->route->window-count pipeline
on sf0.001; ``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (decode D3-D17, timestamps T1-T3, encode E1-E11, the pipeline
stages, and the training-data ops) paired with DuckDB oracles. Payloads are
built deterministically from the `events` table with identical expressions on
both sides; the Spark side genuinely parses them with the engine while the
oracle states expected values straight from the source columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-sink windowed counts over CEF-decoded transcripts
    at sf0.001 (driver checks rows > 0)."""
    from cefspark.queries import q_cef_window_counts

    return q_cef_window_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cefspark.queries import REGISTRY

    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from cefspark.queries import REGISTRY

    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
