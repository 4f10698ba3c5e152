"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full reference pipeline
as one DataFrame lineage) at sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the LLM-data-pipeline
extensions; ``oracle_sql()`` the DuckDB equivalents. Implementations
live in ``universal_importer_duckdb_spark.entry_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_importer_duckdb_spark import entry_queries as _eq
from universal_importer_duckdb_spark.session import tune_existing


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return _eq.pipeline_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
