"""Config-declared projections (reference main.py:234-298) + aliases.

The reference redirects the user's SQL to the stage table with a
substring replace (main.py:251, unsafe) and injects aliases with
another substring replace (``apply_aliases`` main.py:223-232, which
corrupts any token containing the column name). Here:

- the post-pipeline DataFrame is registered as a temp view under the
  *entity name itself*, so config SQL runs unmodified through Spark
  SQL (full Catalyst optimization for free — SURVEY.md §3.2);
- aliases are exact ``withColumnRenamed`` calls after the query, with
  the reference's schema-membership error kept (main.py:230);
- ``type: view`` stays lazy (temp view); ``type: table`` is
  materialized (cached + registered), mirroring VIEW vs CTAS.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def apply_aliases(
    df: DataFrame, aliases: dict[str, str] | None, schema_columns: list[str]
) -> DataFrame:
    if not aliases:
        return df
    for orig, alias in aliases.items():
        if orig not in schema_columns:
            raise ValueError(
                f"Alias field '{orig}' not found in schema"
            )
        if orig in df.columns:
            df = df.withColumnRenamed(orig, alias)
    return df


def create_projections(
    spark: SparkSession,
    entity: str,
    stage_df: DataFrame,
    projections: list[dict[str, Any]],
    schema_columns: list[str],
) -> dict[str, DataFrame]:
    """Register ``stage_df`` as view ``{entity}`` and evaluate each
    projection query against it. Returns name -> DataFrame."""
    stage_df.createOrReplaceTempView(entity)
    out: dict[str, DataFrame] = {}
    from universal_importer_duckdb_spark.caching import scoped_cache

    for proj in projections or []:
        name = proj["name"]
        df = spark.sql(proj["query"])
        df = apply_aliases(df, proj.get("aliases"), schema_columns)
        if proj.get("type", "view") == "table":
            # materialized like the reference's CTAS (main.py:295);
            # scoped so release_scoped reclaims it after the run
            df = scoped_cache(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
