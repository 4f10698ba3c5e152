"""Bucketed-table support: pre-shuffled storage so repeated joins and
aggregations on the bucket keys run with NO exchange at query time —
the storage-layout lever for 100 TB fact-to-fact joins that are too
big to broadcast (SURVEY.md scale mandate; AQE cannot remove a shuffle
that bucketing avoids entirely).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> str:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally enables sort-merge joins
    without a sort step."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return table_name


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
