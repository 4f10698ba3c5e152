"""Sources: CSV (the reference's only source, main.py:432) + Parquet,
with explicit ingest-order stamping.

Spark has no stable implicit row order (the reference leans on DuckDB
ROWID — main.py:135); ``_ingest_ord`` is stamped once at read time and
carried through the pipeline for first/last dedup and 1-based error
``row`` numbers (SURVEY.md §7.3).

Two recipes:
- ``with_ingest_order(df, order_cols)`` — the data has a total order
  (keys, timestamps): range-partition on those columns, sort within
  partitions, stamp with per-partition offsets. Parallel at every
  step — a plain ``row_number() OVER (ORDER BY ...)`` would funnel
  the whole table through ONE task. (Prefer skipping the ordinal
  entirely where possible: dedup and rules accept ``order_cols``
  directly, see plans/pipeline.py.)
- ``with_ingest_order(df)`` (no columns) — file order via
  ``zipWithIndex``: exact CSV row order, but materializes a pass over
  the data; fine for import-sized inputs, documented cost at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INGEST_ORD = "_ingest_ord"


def with_ingest_order(df: DataFrame, order_cols: Sequence[str] | None = None) -> DataFrame:
    if order_cols:
        # Dense 1-based ordinal consistent with ORDER BY order_cols —
        # computed in parallel: range-partitioning puts globally-ordered
        # key ranges in partition order, the local sort orders within,
        # and zipWithIndex adds cumulative per-partition offsets (one
        # extra count job, no single-partition window sort).
        df = df.repartitionByRange(*[F.col(c) for c in order_cols]).sortWithinPartitions(
            *[F.col(c) for c in order_cols]
        )
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1] + 1))
    spark = df.sparkSession
    schema = df.schema.add(INGEST_ORD, "long", False)
    return spark.createDataFrame(rdd, schema)


def read_csv_with_ingest_order(
    spark: SparkSession,
    path: str,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Header CSV read as all-strings (validation casts later, so we
    keep raw values for faithful error records), then ordinal-stamped."""
    df = spark.read.option("header", True).option("inferSchema", False).csv(path)
    return with_ingest_order(df, order_cols)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines source (schema string recommended at scale — schema
    inference is a full extra pass over the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(
    spark: SparkSession, path: str, whole: bool = False, line_sep: str | None = None
) -> DataFrame:
    """Plain-text source: one row per line (``value`` string), or one
    row per file with ``whole=True`` (document-corpus ingestion — each
    file becomes one document; Spark still parallelizes across
    files)."""
    # NB: must be the text() kwarg — .option("wholetext", ...) is
    # silently ignored by the text source
    return spark.read.text(path, wholetext=whole, lineSep=line_sep)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal ingestion: one row per file
    with (path, modificationTime, length, content binary) — the raw
    bytes feed operators/multimodal.py feature extraction. At scale,
    pair with ``pathGlobFilter`` so pruning happens at file-listing
    time, before any byte is read."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


FORMAT_READERS = {
    "csv": read_csv_with_ingest_order,
    "parquet": read_parquet,
    "json": read_json,
    "orc": read_orc,
    "txt": read_text,
}


def read_source(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """Format-dispatched read; format inferred from the extension when
    not given (the config `source` key stays a bare path, as in the
    reference)."""
    if fmt is None:
        fmt = path.rsplit(".", 1)[-1].lower()
    if fmt not in FORMAT_READERS:
        raise ValueError(f"Unsupported source format '{fmt}'")
    return FORMAT_READERS[fmt](spark, path)
