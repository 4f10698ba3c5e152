"""Schema evolution at the ingest boundary.

A long-lived ingest path accumulates parquet written under several
schema versions (columns added, ints widened). Two tools close the
gap between "whatever is on disk" and "the schema the pipeline was
compiled against" (reference anchor: none — the reference re-infers
per run and breaks on drift; this is the production contract):

- ``read_parquet_merged``: the mergeSchema read — one unioned schema
  across files, missing columns null-filled by the reader itself.
- ``align_to_schema``: project ANY frame onto a target schema —
  missing columns appear as typed nulls (or declared defaults),
  extra columns are dropped, and only SAFE widenings are cast
  (integral up-casts, float->double, anything->string); a lossy
  mismatch raises instead of silently truncating.

Both are narrow operations — no shuffle, no data pass beyond what the
read itself does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# widenings that can never lose information (simpleString names)
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
    ("date", "timestamp"),
}


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with schema merging across files (the evolved-
    table shape). mergeSchema costs one footer read per file at
    planning — fine for directory-sized reads; at catalog scale,
    store the merged schema once and pass it to ``align_to_schema``
    instead of re-merging every query."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_schema(
    df: DataFrame,
    target: T.StructType | str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``target`` (StructType or DDL string).

    - columns missing from df -> typed null, or ``defaults[name]``
    - columns extra in df -> dropped
    - type mismatch -> cast when (source, target) is a safe widening
      or target is string; otherwise ValueError (lossy evolution must
      be an explicit migration, never an implicit cast)
    """
    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    defaults = defaults or {}
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            base = (
                F.lit(defaults[f.name])
                if f.name in defaults
                else F.lit(None)
            )
            cols.append(base.cast(f.dataType).alias(f.name))
            continue
        src = have[f.name]
        if src == f.dataType:
            cols.append(F.col(f.name))
            continue
        pair = (src.simpleString(), f.dataType.simpleString())
        if pair in _SAFE_WIDENINGS or f.dataType.simpleString() == "string":
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"lossy schema evolution for column {f.name!r}: "
                f"{pair[0]} -> {pair[1]} needs an explicit migration"
            )
    return df.select(*cols)
