"""Vectorized schema validation: ``df -> (valid, errors)``.

Replaces the reference's per-row Pydantic loop
(``validate_records_with_pydantic``, reference main.py:56-82) with a
single pass of column expressions — one whole-stage-codegen stage, no
Python in the hot path, no shuffle. At 100 TB this is a pure map over
the scan with filters that Catalyst can push into the source.

Semantics parity with the reference:
- declared columns only survive (undeclared input columns are dropped,
  like Pydantic's extra-field ignore — SURVEY.md §1.2);
- values are coerced leniently to the declared type (Spark ``cast``
  yields NULL on failure; we detect that as a type error);
- the errors output carries a 1-based ``row`` ordinal and an
  ``errors`` string of "; "-joined "field: message" items, matching
  the reference error-record shape (main.py:73-78, 388-394);
- optional fillna patch applied before validation (main.py:58-63 —
  the reference hardcodes 4 column names; here it's a parameter).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.config.schema_compiler import (
    SPARK_CAST,
    CompiledSchema,
)

ERRORS_COL = "errors"
ROW_COL = "row"
FLAG_COL = "__errs"


def validate_dataframe(
    df: DataFrame,
    schema: CompiledSchema,
    fillna: dict[str, Any] | None = None,
    ingest_ord: str | None = None,
    return_flagged: bool = False,
    observe_with=None,
) -> tuple[DataFrame, DataFrame] | tuple[DataFrame, DataFrame, DataFrame]:
    """Split ``df`` into (valid, errors) under the compiled schema.

    ``valid`` has exactly the declared columns, coerced to their
    declared Spark types (plus ``ingest_ord`` if given). ``errors``
    has the declared columns as read (uncoerced), plus ``row`` and
    ``errors`` columns.

    ``observe_with`` (a ``pyspark.sql.Observation``) plants a metrics
    node on the flagged frame — ``total`` and ``schema_errors`` become
    available from the observation after ANY downstream action
    touches the lineage, costing zero extra passes (the one-action
    funnel; see plans/pipeline.py compute_summary="observe").
    """
    available = set(df.columns)
    # Missing declared columns become NULL (Pydantic would fail them as
    # missing; the required/type constraints handle that uniformly).
    selected = [
        (F.col(c) if c in available else F.lit(None).cast("string")).alias(c)
        for c in schema.columns
    ]
    if ingest_ord and ingest_ord in available:
        selected.append(F.col(ingest_ord))
    base = df.select(*selected)
    if fillna:
        base = base.na.fill({k: v for k, v in fillna.items() if k in schema.columns})
    if schema.apply_defaults:
        # Substitute declared defaults for NULL/missing raw values
        # before any constraint sees them (config `default` key —
        # parsed-but-ignored by the reference; opt-in here via
        # compile_schema(apply_defaults=True)). The literal is cast to
        # the column's CURRENT (raw) type so the coercion constraints
        # downstream treat it exactly like a supplied value.
        base = base.select(
            *[
                F.coalesce(
                    F.col(fs.name), F.lit(fs.default).cast(base.schema[fs.name].dataType)
                ).alias(fs.name)
                if fs.default is not None
                else F.col(fs.name)
                for fs in schema.fields
            ],
            *[c for c in base.columns if c not in schema.columns],
        )

    # NOTE: no array/higher-order functions here on purpose — an
    # array_compact over dozens of nested CASE WHEN trees triggers
    # quadratic expression re-canonicalization in Catalyst (heap
    # blowup at ~60 constraints). A flat boolean OR chain + concat_ws
    # (which skips NULLs) expresses the same semantics as plain trees.
    fail_flags = [F.coalesce(c.fail, F.lit(False)) for c in schema.constraints]
    has_err = fail_flags[0] if fail_flags else F.lit(False)
    for f_ in fail_flags[1:]:
        has_err = has_err | f_
    msgs = [
        F.when(c.fail, F.lit(f"{c.field}: {c.message}")) for c in schema.constraints
    ]
    flagged = base.withColumn(FLAG_COL, has_err)
    if observe_with is not None:
        flagged = flagged.observe(
            observe_with,
            F.count(F.lit(1)).alias("total"),
            F.count_if(F.col(FLAG_COL)).alias("schema_errors"),
        )

    valid = flagged.filter(~F.col(FLAG_COL)).select(
        *[F.col(f.name).try_cast(SPARK_CAST[f.type]).alias(f.name) for f in schema.fields],
        *([F.col(ingest_ord)] if ingest_ord and ingest_ord in available else []),
    )
    errors = flagged.filter(F.col(FLAG_COL))
    if ingest_ord and ingest_ord in available:
        errors = errors.withColumn(ROW_COL, F.col(ingest_ord).cast("bigint"))
    else:
        errors = errors.withColumn(ROW_COL, F.lit(None).cast("bigint"))
    errors = errors.withColumn(
        ERRORS_COL, F.concat_ws("; ", *msgs) if msgs else F.lit("")
    ).select(*schema.columns, ROW_COL, ERRORS_COL)
    if return_flagged:
        return valid, errors, flagged
    return valid, errors
