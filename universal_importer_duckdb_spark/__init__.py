"""universal_importer_duckdb_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first implementation of the capabilities of the
reference repo ``mgarlorenzo/universal-importer-duckdb`` (a YAML-config
CSV import / validate / dedup / transform / export pipeline built on
pandas + Pydantic + DuckDB), re-expressed as declarative DataFrame
lineage so Catalyst/Tungsten pick the physical plan.

Design notes (scale-first):
- Every pipeline stage is a pure function ``df -> (kept, rejected)``;
  no in-place table mutation (the reference mutates a DuckDB stage
  table with DELETEs; see SURVEY.md §2.3).
- Validation is vectorized column expressions (whole-stage codegen),
  never a per-row Python loop (the reference iterates rows through
  Pydantic — its main scalability cliff; reference main.py:56-82).
- Dedup is a single shuffle per composite key (window or agg form).
- All extension operators (text dedup, similarity search, streaming)
  are built from built-in pyspark.sql.functions where possible.
"""

from universal_importer_duckdb_spark.config.loader import load_config, validate_config
from universal_importer_duckdb_spark.config.schema_compiler import (
    FieldSpec,
    compile_schema,
)
from universal_importer_duckdb_spark.operators.dedup import dedupe, dedupe_cascade
from universal_importer_duckdb_spark.operators.rules import (
    RULE_REGISTRY,
    execute_custom_validations,
)
from universal_importer_duckdb_spark.operators.validate import validate_dataframe

__version__ = "0.1.0"

__all__ = [
    "load_config",
    "validate_config",
    "FieldSpec",
    "compile_schema",
    "validate_dataframe",
    "dedupe",
    "dedupe_cascade",
    "RULE_REGISTRY",
    "execute_custom_validations",
    "__version__",
]
