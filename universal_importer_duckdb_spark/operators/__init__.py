from universal_importer_duckdb_spark.operators.dedup import dedupe, dedupe_cascade
from universal_importer_duckdb_spark.operators.rules import (
    RULE_REGISTRY,
    execute_custom_validations,
)
from universal_importer_duckdb_spark.operators.validate import validate_dataframe

__all__ = [
    "validate_dataframe",
    "dedupe",
    "dedupe_cascade",
    "RULE_REGISTRY",
    "execute_custom_validations",
]
