from universal_importer_duckdb_spark.config.loader import load_config, validate_config
from universal_importer_duckdb_spark.config.schema_compiler import (
    FieldSpec,
    compile_schema,
)

__all__ = ["load_config", "validate_config", "FieldSpec", "compile_schema"]
