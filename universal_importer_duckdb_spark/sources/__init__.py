from universal_importer_duckdb_spark.sources.readers import (
    read_csv_with_ingest_order,
    read_parquet,
    with_ingest_order,
)
from universal_importer_duckdb_spark.sources.writers import (
    export_csv,
    save_errors,
    write_parquet,
)

__all__ = [
    "read_csv_with_ingest_order",
    "read_parquet",
    "with_ingest_order",
    "export_csv",
    "save_errors",
    "write_parquet",
]
