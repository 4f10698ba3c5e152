from universal_importer_duckdb_spark.functions.numeric import (
    decimal_sum,
    exact_avg,
    money,
)

__all__ = ["money", "decimal_sum", "exact_avg"]
