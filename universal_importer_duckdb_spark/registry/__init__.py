"""The driver-contract query registry, split into chained sections
(core -> breadth -> advanced) re-exported through the
``entry_queries`` spine, which also owns the driver-window roster.
Import ``universal_importer_duckdb_spark.entry_queries``, not these
section modules, unless you are adding a section.
"""
