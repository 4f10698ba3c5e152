"""Round-8 regressions: the r7 verdict/advice items.

- testing._check_oracle_dtypes must red-flag container-typed (array/
  map/struct) Spark output columns — the r7 emb_pq_codes driver red:
  the driver's pandas canonicalizer cannot sort a list cell, so even
  the rows-only gate dies (third representation-class escape after
  the r5 HUGEINT and r6 DECIMAL rows).
- integer k-means (operators/int_kmeans.py): the PQ/IVF training is
  now exact scaled-integer Lloyd's, replayable in DuckDB SQL — the
  rows-only class is retired. Determinism, SQL parity at tiny SF, and
  quality budgets are pinned here.
- dsir_scores: no corpus-scale cache in the plan (stats are
  aggregated from the token stream directly; the per-doc side stays
  pure lineage), plus the runtime overflow guard on the vocab-bounded
  stats table.
- top_collocations: the unigram table is pre-filtered to words that
  appear in surviving bigrams before the ratio joins (r7 perf item);
  results must be identical to the unfiltered form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------- dtype-guard hardening
def test_dtype_guard_rejects_container_columns(spark, sf_dir):
    """The r7 emb_pq_codes pattern (array<int> output) must fail fast
    in the local harness even though values would match."""
    from universal_importer_duckdb_spark.testing import (
        _check_oracle_dtypes,
        duckdb_connection,
    )

    con = duckdb_connection(sf_dir)
    old_shape = spark.range(3).select(
        F.array(F.lit(1), F.lit(2)).alias("codes")
    )
    with pytest.raises(AssertionError, match="unhashable"):
        _check_oracle_dtypes(
            old_shape,
            con,
            "SELECT [1, 2] AS codes",
            "old_pq_codes_shape",
        )
    struct_shape = spark.range(3).select(
        F.struct(F.lit(1).alias("a")).alias("s")
    )
    with pytest.raises(AssertionError, match="unhashable"):
        _check_oracle_dtypes(
            struct_shape, con, "SELECT {'a': 1} AS s", "struct_shape"
        )
    con.close()
