"""Round-14 operator tests: the Arrow gram-build kernel (bit-parity
with the interpreted HOF form it replaces in the contamination path)
and the q3 join-order rewrite's plan contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gram_kernel_matches_hof(spark, sf_dir):
    """word_ngrams_hashed_kernel must emit the EXACT (id, md5-28 gram)
    set of the HOF form — the overlap counts depend on the shared
    hash space, so this is a value contract, not an approximation."""
    from universal_importer_duckdb_spark.operators.corpus import (
        word_ngrams_hashed,
        word_ngrams_hashed_kernel,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = set(map(tuple, word_ngrams_hashed(docs, 8).collect()))
    b = set(map(tuple, word_ngrams_hashed_kernel(docs, 8).collect()))
    assert a == b and len(a) > 0


def test_gram_kernel_edge_cases(spark):
    """Short docs, NULL text, empty text, and consecutive spaces
    (empty tokens — ' '.join must reconstruct the original substring
    exactly as array_join(slice) does)."""
    from universal_importer_duckdb_spark.operators.corpus import (
        word_ngrams_hashed,
        word_ngrams_hashed_kernel,
    )

    edge = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, None),
            (3, ""),
            (4, "one  two   three four five six seven eight nine"),
            (5, "x " * 9),
        ],
        "doc_id long, text string",
    )
    a = set(map(tuple, word_ngrams_hashed(edge, 8).collect()))
    b = set(map(tuple, word_ngrams_hashed_kernel(edge, 8).collect()))
    assert a == b


def test_q3_joins_pruned_side_first(spark, sf_dir):
    """The r14 q3 rewrite's plan contract: the lineitem side carries
    only (l_orderkey, scaled revenue) — no raw measure columns — into
    its join, and the plan has no cartesian/python anti-patterns."""
    from universal_importer_duckdb_spark.registry.core import q3_top_unshipped

    df = q3_top_unshipped(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the narrow payload projection exists (scaled revenue pre-join)
    assert "__rev" in plan
