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


def test_corpus_card_kernel_matches_expression(spark, sf_dir):
    """The Arrow signal kernel must reproduce the bound-expression
    form's per-row values EXACTLY (integer sums, marker counts, md5
    fingerprint) — the card aggregates are hash-compared downstream."""
    from universal_importer_duckdb_spark.operators.quality_model import (
        corpus_card_signals_kernel,
        load_quality_weights,
        quality_raw_fold,
        quality_tokens,
    )
    from universal_importer_duckdb_spark.operators.text_analysis import _bind
    from universal_importer_duckdb_spark.registry.core import (
        _EN_MARKERS,
        _NON_EN_MARKERS,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "source", "n_chars", "text"
    )
    edge = spark.createDataFrame(
        # the (None, "has words") row pins the r15 advice fix: a null
        # n_chars must survive the Arrow boundary as NULL (nullable
        # Int64), not arrive as float64+NaN and decay to garbage int64
        # under convertToArrowArraySafely=false
        [("web", 0, None), ("web", 5, ""), ("lit", 9, "the  el  THE x"),
         ("web", None, "null chars still has words")],
        "source string, n_chars bigint, text string",
    )
    for frame in (docs, edge):
        weights = load_quality_weights()

        def _signals(toks):
            return F.struct(
                F.size(toks).cast("bigint").alias("nw"),
                quality_raw_fold(weights, toks).cast("bigint").alias("raw"),
                F.size(F.filter(toks, lambda w: w.isin(*_EN_MARKERS)))
                .cast("bigint").alias("en"),
                F.size(F.filter(toks, lambda w: w.isin(*_NON_EN_MARKERS)))
                .cast("bigint").alias("non"),
            )

        expr = frame.select(
            "source", "n_chars",
            _bind(quality_tokens("text"), _signals).alias("__s"),
            F.md5(F.lower(F.coalesce(F.col("text"), F.lit("")))).alias("__fp"),
        ).select(
            "source", "n_chars",
            F.col("__s.nw").alias("__nw"), F.col("__s.raw").alias("__raw"),
            F.col("__s.en").alias("__en"), F.col("__s.non").alias("__non"),
            "__fp",
        )
        kern = corpus_card_signals_kernel(
            frame, weights, _EN_MARKERS, _NON_EN_MARKERS
        )
        def _key(t):  # None-safe total order for the null-n_chars row
            return tuple((v is None, v) for v in t)

        a = sorted(map(tuple, expr.collect()), key=_key)
        b = sorted(map(tuple, kern.collect()), key=_key)
        assert a == b


def test_session_pins_ansi(spark):
    """r14 advice: FixedSum(direct=True)'s loud-overflow contract
    requires ANSI; both session paths must pin it."""
    from universal_importer_duckdb_spark.session import tune_existing

    tune_existing(spark)
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


def test_estimated_splits_tracks_spark_partitioning(spark, tmp_path):
    """r14 advice fix contract: on a many-small-files layout the
    estimate must mirror Spark's own FilePartition packing (openCost
    padding included) — the old unpadded form underestimated
    maxSplitBytes and overestimated splits. Ground truth is the scan's
    actual partition count."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        estimated_splits,
    )

    base = tmp_path / "many"
    for i in range(80):
        spark.range(i * 10, i * 10 + 10).coalesce(1).write.mode(
            "append"
        ).parquet(str(base))
    df = spark.read.parquet(str(base))
    actual = df.rdd.getNumPartitions()
    est = estimated_splits(df)
    # small files never split below one-per-file, and Spark packs
    # multiple files per partition — the estimate is an upper proxy
    # bounded by the file count, and must land within a small factor
    # of the true packing (it gates a spread decision, not a plan)
    assert est >= actual
    assert est <= 80
