"""Round-14 property tests: the two Arrow kernels against the
higher-order-function expression forms they replaced — randomized
text (multi-space runs, empties, nulls, punctuation, digits, safe
accented letters) must produce IDENTICAL values, because both kernels
sit under value-hash oracle comparisons downstream.

ASCII-plus-safe-accents alphabet by design: the kernels' documented
contract is Java/Python-agreeing case folds (the certification data
is ASCII); locale-exotic folds are out of contract.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_ALPHABET = "abcdefgh ABCDEFGH  the el und 0123456789 .,|-_'éñü"
TEXTS = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=_ALPHABET, min_size=0, max_size=120),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_gram_kernel_property(spark, texts):
    from universal_importer_duckdb_spark.operators.corpus import (
        word_ngrams_hashed,
        word_ngrams_hashed_kernel,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = set(map(tuple, word_ngrams_hashed(df, 3).collect()))
    b = set(map(tuple, word_ngrams_hashed_kernel(df, 3).collect()))
    assert a == b


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_card_signals_kernel_property(spark, texts):
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

    rows = [("s%d" % (i % 3), len(t or ""), t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "source string, n_chars bigint, text string")
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

    expr = df.select(
        "source", "n_chars",
        _bind(quality_tokens("text"), _signals).alias("__s"),
        F.md5(F.lower(F.coalesce(F.col("text"), F.lit("")))).alias("__fp"),
    ).select(
        "source", "n_chars",
        F.col("__s.nw").alias("__nw"), F.col("__s.raw").alias("__raw"),
        F.col("__s.en").alias("__en"), F.col("__s.non").alias("__non"),
        "__fp",
    )
    kern = corpus_card_signals_kernel(df, weights, _EN_MARKERS, _NON_EN_MARKERS)
    assert sorted(map(tuple, expr.collect())) == sorted(map(tuple, kern.collect()))
