"""Pin the lambda-binding discipline on every per-position token/char
window builder (the r12 scale-probe finding).

Capturing a tokenize/lower EXPRESSION inside a higher-order-function
lambda re-evaluates it once per element — lambda closures sit outside
Catalyst's subexpression elimination — turning a linear map stage into
O(n · tokenize) per document. Measured on x16-replicated sf0.1 (80k
docs): lm._bigrams was 27.9 s expression-captured vs 0.36 s bound; the
scale probe exposed it as a data-proportional exponent (0.84) on an
entry adjudicated as a fixed floor. The fix routes every such builder
through text_analysis._bind (evaluate once per row, hand the result to
the lambda as a bound variable).

These tests pin the shape structurally: the analyzed expression of
each builder must contain exactly ONE occurrence of its underlying
per-row computation (split/lower), not one per element position — a
re-captured expression would show up as a second occurrence inside the
lambda body. Behavioral twins assert the bound form still computes the
same windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _expr_sql(col) -> str:
    """The column's full unresolved expression tree as SQL text
    (requires an active session: Column ops invoke the JVM)."""
    return col._jc.toString()


def test_lm_bigrams_binds_tokenize_once(spark):
    from universal_importer_duckdb_spark.operators.lm import _bigrams

    s = _expr_sql(_bigrams("text"))
    assert s.count("split(") == 1


def test_char_trigrams_binds_lower_once(spark):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        char_trigrams,
    )

    s = _expr_sql(char_trigrams("text"))
    assert s.count("lower(") == 1


def test_word_segments_binds_split_once(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        word_segments,
    )

    s = _expr_sql(word_segments(F.col("text"), width=3))
    assert s.count("split(") == 1


def test_lm_bigrams_values(spark):
    from universal_importer_duckdb_spark.operators.lm import _bigrams

    df = spark.createDataFrame(
        [("a b c d",), ("x",), ("",), (None,)], ["text"]
    ).select(_bigrams("text").alias("b"))
    rows = [r.b for r in df.collect()]
    assert [(p.w1, p.w2) for p in rows[0]] == [
        ("a", "b"), ("b", "c"), ("c", "d")
    ]
    assert rows[1] == [] and rows[2] == [] and rows[3] == []


def test_word_segments_values(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        word_segments,
    )

    df = spark.createDataFrame([("a b c d e",)], ["text"]).select(
        word_segments(F.col("text"), width=2).alias("s")
    )
    assert df.collect()[0].s == ["a b", "c d", "e"]


def test_char_trigrams_values(spark):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        char_trigrams,
    )

    df = spark.createDataFrame([("AbCd",), ("ab",)], ["text"]).select(
        char_trigrams("text").alias("g")
    )
    rows = [r.g for r in df.collect()]
    assert rows[0] == ["abc", "bcd"]
    assert rows[1] == []


def test_textrank_cooccurrence_binds_split_once(spark):
    """The co-occurrence pair builder goes through _bind: its
    optimized plan must not re-split per position. Pinned
    behaviorally: tiny corpus, known adjacency counts."""
    from universal_importer_duckdb_spark.operators.textrank import (
        cooccurrence_edges,
    )

    docs = spark.createDataFrame(
        [("a b a b",), ("b a",)], ["text"]
    )
    edges = {
        (r.src, r.dst): r.w
        for r in cooccurrence_edges(docs).select(
            "src", "dst", "w"
        ).collect()
    }
    # pairs: a-b x2, b-a x1 (doc1) + b-a x1 (doc2) -> undirected 4
    assert edges[("a", "b")] == 4 and edges[("b", "a")] == 4


def test_quality_signals_binds_tokenize_once(spark):
    """The r13 fix (committed r12 queue item b): quality_signals
    carved its 4 token signals + 5 stopword-marker filters from
    sibling split() expressions — 9 tokenizations per row. The bound
    struct form must show exactly ONE split in the optimized plan."""
    from universal_importer_duckdb_spark.operators.text_analysis import (
        quality_signals,
    )

    df = spark.createDataFrame([("the quick fox",)], ["text"])
    plan = (
        quality_signals(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1


def test_quality_filter_predicate_binds_tokenize_once(spark):
    """The pruned-consumer shape (docs_quality_filter_ids): when the
    q_* columns are dropped, only the pushed-down gate remains — it
    must contain ONE split, not one per conjunct."""
    from universal_importer_duckdb_spark.operators.text_analysis import (
        quality_filter,
    )

    df = spark.createDataFrame([(1, "the quick fox")], ["doc_id", "text"])
    kept, _ = quality_filter(df)
    plan = (
        kept.select("doc_id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1


def test_quality_signals_values_unchanged(spark):
    """Behavioral twin: the bound form computes the identical signal
    values (including the NULL-text row) as the definitional
    per-signal expressions."""
    from universal_importer_duckdb_spark.operators.text_analysis import (
        quality_signals,
    )

    df = spark.createDataFrame(
        [(1, "the cat and the hat 99"), (2, None)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in quality_signals(df).collect()}
    r1 = rows[1]
    assert r1.q_n_tokens == 6
    assert r1.q_unique_token_ratio == 5 / 6
    assert r1.q_stopword_ratio == 3 / 6  # the x2, and
    assert r1.q_mean_token_len == (22 - 5) / 6
    assert r1.q_digit_ratio == 2 / 22
    r2 = rows[2]
    assert r2.q_n_tokens is None and r2.q_stopword_ratio is None


def test_language_scores_binds_tokenize_once(spark):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        language_scores,
    )

    df = spark.createDataFrame([("the el le der",)], ["text"])
    plan = (
        language_scores(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.count("split(") == 1
