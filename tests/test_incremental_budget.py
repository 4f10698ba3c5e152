"""Unit tests for incremental ingest dedup and token-budget corpus
selection. Oracle parity runs in test_oracle_parity.py; these pin the
admission/selection semantics on hand-computable inputs."""

from __future__ import annotations

from universal_importer_duckdb_spark.operators.corpus import budget_select
from universal_importer_duckdb_spark.operators.dedup_text import (
    incremental_exact_dedup,
)


def test_incremental_dedup_admission_rules(spark):
    index = spark.createDataFrame(
        [(1, "seen before"), (2, "old news")], "doc_id bigint, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "Seen Before"),   # dup of index (normalized) — rejected
            (11, "fresh content"), # new — admitted
            (12, "fresh content"), # within-batch dup — rejected
            (13, "also new"),      # new — admitted
        ],
        "doc_id bigint, text string",
    )
    out = sorted(
        r.doc_id for r in incremental_exact_dedup(batch, index).collect()
    )
    assert out == [11, 13]


def test_budget_select_maximal_prefix(spark):
    # scores order docs c > a > b > d; budget 25 fits c(10) + a(10)
    # but not b(10); the failure is terminal (prefix-closed rule)
    rows = [
        ("a", 0.8, 10),
        ("b", 0.6, 10),
        ("c", 0.9, 10),
        ("d", 0.4, 2),
    ]
    df = spark.createDataFrame(rows, "doc_id string, s double, n bigint")
    out = {
        r.doc_id: r
        for r in budget_select(
            df, score_col="s", tokens_col="n", token_budget=25
        ).collect()
    }
    assert [out[k].selected for k in "cabd"] == [True, True, False, False]
    assert out["c"].tokens_before == 0
    assert out["a"].tokens_before == 10
    assert out["d"].tokens_before == 30  # rejected docs still count


def test_budget_select_two_level_sum_matches_any_bucketing(spark):
    rows = [(f"d{i:03d}", (i * 37 % 100) / 100.0, 5 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, s double, n bigint")
    a = budget_select(df, "s", "n", token_budget=500, n_buckets=1)
    b = budget_select(df, "s", "n", token_budget=500, n_buckets=4096)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
