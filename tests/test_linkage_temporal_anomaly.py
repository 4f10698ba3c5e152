"""Unit tests for the round-5 session-3 operators: fuzzy entity
resolution (linkage), time-series resample/gap-fill (temporal), and
robust median/MAD outlier screening (anomaly). The registry-level
oracle parity runs in test_oracle_parity.py; these cover edge
semantics the oracle data doesn't exercise."""

from __future__ import annotations

import pytest

from universal_importer_duckdb_spark.operators.anomaly import (
    robust_outlier_summary,
)
from universal_importer_duckdb_spark.operators.linkage import (
    fuzzy_match_pairs,
)
from universal_importer_duckdb_spark.operators.temporal import (
    resample_interpolate,
)

HOUR_NS = 3_600_000_000_000


def test_fuzzy_match_pairs_blocks_and_verifies(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "ted widget"),
            (3, "red widget"),
            (4, "red bolt"),
            (5, "blue anvil"),
        ],
        "id bigint, name string",
    )
    pairs = fuzzy_match_pairs(
        df, text_col="name", id_col="id", max_distance=3
    ).collect()
    # only the widget block has a close pair; bolt/anvil blocks are
    # singletons, and cross-block pairs are never generated
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.name_a, p.name_b) == ("red widget", "ted widget")
    assert p.edit_dist == 1
    # representative = min id, n_rows counts collapsed duplicates
    assert (p.id_a, p.n_a) == (1, 2)
    assert (p.id_b, p.n_b) == (2, 1)


def test_fuzzy_match_pairs_block_guard_raises(spark):
    df = spark.createDataFrame(
        [(1, "a x"), (2, "b x"), (3, "c x")], "id bigint, name string"
    )
    with pytest.raises(Exception, match="max_block_size"):
        fuzzy_match_pairs(
            df, text_col="name", id_col="id", max_block_size=2
        ).collect()


def test_resample_interpolate_fills_gaps_linearly(spark):
    rows = [
        ("a", 0 * HOUR_NS + 5, 1.0),
        ("a", 0 * HOUR_NS + 6, 1.0),
        ("a", 3 * HOUR_NS + 1, 4.0),
        ("b", 7 * HOUR_NS, 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts bigint, v double")
    out = {
        (r.k, r.bucket): r
        for r in resample_interpolate(
            df, key_col="k", ts_col="ts", value_col="v"
        ).collect()
    }
    # observed endpoints pass through
    assert out[("a", 0)].mean_value == 1.0 and out[("a", 0)].n_events == 2
    assert out[("a", 3)].mean_value == 4.0
    # gap buckets: linear between 1.0 @ h0 and 4.0 @ h3
    assert out[("a", 1)].mean_value == 2.0
    assert out[("a", 2)].mean_value == 3.0
    assert out[("a", 1)].n_events == 0 and out[("a", 1)].interpolated
    assert not out[("a", 0)].interpolated
    # a single-bucket key spans only itself — no gap rows invented
    assert [k for k in out if k[0] == "b"] == [("b", 7)]


def test_robust_outliers_median_mad_exact(spark):
    vals = [float(i) for i in range(1, 10)] + [100.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    [r] = robust_outlier_summary(
        df, group_col="grp", value_col="value"
    ).collect()
    assert r.n == 10
    assert r.median_value == 5.5
    assert r.mad == 2.5  # median of |v - 5.5|
    assert r.n_outliers == 1  # only 100.0 beyond 3.5 * MAD
    assert r.max_abs_dev == 94.5


def test_robust_outliers_zero_mad_degenerates_safely(spark):
    # constant group: MAD = 0, so ANY deviation is an outlier — the
    # standard robust-z degeneracy, and the exact-integer comparison
    # (4*dev2 > 0) gets it right without epsilon hacks
    vals = [10.0] * 9 + [10.01]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, value double"
    )
    [r] = robust_outlier_summary(
        df, group_col="grp", value_col="value"
    ).collect()
    assert r.mad == 0.0
    assert r.n_outliers == 1
