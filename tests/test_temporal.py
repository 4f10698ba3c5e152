"""Unit tests for the temporal join operators (asof_join /
range_join_pairs) on hand-built frames where every expected match is
enumerable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.temporal import (
    asof_join,
    range_join_pairs,
)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (2, 50, "c"), (3, 10, "d")],
        "k bigint, ts bigint, tag string",
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (1, 300, 3.0), (2, 60, 4.0)],
        "k bigint, ts bigint, v double",
    )
    return left, right


def test_asof_backward(frames):
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", right_value_cols=["v"])
    got = {r.tag: r.asof_v for r in out.collect()}
    # equal ts is inclusive (l.ts >= r.ts); no preceding right -> NULL
    assert got == {"a": 1.0, "b": 2.0, "c": None, "d": None}


def test_asof_forward(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", ts_col="ts", right_value_cols=["v"],
        direction="forward",
    )
    got = {r.tag: r.asof_v for r in out.collect()}
    assert got == {"a": 1.0, "b": 3.0, "c": 4.0, "d": None}


def test_asof_keeps_left_row_count_and_columns(frames):
    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", right_value_cols=["v"])
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_asof_bad_direction(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", ts_col="ts", right_value_cols=["v"],
                  direction="nearest")


@pytest.fixture(scope="module")
def interval_frames(spark):
    # intervals of length 100 starting at start; points at boundaries
    intervals = spark.createDataFrame(
        [(1, 100, "w1"), (1, 350, "w2"), (2, 0, "w3")],
        "k bigint, start bigint, iv string",
    )
    points = spark.createDataFrame(
        [
            (1, 100, "on-start"),     # included (>= start)
            (1, 199, "inside"),       # included
            (1, 200, "on-end"),       # excluded (< start+len)
            (1, 360, "w2-inside"),    # included in w2
            (2, 99, "w3-inside"),     # included in w3
            (3, 150, "other-key"),    # excluded: key mismatch
        ],
        "k bigint, ts bigint, name string",
    )
    return points, intervals


def test_range_join_boundaries(interval_frames):
    points, intervals = interval_frames
    pairs = range_join_pairs(
        points, intervals, on="k", point_ts="ts",
        interval_start="start", interval_len=100,
    )
    got = {(r.iv, r.pt_name) for r in pairs.collect()}
    assert got == {
        ("w1", "on-start"),
        ("w1", "inside"),
        ("w2", "w2-inside"),
        ("w3", "w3-inside"),
    }


def test_range_join_smaller_buckets_same_result(interval_frames):
    points, intervals = interval_frames
    pairs = range_join_pairs(
        points, intervals, on="k", point_ts="ts",
        interval_start="start", interval_len=100, bucket_size=30,
    )
    got = {(r.iv, r.pt_name) for r in pairs.collect()}
    assert got == {
        ("w1", "on-start"),
        ("w1", "inside"),
        ("w2", "w2-inside"),
        ("w3", "w3-inside"),
    }


def test_range_join_fanout_guard(interval_frames):
    points, intervals = interval_frames
    with pytest.raises(ValueError):
        range_join_pairs(
            points, intervals, on="k", point_ts="ts",
            interval_start="start", interval_len=100_000, bucket_size=1,
        )


def test_asof_plan_has_single_shuffle(frames):
    import contextlib
    import io
    import re

    left, right = frames
    out = asof_join(left, right, on="k", ts_col="ts", right_value_cols=["v"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the union+window formulation must not introduce a join at all
    assert "Join" not in plan
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1


def test_asof_null_in_matched_row_stays_null(spark):
    """A NULL value column in the MATCHED right row must come through
    as NULL — not backfilled from an older right row — and multiple
    value columns must all come from the same matched row (they travel
    as one struct through a single last(ignorenulls=True))."""
    left = spark.createDataFrame(
        [(1, 150, "x"), (1, 250, "y")], "k bigint, ts bigint, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 1.0, "old"), (1, 200, None, None)],
        "k bigint, ts bigint, v double, s string",
    )
    out = asof_join(left, right, on="k", ts_col="ts", right_value_cols=["v", "s"])
    got = {r.tag: (r.asof_v, r.asof_s) for r in out.collect()}
    assert got == {"x": (1.0, "old"), "y": (None, None)}
