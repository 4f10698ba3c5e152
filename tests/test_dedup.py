from __future__ import annotations

from universal_importer_duckdb_spark.operators.dedup import (
    dedupe,
    dedupe_cascade,
    dedupe_keep_only,
)


def _df(spark):
    # (k1, k2, val, ord) — groups: (1,1)x3, (2,1)x2, (3,1)x1
    rows = [
        (1, 1, "a", 1),
        (2, 1, "b", 2),
        (1, 1, "c", 3),
        (3, 1, "d", 4),
        (1, 1, "e", 5),
        (2, 1, "f", 6),
    ]
    return spark.createDataFrame(rows, "k1 int, k2 int, val string, _ingest_ord int")


def test_dedupe_first_keeps_lowest_ordinal(spark):
    kept, dups = dedupe(_df(spark), ["k1", "k2"], "first")
    assert {(r.k1, r.val) for r in kept.collect()} == {(1, "a"), (2, "b"), (3, "d")}
    assert dups.count() == 3


def test_dedupe_last_keeps_highest_ordinal(spark):
    # Declared semantics (the reference's live SQL path ignores 'last'
    # and always keeps first — SURVEY.md §2.3 trap; we honor 'last').
    kept, _ = dedupe(_df(spark), ["k1", "k2"], "last")
    assert {(r.k1, r.val) for r in kept.collect()} == {(1, "e"), (2, "f"), (3, "d")}


def test_dedupe_exclude_all_drops_every_group_member(spark):
    kept, dups = dedupe(_df(spark), ["k1", "k2"], "exclude_all")
    assert [(r.k1, r.val) for r in kept.collect()] == [(3, "d")]
    assert dups.count() == 5


def test_dedupe_partition_invariants(spark):
    df = _df(spark).repartition(4)
    for res in ("first", "last", "exclude_all"):
        kept, dups = dedupe(df, ["k1", "k2"], res)
        assert kept.count() + dups.count() == df.count()
        assert kept.groupBy("k1", "k2").count().filter("count > 1").count() == 0


def test_dedupe_cascade_sequential_keys(spark):
    kept, dups = dedupe_cascade(_df(spark), [["k1", "k2"], ["k2"]], "first")
    # first key → 3 rows (k2 all 1); second key k2 → 1 row
    assert kept.count() == 1
    assert kept.collect()[0].val == "a"
    assert dups.count() == 5


def test_dedupe_keep_only_agg_path_matches_window_path(spark):
    df = _df(spark)
    for res in ("first", "last", "exclude_all"):
        w_kept, _ = dedupe(df, ["k1", "k2"], res)
        a_kept = dedupe_keep_only(df, ["k1", "k2"], res)
        assert {tuple(r) for r in w_kept.collect()} == {tuple(r) for r in a_kept.collect()}
