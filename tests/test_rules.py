from __future__ import annotations

import pytest

from universal_importer_duckdb_spark.operators.rules import (
    execute_custom_validations,
    register_rule,
)


def _people(spark):
    rows = [
        (1, "2000-06-15"),  # 26 at 2026-08-13
        (2, "1980-01-01"),  # 46
        (3, "1991-08-14"),  # 34 (birthday tomorrow)
        (4, "1991-08-13"),  # 35 (birthday today)
        (5, None),          # null birthday: kept (matches reference DELETE semantics)
    ]
    return spark.createDataFrame(rows, "id int, birthday_on string")


RULES = [{"field": "birthday_on", "validation": "age_gte", "params": {"min_age": 35}}]


def test_age_gte_skip_filters_underage(spark):
    kept, issues = execute_custom_validations(
        _people(spark), RULES, mode="skip", today="2026-08-13"
    )
    assert sorted(r.id for r in kept.collect()) == [2, 4, 5]
    assert sorted(r.id for r in issues[0]["invalid"].collect()) == [1, 3]


def test_age_gte_stop_raises(spark):
    with pytest.raises(ValueError, match="age_gte"):
        execute_custom_validations(_people(spark), RULES, mode="stop", today="2026-08-13")


def test_unknown_rule_is_skipped(spark):
    df = _people(spark)
    kept, issues = execute_custom_validations(
        df, [{"field": "id", "validation": "nope", "params": {}}], mode="skip"
    )
    assert kept.count() == df.count()
    assert issues[0]["skipped"] is True


def test_registered_rule_runs(spark):
    from pyspark.sql import functions as F

    register_rule("positive", lambda field, params, today: F.col(field) <= 0)
    df = spark.createDataFrame([(1,), (-2,)], "id int")
    kept, _ = execute_custom_validations(
        df, [{"field": "id", "validation": "positive", "params": {}}], mode="skip"
    )
    assert [r.id for r in kept.collect()] == [1]


def test_range_between_rule(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 50.0), (3, 500.0), (4, None)],
                               "id int, v double")
    kept, issues = execute_custom_validations(
        df, [{"field": "v", "validation": "range_between",
              "params": {"min": 10, "max": 100}}], mode="skip")
    # null predicate rows are kept (reference DELETE semantics)
    assert sorted(r.id for r in kept.collect()) == [2, 4]
    assert sorted(r.id for r in issues[0]["invalid"].collect()) == [1, 3]


def test_regex_match_rule(spark):
    df = spark.createDataFrame([(1, "AB-1"), (2, "XY-2"), (3, "AB9")],
                               "id int, code string")
    kept, _ = execute_custom_validations(
        df, [{"field": "code", "validation": "regex_match",
              "params": {"pattern": "^AB-"}}], mode="skip")
    assert sorted(r.id for r in kept.collect()) == [1]


def test_value_in_set_rule(spark):
    df = spark.createDataFrame([(1, "F"), (2, "O"), (3, "Z")], "id int, s string")
    kept, _ = execute_custom_validations(
        df, [{"field": "s", "validation": "value_in_set",
              "params": {"allowed": ["F", "O"]}}], mode="skip")
    assert sorted(r.id for r in kept.collect()) == [1, 2]


def test_referential_check_splits_orphans(spark):
    from universal_importer_duckdb_spark.operators.rules import referential_check

    facts = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id int, fk int")
    dim = spark.createDataFrame([(10,), (20,), (30,)], "pk int")
    referenced, orphans = referential_check(facts, dim, ["fk"], ["pk"])
    assert sorted(r.id for r in referenced.collect()) == [1, 2]
    assert sorted(r.id for r in orphans.collect()) == [3]
    # split is a partition of the input
    assert referenced.count() + orphans.count() == facts.count()
