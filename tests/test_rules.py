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
