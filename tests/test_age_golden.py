"""Golden edge-case tests: age_years must match DuckDB
date_part('year', age(...)) exactly (SURVEY.md §7.3 hard part) —
anniversary boundaries, leap days, same-day."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

CASES = [
    # (birthday, today)
    ("1990-08-13", "2026-08-13"),  # birthday today -> exactly 36
    ("1990-08-14", "2026-08-13"),  # birthday tomorrow -> still 35
    ("1990-08-12", "2026-08-13"),  # birthday yesterday -> 36
    ("2000-02-29", "2026-02-28"),  # leap-day birthday, day before in common year
    ("2000-02-29", "2026-03-01"),  # leap-day birthday, day after
    ("2000-02-29", "2028-02-29"),  # leap-day birthday on a leap year
    ("1999-12-31", "2026-01-01"),  # year boundary
    ("2026-08-13", "2026-08-13"),  # born today
    ("1970-01-01", "2026-08-13"),
]


@pytest.mark.parametrize("birthday,today", CASES)
def test_age_years_matches_duckdb(spark, birthday, today):
    from universal_importer_duckdb_spark.operators.rules import age_years

    got = (
        spark.createDataFrame([(birthday,)], "d string")
        .select(age_years(F.col("d"), F.lit(today)).alias("age"))
        .collect()[0]
        .age
    )
    expected = duckdb.sql(
        f"SELECT CAST(date_part('year', age(DATE '{today}', DATE '{birthday}')) AS INT)"
    ).fetchone()[0]
    assert got == expected, f"{birthday} @ {today}: spark={got} duckdb={expected}"
