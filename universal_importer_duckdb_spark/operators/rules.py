"""Custom-validation rule engine (reference main.py:161-197).

Pluggable registry ``{rule_name: builder}`` where a builder returns a
boolean *failure* Column for the configured field. The reference has
exactly one rule, ``age_gte`` (main.py:172-176), implemented there as
DuckDB ``DATE_PART('year', AGE(today, field::DATE)) < min_age``.

``age_years`` reproduces DuckDB/Postgres AGE year-component semantics
exactly: full calendar years elapsed, decremented when the month/day
of ``today`` precedes the anniversary. (``months_between/12`` is NOT
used — its 31-day-month fractional convention diverges on month-end
edges; golden-tested against DuckDB in tests/test_oracle_parity.py.)

Modes (reference main.py:186-194): ``stop`` raises ValueError when any
row fails; ``skip`` filters failing rows out, returning them as data.
``today`` is injectable for deterministic tests (the reference uses
wall-clock ``datetime.today()``, main.py:169).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def age_years(col: Column, today: Column) -> Column:
    """Whole calendar years between ``col`` (a date) and ``today`` —
    DuckDB ``date_part('year', age(today, col))`` equivalent."""
    d = F.to_date(col)
    t = F.to_date(today)
    not_yet = (F.month(t) < F.month(d)) | (
        (F.month(t) == F.month(d)) & (F.dayofmonth(t) < F.dayofmonth(d))
    )
    return F.year(t) - F.year(d) - F.when(not_yet, 1).otherwise(0)


def _age_gte_fail(field: str, params: dict[str, Any], today: str) -> Column:
    min_age = params["min_age"]
    return age_years(F.col(field), F.lit(today)) < F.lit(min_age)


# rule name -> (field, params, today_iso) -> failure Column
RULE_REGISTRY: dict[str, Callable[[str, dict[str, Any], str], Column]] = {
    "age_gte": _age_gte_fail,
}


def register_rule(name: str, builder: Callable[[str, dict[str, Any], str], Column]) -> None:
    RULE_REGISTRY[name] = builder


def execute_custom_validations(
    df: DataFrame,
    rules: list[dict[str, Any]],
    mode: str = "skip",
    today: str | None = None,
) -> tuple[DataFrame, list[dict[str, Any]]]:
    """Apply configured rules; return ``(kept, issues)``.

    ``issues`` is one entry per rule: {field, validation, params,
    invalid: DataFrame}. Unknown rule names are skipped with a notice
    (reference main.py:195 logs and continues). ``stop`` mode raises
    ValueError naming the first failing rule (reference main.py:186-187).
    """
    today = today or _dt.date.today().isoformat()
    kept = df
    issues: list[dict[str, Any]] = []
    for rule in rules:
        name = rule.get("validation")
        field = rule.get("field")
        params = rule.get("params", {})
        builder = RULE_REGISTRY.get(name)
        if builder is None:
            issues.append({"field": field, "validation": name, "params": params,
                           "invalid": None, "skipped": True})
            continue
        fail = builder(field, params, today)
        invalid = kept.filter(fail)
        if mode == "stop":
            n = invalid.count()
            if n > 0:
                raise ValueError(
                    f"Custom validation '{name}' failed for {n} rows on field '{field}'"
                )
        else:
            kept = kept.filter(~F.coalesce(fail, F.lit(False)))
        issues.append({"field": field, "validation": name, "params": params,
                       "invalid": invalid, "skipped": False})
    return kept, issues
