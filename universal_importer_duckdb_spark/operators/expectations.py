"""Suite-level data-quality expectations (Deequ/Great-Expectations
shape): declare dataset-level checks, evaluate them all in ONE
aggregation pass, emit a report table.

The reference validates row-by-row (main.py:68 area) and this repo's
``operators/validate.py`` reproduces that per-row contract; what a
production table ALSO needs is the dataset-level gate run before
publishing a snapshot — "row count in range, null rate under x,
key unique, values in domain". Those are aggregates, so the entire
suite folds into a single groupBy-less ``agg`` (map-side combinable,
one job, no shuffle beyond the final 1-row reduce) no matter how many
checks are declared. Referential checks add one anti-join each.

Exactness: every observation is emitted as an exact integer
numerator/denominator pair (fractions are never divided into floats),
so the report hash-checks cross-engine bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One suite check. ``kind`` selects the aggregate:

    - row_count_between:      lo <= count(*) <= hi
    - null_fraction_at_most:  nulls(col)/count(*) <= num/den
    - unique:                 countDistinct(col) == count(col)
    - min_at_least / max_at_most: bound on col extremum (integer cols)
    - values_in:              no value of col outside ``values``
    """

    name: str
    kind: str
    column: str | None = None
    lo: int | None = None
    hi: int | None = None
    num: int | None = None
    den: int | None = None
    values: tuple | None = None


def _agg_exprs(checks: list[Expectation]):
    exprs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, c in enumerate(checks):
        if c.kind == "null_fraction_at_most":
            exprs.append(
                F.count(F.when(F.col(c.column).isNull(), 1))
                .cast("bigint")
                .alias(f"__e{i}")
            )
        elif c.kind == "unique":
            exprs.append(
                (F.count(c.column) - F.countDistinct(c.column))
                .cast("bigint")
                .alias(f"__e{i}")
            )
        elif c.kind == "min_at_least":
            exprs.append(F.min(c.column).cast("bigint").alias(f"__e{i}"))
        elif c.kind == "max_at_most":
            exprs.append(F.max(c.column).cast("bigint").alias(f"__e{i}"))
        elif c.kind == "values_in":
            exprs.append(
                F.count(
                    F.when(~F.col(c.column).isin(list(c.values)), 1)
                )
                .cast("bigint")
                .alias(f"__e{i}")
            )
        elif c.kind == "row_count_between":
            pass  # uses __n
        else:
            raise ValueError(f"unknown expectation kind: {c.kind}")
    return exprs


def run_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Evaluate the suite in one aggregation; returns one row per
    check: ``(check_name, passed, observed_num, observed_den)`` where the
    observation is the exact integer fact the verdict is based on
    (violation count, null numerator/denominator, extremum, count).
    """
    agg = df.agg(*_agg_exprs(checks))

    rows = []
    for i, c in enumerate(checks):
        n = F.col("__n")
        if c.kind == "row_count_between":
            passed = (n >= c.lo) & (n <= c.hi)
            num, den = n, F.lit(1).cast("bigint")
        elif c.kind == "null_fraction_at_most":
            e = F.col(f"__e{i}")
            # nulls/n <= num/den  <=>  nulls*den <= num*n  (exact ints)
            passed = (e * c.den) <= (F.lit(c.num) * n)
            num, den = e, n
        elif c.kind == "unique":
            e = F.col(f"__e{i}")
            passed = e == 0
            num, den = e, F.lit(1).cast("bigint")
        elif c.kind == "min_at_least":
            e = F.col(f"__e{i}")
            passed = e >= c.lo
            num, den = e, F.lit(1).cast("bigint")
        elif c.kind == "max_at_most":
            e = F.col(f"__e{i}")
            passed = e <= c.hi
            num, den = e, F.lit(1).cast("bigint")
        else:  # values_in
            e = F.col(f"__e{i}")
            passed = e == 0
            num, den = e, F.lit(1).cast("bigint")
        rows.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                passed.alias("passed"),
                num.alias("observed_num"),
                den.alias("observed_den"),
            )
        )

    return (
        agg.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.check_name", "r.passed", "r.observed_num", "r.observed_den")
    )


def orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Referential-integrity observation: rows of ``child`` whose key
    has no match in ``parent`` (one anti-join; broadcast when the
    parent key set is small). One row: (check_name, passed, observed_num,
    observed_den)."""
    orphans = (
        child.select(F.col(child_key).alias("__k"))
        .join(
            parent.select(F.col(parent_key).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    )
    return orphans.select(
        F.lit(f"fk_{child_key}_in_{parent_key}").alias("check_name"),
        (F.col("__o") == 0).alias("passed"),
        F.col("__o").alias("observed_num"),
        F.lit(1).cast("bigint").alias("observed_den"),
    )
