"""Dataset profiling ("data card"): per-column null counts, distinct
cardinalities, and min/max ranges in ONE pass over the table — the
summary surface a data pipeline publishes next to every output (the
generalization of the reference's per-entity count summaries,
main.py:262 summary block, from whole-table counts to per-column
statistics).

Shape at scale: a single aggregate job computes every column's stats
together (one scan, map-side partials), then the one-row result is
exploded into the (column, stats) long form — the unpivot costs
nothing because it runs on one row. Exact per-column COUNT(DISTINCT)
in one aggregate makes Spark expand the input n_cols+1 ways before
the shuffle; that is acceptable into the tens of columns, and
``exact_distinct=False`` swaps in the HLL++ sketch
(approx_count_distinct) for the 100 TB path — same one-scan shape,
no expand, mergeable partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    render: dict[str, object] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One row per column: ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)`` with min/max rendered as strings.

    ``render`` maps a column name to how its min/max are rendered —
    a type name to cast to first (e.g. ``"decimal(15,2)"`` for money
    doubles, ``"date"`` for midnight timestamps) chosen so the string
    form is identical cross-engine; unlisted columns cast straight to
    string."""
    render = render or {}
    cols = df.columns

    def rendered(c: str, agg) -> Column:
        r = render.get(c)
        base = F.col(c).cast(r) if r else F.col(c)
        return agg(base).cast("string")

    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"),
            distinct(c).cast("bigint").alias(f"__nd_{c}"),
            rendered(c, F.min).alias(f"__min_{c}"),
            rendered(c, F.max).alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")
