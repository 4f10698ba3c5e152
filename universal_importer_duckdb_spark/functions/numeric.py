"""Cross-engine-deterministic numeric helpers.

Floating-point SUM is order-dependent; Spark's partial aggregation
order differs from any single-node engine, so ``sum(double)`` is not
bit-reproducible against an oracle. These helpers route money-style
aggregates through exact DECIMAL arithmetic (associative, order-free)
and cast the exact result back to double — bit-identical on any
engine that applies the same casts, and no slower in Spark (decimal
sum is still a map-side partial aggregate in whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,4)"


def money(col: Column | str) -> Column:
    """Project a double into exact money decimal(18,4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def decimal_sum(col: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(col).cast("double").alias(alias)


def exact_avg(col: Column, alias: str) -> Column:
    """avg as exact-decimal sum divided by count, in double — a single
    IEEE division of engine-identical operands."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)
