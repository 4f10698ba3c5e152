"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional data skipping. At 100 TB the dominant cost is the
scan; parquet min/max footer stats prune files only when the file
layout correlates with the filter columns. A sort on one column gives
perfect pruning on that column and none on any other; interleaving
the bits of several columns (the Morton curve) gives bounded min/max
ranges on EVERY interleaved column in every file — the layout trick
behind Delta OPTIMIZE ZORDER BY, expressed here as plain integer
column arithmetic plus repartitionByRange.

The code is a sum of shift/mask terms — whole-stage-codegen'd integer
ops, replayed bit-for-bit in the SQL oracle (``>> & <<`` behave
identically on non-negative BIGINTs in both engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_code", "zorder_repartition"]


def morton_code(x, y, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single BIGINT Morton code (x takes the even bit
    positions, y the odd). Callers mask/offset their columns into
    [0, 2^bits) first; 16+16 bits keeps the code well inside int64."""
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        code = code + F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i)
        code = code + F.shiftleft(
            F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return code


def morton_code_sql(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB replay of :func:`morton_code` — same term order."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_repartition(
    df: DataFrame,
    x,
    y,
    num_partitions: int,
    bits: int = 16,
    code_col: str = "__zcode",
) -> DataFrame:
    """Cluster ``df`` along the Morton curve of (x, y):
    repartitionByRange on the code (range exchange with a sampled
    histogram — balanced output files regardless of skew in either
    column) then sort within partitions, so each written file covers a
    compact curve segment and its min/max footer stats are tight on
    BOTH columns. Drop-in before ``.write.parquet`` — the written
    data is what makes later selective scans cheap."""
    coded = df.withColumn(code_col, morton_code(x, y, bits))
    return (
        coded.repartitionByRange(num_partitions, F.col(code_col))
        .sortWithinPartitions(code_col)
        .drop(code_col)
    )
