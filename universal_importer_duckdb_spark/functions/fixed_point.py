"""Exact fixed-point aggregation in int64 — the fast path for
money-style sums that must stay bit-identical to a decimal oracle.

``functions/numeric.py`` routes exact sums through Spark DECIMAL.
Correct, but once an expression's precision passes 18 digits the
aggregation buffer leaves long-backed Decimal and every row pays a
JVM BigDecimal multiply+add (measured: the decimal SUM dominated
TPC-H q1-style aggregates ~3x over the same plan with long sums).

This module keeps the exact-arithmetic guarantee with integer ops:

1. per row, the measure is computed as a SCALED BIGINT — e.g.
   extprice*(1-disc)*(1+tax) with 2+4+4 implied decimals is an
   integer < ~1.1e15, exact in int64;
2. the row value is chunked base 10^6 into (hi, mid, lo) and each
   chunk is summed as a plain BIGINT through ONE ordinary groupBy —
   map-side combine applies, exactly one exchange, whole-stage
   codegen, no BigDecimal in the per-row path;
3. per group, the exact integer total is reconstructed in
   DECIMAL(38,0) as hi*10^12 + mid*10^6 + lo — BigDecimal arithmetic
   over one row per group;
4. rounding happens in the integer domain (sign-aware half-up, the
   same rule DuckDB's round() applies), and only the final
   already-rounded integer is cast to double.

Overflow bound (the 100 TB invariant): mid/lo chunks are < 10^6 in
magnitude, so a group's chunk-sum stays inside int64 for any group
under ~9.2e12 rows; the hi chunk is bounded by measure/10^12
(~10^3 for a 4-factor money product), giving a similar ceiling. The
bound depends only on per-GROUP row count — not on partitioning,
executor count, or total data size.

Exactness domain: the reconstructed total must fit DECIMAL(38,0)
(~1e38 — unreachable) and a round_to result must fit int64 after the
shift (≈9e16 dollars at 2 dp — far beyond the 2^53 range where a
double output could represent the answer anyway).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# chunk modulus: per-group mid/lo sums < 1e6 * 9.2e12 rows = int64 max.
_MOD = 10**6
_D38 = "decimal(38,0)"


def scaled(col: Column | str, decimals: int = 2, int_digits: int = 12) -> Column:
    """The column as an exact scaled bigint: value * 10^decimals.

    Semantics: the SAME half-up cast the SQL oracle applies
    (``x::DECIMAL(p,s)`` — both engines round the double's SHORTEST
    DECIMAL representation, so 1.005 rounds to 1.01 even though its
    binary value is 1.00499…; pinned by test_fixed_point's
    adversarial fixture).

    Cost (r13, the q-class x64 decomposition): the decimal cast runs
    Double.toString + BigDecimal per row — the measure map was 1.0 s
    of q1's 1.29 s at x64, ~0.8 µs/row against DuckDB's vectorized
    ~0.03 µs. The hot path here is a guarded double computation:
    ``signum(v)*floor(|v|+0.5)`` over ``v = x*10^d`` equals the
    string-based cast whenever it provably can — |v| < 4e9 keeps the
    scaled string-vs-binary discrepancy below 1e-6 (|S·10^d − v| ≲
    2^−52·|v|), so if |frac(|v|) − 0.5| > 1e-6 both roundings see the
    same side of the boundary. Rows inside the guard band (exact-half
    neighborhoods, |v| ≥ 4e9, NaN/inf) take the original decimal
    cast; CASE short-circuits, so the slow path executes only for
    those rows — none in money-style data, every adversarial fixture
    value by construction."""
    c = F.col(col) if isinstance(col, str) else col
    exact = (
        c.cast(f"decimal({int_digits},{decimals})")
        * F.lit(10**decimals).cast("decimal(5,0)")
    ).cast("bigint")
    v = c * F.lit(float(10**decimals))
    av = F.abs(v)
    frac = av - F.floor(av)
    # the cheap path must also stay inside decimal(int_digits, ·)'s
    # range: out-of-range inputs route to the exact branch so the
    # ANSI overflow error the decimal cast raises is preserved
    # the -0.5 closes the half-ulp hole at the range boundary: an
    # input within 0.5 below 10^int_digits would ROUND UP to exactly
    # 10^int_digits on the cheap path and return silently, where the
    # decimal cast raises ANSI overflow — boundary-adjacent rows must
    # route to the exact branch (r13 advice).
    limit = min(4e9, float(10**int_digits)) - 0.5
    unambiguous = (av < F.lit(limit)) & (
        F.abs(frac - F.lit(0.5)) > F.lit(1e-6)
    )
    cheap = (F.signum(v) * F.floor(av + F.lit(0.5))).cast("bigint")
    return F.when(unambiguous, cheap).otherwise(exact)


@dataclass
class FixedSum:
    """One aggregate output: sum of ``expr`` (a scaled bigint with
    ``k`` implied decimals), rounded to ``round_to`` places and cast
    to double — bit-identical to the oracle's
    ``CAST(round(SUM(<decimal expr>), round_to) AS DOUBLE)``.
    ``round_to=None`` surfaces the exact total as double (caller must
    stay inside 2^53).

    ``direct=True`` opts out of the (hi, mid, lo) chunking: ONE plain
    bigint sum per measure and pure-int64 rounding, no DECIMAL(38)
    anywhere. Only valid when the caller can bound the per-GROUP
    total inside int64 from the data model (e.g. a per-order sum of
    <= 7 lineitems) — the r13 finding was that on HIGH-CARDINALITY
    group-bys (q18's 2.4M order groups) the per-group DECIMAL(38)
    reconstruction, not the row scan, dominates. The chunked default
    remains the 100 TB-safe path for unbounded groups (its bound is
    per-group ROW COUNT ~9.2e12); under ANSI mode an overflowing
    direct sum raises instead of wrapping, so a violated bound is
    loud, never silent corruption."""

    alias: str
    expr: Column
    k: int
    round_to: int | None = 2
    direct: bool = False


def fixed_point_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sums: Sequence[FixedSum],
    avgs: Sequence[tuple[str, str]] = (),
    count_alias: str | None = None,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """GroupBy with exact int64 fixed-point sums (see module doc).

    One shuffle, identical exchange shape to a plain ``groupBy.agg``;
    only the post-combine scalar math differs from a naive long sum.

    ``avgs``: (alias, sum_alias) pairs — exact-total / count in
    double, matching ``CAST(SUM(..) AS DOUBLE)/COUNT(*)``.
    ``extra_aggs``: passed through to the same ``agg`` (e.g. counts
    with their own aliases) and surfaced unchanged.
    """
    gc = list(group_cols)
    proj = df.select(
        "*", *[s.expr.alias(f"__fx{i}") for i, s in enumerate(sums)]
    )
    chunk_aggs: list[Column] = []
    for i, s in enumerate(sums):
        if s.direct:
            chunk_aggs.append(F.sum(F.col(f"__fx{i}")).alias(f"__dt{i}"))
        else:
            chunk_aggs += [
                F.sum(F.expr(f"__fx{i} DIV {_MOD * _MOD}")).alias(f"__hi{i}"),
                F.sum(F.expr(f"(__fx{i} DIV {_MOD}) % {_MOD}")).alias(f"__mi{i}"),
                F.sum(F.expr(f"__fx{i} % {_MOD}")).alias(f"__lo{i}"),
            ]
    combined = proj.groupBy(*gc).agg(
        *chunk_aggs, F.count(F.lit(1)).alias("__fx_n"), *extra_aggs
    )
    # exact integer totals: decimal(38,0) reconstruction for chunked
    # measures, the bigint sum itself for direct ones (the integer
    # rounding CASE below works identically on either type)
    totals = combined.select(
        "*",
        *[
            (
                F.col(f"__dt{i}")
                if s.direct
                else (
                    F.col(f"__hi{i}").cast(_D38) * F.lit(_MOD * _MOD).cast("decimal(13,0)")
                    + F.col(f"__mi{i}").cast(_D38) * F.lit(_MOD).cast("decimal(7,0)")
                    + F.col(f"__lo{i}").cast(_D38)
                )
            ).alias(f"__T{i}")
            for i, s in enumerate(sums)
        ],
    )
    out_cols: list[Column] = [F.col(c) for c in gc]
    by_alias: dict[str, str] = {}
    for i, s in enumerate(sums):
        by_alias[s.alias] = f"__T{i}"
        if s.round_to is None or s.round_to >= s.k:
            val = F.col(f"__T{i}").cast("double") / F.lit(float(10**s.k))
        else:
            # sign-aware half-up in the integer domain: DuckDB/Spark
            # round() both round halves away from zero
            shift = 10 ** (s.k - s.round_to)
            half = shift // 2
            val = (
                F.expr(f"(CASE WHEN __T{i} < 0 THEN __T{i} - {half} "
                       f"ELSE __T{i} + {half} END) DIV {shift}").cast("double")
                / F.lit(float(10**s.round_to))
            )
        out_cols.append(val.alias(s.alias))
    for alias, sum_alias in avgs:
        t = by_alias[sum_alias]
        k = next(s.k for s in sums if s.alias == sum_alias)
        out_cols.append(
            (F.col(t).cast("double") / F.lit(float(10**k)) / F.col("__fx_n")).alias(alias)
        )
    if count_alias:
        out_cols.append(F.col("__fx_n").alias(count_alias))
    out_cols += [F.col(c) for c in combined.columns
                 if not c.startswith("__") and c not in gc]
    return totals.select(*out_cols)
