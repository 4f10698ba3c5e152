"""Temporal join operators Spark lacks natively: as-of join and
interval range join (SURVEY.md §2.7 lists all join forms as ABSENT in
the reference — these are scale-path extensions the driver's north
star calls for).

Both are built from shuffle-bounded compositions, never a
broadcast-nested-loop over an inequality:

- as-of join: union the two sides, one window over (key, ts) carries
  the most recent right-side values forward onto left rows. One
  shuffle on the key, zero row explosion — the classic
  merge-as-you-scan formulation, distributed.
- range join: quantize time into buckets sized to the interval
  length, explode each interval onto the (<= 2) buckets it covers,
  equi-join points on (key, bucket), then re-check the exact bounds.
  Turns an inequality join into an equi shuffle join whose fan-out is
  bounded by ceil(len/bucket)+1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right.ts <= left.ts (direction='backward'; 'forward' symmetric)
    within the same `on` key. Matches DuckDB `ASOF LEFT JOIN ... ON
    l.key = r.key AND l.ts >= r.ts` semantics, including the
    inclusive bound: at equal ts the right row sorts before the left
    row, so it is visible to it.

    right_value_cols are carried onto the left rows as
    `asof_<name>` (NULL when no right row precedes). All value columns
    come from the SAME matched right row — they travel as one struct
    through a single ``last(ignorenulls=True)``, so a NULL in one value
    column of the matched row stays NULL instead of being backfilled
    from an older right row (DuckDB ASOF semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    lcols = left.columns
    rstruct = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_value_cols]
    )
    tagged_r = right.select(
        F.col(on).alias(on),
        F.col(ts_col).alias(ts_col),
        F.lit(0).alias("__side"),
        # Non-null struct per right row (even if every field is null) —
        # the ignorenulls window skips left rows, never right rows.
        F.struct(*[F.col(c).alias(c) for c in right_value_cols]).alias("__rv"),
        *[F.lit(None).alias(f"__l_{c}") for c in lcols if c not in (on, ts_col)],
    )
    tagged_l = left.select(
        F.col(on).alias(on),
        F.col(ts_col).alias(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rstruct).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in (on, ts_col)],
    )
    unioned = tagged_r.unionByName(tagged_l)

    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc(ts_col), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(on)
            .orderBy(F.desc(ts_col), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    carried = unioned.select(
        on,
        ts_col,
        "__side",
        F.last("__rv", ignorenulls=True).over(w).alias("__rv"),
        *[F.col(f"__l_{c}") for c in lcols if c not in (on, ts_col)],
    )
    out = (
        carried.filter(F.col("__side") == 1)
        .select(
            "*",
            *[F.col("__rv")[c].alias(f"asof_{c}") for c in right_value_cols],
        )
        .drop("__side", "__rv")
    )
    renames = {f"__l_{c}": c for c in lcols if c not in (on, ts_col)}
    return out.withColumnsRenamed(renames)


def range_join_pairs(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    interval_start: str,
    interval_len,
    bucket_size=None,
) -> DataFrame:
    """Pairs (interval row, point row) where
    interval_start <= point_ts < interval_start + interval_len within
    the same `on` key. interval_len and bucket_size are in the ts
    unit (the driver's events use int64 nanos).

    Columns from `intervals` keep their names; `points` columns are
    prefixed `pt_`. bucket_size defaults to interval_len, giving a
    fan-out of at most 2 bucket copies per interval.
    """
    bucket = int(bucket_size or interval_len)
    length = int(interval_len)
    n_buckets = length // bucket + 1  # buckets an interval can touch
    # guard against pathological inputs silently exploding
    if n_buckets > 64:
        raise ValueError("interval_len/bucket_size fan-out > 64; pick a larger bucket")

    # integer DIV, not float division: epoch-nanos (~1.7e18) are far
    # beyond double's 2^53 mantissa, so a float bucket id can land on
    # the wrong side of a boundary and silently drop a pair.
    # (DIV truncates toward zero — ts must be non-negative.)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"CAST({interval_start} AS BIGINT) DIV {bucket}"),
                F.expr(f"(CAST({interval_start} AS BIGINT) + {length - 1}) DIV {bucket}"),
            )
        ),
    )

    pt = points.select(
        F.col(on).alias("__pt_on"),
        F.expr(f"CAST({point_ts} AS BIGINT) DIV {bucket}").alias("__b"),
        *[F.col(c).alias(f"pt_{c}") for c in points.columns],
    )
    joined = iv.join(
        pt,
        (iv[on] == pt["__pt_on"]) & (iv["__b"] == pt["__b"]),
    ).drop("__b", "__pt_on")
    return joined.filter(
        (F.col(f"pt_{point_ts}") >= F.col(interval_start))
        & (F.col(f"pt_{point_ts}") < F.col(interval_start) + F.lit(length))
    )
