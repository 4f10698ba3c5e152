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


def resample_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_ns: int = 3_600_000_000_000,
    value_scale: int = 100,
    round_digits: int | None = None,
) -> DataFrame:
    """Time-series resample + gap fill (the hypertable `time_bucket` +
    `locf`/interpolate rollup, distributed): bucket events per key,
    then fill EMPTY buckets between the first and last observation of
    each key by linear interpolation between the neighboring observed
    bucket means.

    Output: (key, bucket, n_events, mean_value, interpolated) — one
    row per bucket in each key's observed span, n_events = 0 and
    interpolated = true for filled gaps.

    Cross-engine determinism: per-bucket sums run in the scaled-int64
    domain (``value_scale`` implied decimals, exact under any
    partitioning); the mean and the interpolation are then IDENTICAL
    double expressions on both engines (same operands, same
    parenthesization → same IEEE-754 bits); ``round_digits`` optionally
    rounds the final value for presentation.

    Shape at scale: one hash-agg with map-side combine (events →
    buckets collapses the data ~n_per_bucket×), a per-key span agg over
    the already-small bucket frame, one explode bounded by span length,
    one equi-join on (key, bucket), and two windows over the same
    (key, bucket) partitioning — Exchange reuse keeps it to one
    shuffle of the bucket-sized frame. The raw-event frame is touched
    exactly once.
    """
    key, lo, hi = F.col(key_col), F.col("__lo"), F.col("__hi")
    obs = (
        df.groupBy(
            key.alias("key"),
            # integer DIV, never float division: epoch-nanos exceed
            # double's 2^53 mantissa (same guard as range_join_pairs)
            F.expr(f"CAST({ts_col} AS BIGINT) DIV {int(bucket_ns)}").alias(
                "bucket"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(
                F.round(F.col(value_col) * value_scale).cast("bigint")
            ).alias("__sv"),
        )
        .withColumn(
            "__mean",
            (F.col("__sv") / F.lit(float(value_scale))) / F.col("n_events"),
        )
    )
    grid = (
        obs.groupBy("key")
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select("key", F.explode(F.sequence(lo, hi)).alias("bucket"))
    )
    joined = grid.join(obs, ["key", "bucket"], "left")
    w_back = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchored = joined.select(
        "key",
        "bucket",
        "n_events",
        "__mean",
        F.last(
            F.when(F.col("n_events").isNotNull(), F.struct("bucket", "__mean")),
            ignorenulls=True,
        ).over(w_back).alias("__p"),
        F.first(
            F.when(F.col("n_events").isNotNull(), F.struct("bucket", "__mean")),
            ignorenulls=True,
        ).over(w_fwd).alias("__q"),
    )
    pb, pm = F.col("__p.bucket"), F.col("__p.__mean")
    qb, qm = F.col("__q.bucket"), F.col("__q.__mean")
    interp = pm + ((qm - pm) * (F.col("bucket") - pb)) / (qb - pb)
    mean_value = F.when(
        F.col("n_events").isNotNull(), F.col("__mean")
    ).otherwise(interp)
    if round_digits is not None:
        mean_value = F.round(mean_value, round_digits)
    return anchored.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        mean_value.alias("mean_value"),
        F.col("n_events").isNull().alias("interpolated"),
    )


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
