"""Robust outlier detection: per-group median/MAD (median absolute
deviation) flagging — the standard anomaly screen for metric columns,
immune to the outliers it hunts (unlike mean/stddev z-scores, where a
single extreme value inflates the threshold that is supposed to catch
it).

The reference has no statistical screens (its validations are
per-row predicates, main.py:152); this is a scale-path extension per
the north star — the data-quality gate a 100 TB ingest runs per
partition/day to catch broken upstream feeds.

Cross-engine determinism — everything stays in EXACT integer
arithmetic until the final rendering division:

- values scale to int64 (``value_scale`` implied decimals, exact).
- ``med2`` = 2 x the interpolated median of the scaled ints. Both
  engines define the interpolated quantile at index (n-1)/2, which
  for integers is either one element (2a, even doubling) or the mean
  of two (a+b) — so med2 is an EXACT integer either way, recovered by
  one lossless double->bigint cast.
- deviations ``|2*v - med2|`` and their doubled median ``mad2`` are
  integers by the same argument.
- the flag ``4*|2v - med2| > 7*mad2`` is the classic
  |v - med| > 3.5*MAD rule with every factor cleared — an integer
  comparison, bit-identical on any engine, any partitioning.

Shape at scale: ONE exchange on the group key, then both holistic
medians run as window aggregates over that same partitioning (Spark
reuses the exchange — the second window and the final group-by add no
shuffle), and the summary is a map-side-combined aggregation over
keys the data is already clustered on. Parallelism is bounded by
group cardinality — inherent to exact per-group medians; for
few-group/odd-skew corpora at extreme scale, swap the exact median
for the certified sketch path (orders_quantile_envelope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robust_outlier_summary"]


def robust_outlier_summary(
    df: DataFrame,
    group_col: str,
    value_col: str,
    value_scale: int = 100,
    mad_multiplier_x2: int = 7,
) -> DataFrame:
    """Per-group robust summary: ``(group, n, median_value, mad,
    n_outliers, max_abs_dev)`` where an outlier is
    |v - median| > (mad_multiplier_x2/2) * MAD (default 3.5 — the
    standard robust-z cutoff).

    ``mad_multiplier_x2`` is the doubled threshold so callers can pick
    half-integer multipliers while the comparison stays integral.
    """
    w = Window.partitionBy("grp")
    scaled = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * value_scale).cast("bigint").alias("__v"),
    )
    with_med = scaled.withColumn(
        "__med2",
        (F.percentile("__v", F.lit(0.5)).over(w) * 2).cast("bigint"),
    ).withColumn(
        "__dev2", F.abs(F.lit(2) * F.col("__v") - F.col("__med2"))
    )
    with_mad = with_med.withColumn(
        "__mad2",
        (F.percentile("__dev2", F.lit(0.5)).over(w) * 2).cast("bigint"),
    )
    return (
        with_mad.groupBy("grp", "__med2", "__mad2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(
                    F.lit(4) * F.col("__dev2")
                    > F.lit(mad_multiplier_x2) * F.col("__mad2"),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.max("__dev2").alias("__maxdev2"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            (F.col("__med2") / F.lit(float(2 * value_scale))).alias(
                "median_value"
            ),
            (F.col("__mad2") / F.lit(float(4 * value_scale))).alias("mad"),
            "n_outliers",
            # __dev2 = 2*scale*|v - med|, so the unscaling factor is
            # 2*scale (mad2 carries an extra doubling, hence 4*scale)
            (F.col("__maxdev2") / F.lit(float(2 * value_scale))).alias(
                "max_abs_dev"
            ),
        )
    )
