"""Ordered-funnel conversion analysis over an event stream.

"Of the users who did A, how many later did B, and later still C?" —
the staple product-analytics query (reference anchor: none; the
reference has no event analytics — north-star scope alongside
sessionization/transition-matrix in this repo).

Ordering matters: a purchase *before* the first view must not count,
so this is not three independent filters. The scalable shape is ONE
shuffle: group events by user, collect the (ts, type) pairs, and
resolve the stage chain with array higher-order functions on the
grouped list — first A, then the earliest B at-or-after it, then the
earliest C at-or-after that. Per-user event counts are bounded by
human activity, so the collected lists stay small no matter the
corpus size (same justification as sessionization); everything runs
JVM-side.

Timestamps are folded to epoch microseconds (exact BIGINT) so the
stage arithmetic and the conversion-lag sums are integer-exact across
engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_by_cohort(
    events: DataFrame,
    stages: Sequence[str] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohorted 3-stage ordered funnel.

    Returns one row per first-stage cohort day:
    ``(cohort_day, n_stage1, n_stage2, n_stage3,
    total_conversion_micros)`` where n_stageK counts users whose
    stage-K event exists at-or-after their stage-(K-1) event, and the
    total is the summed stage1->stage3 lag in microseconds over fully
    converted users.
    """
    if len(stages) != 3:
        raise ValueError("funnel_by_cohort resolves exactly 3 stages")
    s1, s2, s3 = stages

    # Accept either a real timestamp column or the repo's normalized
    # epoch-nanos BIGINT (entry_queries._t) — both fold to exact
    # epoch micros (nanos here are always whole-microsecond).
    ts_type = dict(events.dtypes)[ts_col]
    if ts_type in ("bigint", "long"):
        # integer `div`, not `/`: epoch-nanos exceed 2^53, double
        # division would lose exactness
        micros = F.expr(f"`{ts_col}` div 1000")
    else:
        micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user_id"),
        micros.alias("us"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(list(stages)))

    def earliest(arr, typ, not_before):
        hits = F.filter(
            arr,
            lambda x: (x["etype"] == F.lit(typ)) & (x["us"] >= not_before),
        )
        return F.array_min(F.transform(hits, lambda x: x["us"]))

    per_user = (
        ev.groupBy("user_id")
        .agg(F.collect_list(F.struct("us", "etype")).alias("evs"))
        # LONG_MIN sentinel, not 0: the oracle has no lower bound on
        # stage-1 timestamps, so a 0 floor would silently drop
        # pre-1970 events only on the Spark side (r6 advice).
        .withColumn(
            "t1",
            earliest(
                F.col("evs"),
                s1,
                F.lit(-9223372036854775808).cast("bigint"),
            ),
        )
        .withColumn("t2", earliest(F.col("evs"), s2, F.col("t1")))
        .withColumn("t3", earliest(F.col("evs"), s3, F.col("t2")))
        .filter(F.col("t1").isNotNull())
    )

    return (
        per_user.withColumn("cohort_day", F.expr("t1 div 86400000000"))
        .groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).alias("n_stage1"),
            F.count("t2").alias("n_stage2"),
            F.count("t3").alias("n_stage3"),
            F.coalesce(
                F.sum(
                    F.when(F.col("t3").isNotNull(), F.col("t3") - F.col("t1"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("total_conversion_micros"),
        )
    )
