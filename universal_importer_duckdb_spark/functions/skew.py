"""Skew-mitigation utilities for joins and aggregations.

AQE's skew-join handles moderate runtime skew; these helpers cover the
pathological cases (one key holding a large fraction of all rows)
where pre-planned salting is the reliable fix at 100 TB.

``salted_join``: equi-join where the LEFT (large, skewed) side gets a
deterministic salt in [0, salt) and the RIGHT (smaller) side is
replicated salt times, so one hot key spreads over ``salt`` reducers.
Produces exactly the rows of the plain inner join (verified in
tests). ``salted_count``: skew-safe groupBy count via two-stage
partial aggregation (salt, sum) — Spark's hash aggregate already does
map-side partials for sums/counts; this shape matters for
count-distinct-like aggregates where partials do not compose.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``keys`` with the left side salted and the right
    side replicated. ``how`` supports inner/left joins (right-side
    replication breaks right/full semantics)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins only")
    # deterministic salt: spreads rows of one key over `salt` buckets
    # without RNG (reproducible under retries, unlike rand())
    salt_expr = F.pmod(F.xxhash64(*[F.col(k) for k in left.columns]), F.lit(salt))
    l = left.withColumn(SALT_COL, salt_expr)
    r = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def salted_count_distinct(
    df: DataFrame, group_key: str, distinct_col: str, salt: int = 8
) -> DataFrame:
    """count(DISTINCT x) per group without funneling a hot group
    through one reducer: stage 1 dedups (group, salt-bucketed x),
    stage 2 sums partial distinct counts."""
    stage1 = (
        df.select(group_key, distinct_col)
        .withColumn(SALT_COL, F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salt)))
        .groupBy(group_key, SALT_COL)
        .agg(F.count_distinct(F.col(distinct_col)).alias("__partial"))
    )
    return stage1.groupBy(group_key).agg(
        F.sum("__partial").alias(f"n_distinct_{distinct_col}")
    )
