"""Streaming ordered-funnel via applyInPandasWithState.

The batch funnel (operators/funnel.py) resolves view -> click ->
purchase per user in one shuffle. The streaming form must converge to
the SAME answer no matter how the source splits into micro-batches or
how late events arrive: a click discarded in batch 3 can become the
stage-2 answer when batch 7 delivers an even earlier first view. So
per-user state keeps the full stage-relevant timestamp lists (bounded
by human activity per user, the same justification as the batch
collect) and re-resolves the chain each batch. Output is update-mode:
one row per (user, batch) with a monotone ``n_seen`` so the consumer
keeps each user's final row with ``max_by``.

State is exact integers end to end (epoch micros), so the drained
stream is bit-equal to the batch funnel and shares its oracle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_seen bigint, t1 bigint, t2 bigint, t3 bigint"
)
STATE_SCHEMA = (
    "n_seen bigint, views array<bigint>, clicks array<bigint>, "
    "purchases array<bigint>"
)

_STAGES = ("view", "click", "purchase")


def _resolve(views, clicks, purchases):
    t1 = min(views) if views else None
    t2 = (
        min((c for c in clicks if c >= t1), default=None)
        if t1 is not None
        else None
    )
    t3 = (
        min((p for p in purchases if p >= t2), default=None)
        if t2 is not None
        else None
    )
    return t1, t2, t3


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, views, clicks, purchases = (
        state.get if state.exists else (0, [], [], [])
    )
    views, clicks, purchases = list(views), list(clicks), list(purchases)
    for pdf in pdfs:
        n += len(pdf)
        for etype, us in zip(pdf["etype"], pdf["us"]):
            if etype == "view":
                views.append(int(us))
            elif etype == "click":
                clicks.append(int(us))
            elif etype == "purchase":
                purchases.append(int(us))
    state.update((n, views, clicks, purchases))
    t1, t2, t3 = _resolve(views, clicks, purchases)
    yield pd.DataFrame(
        [{"user_id": key[0], "n_seen": n, "t1": t1, "t2": t2, "t3": t3}]
    )


def streaming_funnel_stages(events: DataFrame) -> DataFrame:
    """Per-user stage timestamps as an update-mode stream.

    ``events`` must carry (user_id, ts, event_type); ts may be the
    repo's epoch-nanos BIGINT or a timestamp. Emits
    (user_id, n_seen, t1, t2, t3) in epoch micros each micro-batch.
    """
    ts_type = dict(events.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        micros = F.expr("ts div 1000")
    else:
        micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prepared = events.select(
        "user_id",
        micros.alias("us"),
        F.col("event_type").alias("etype"),
    ).filter(F.col("etype").isin(list(_STAGES)))
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_funnel_cohorts(drained: DataFrame) -> DataFrame:
    """Collapse the update-mode rows to each user's final state and
    aggregate to the batch funnel's cohort shape (shares FUNNEL_SQL)."""
    final = (
        drained.groupBy("user_id")
        .agg(
            F.max_by("t1", "n_seen").alias("t1"),
            F.max_by("t2", "n_seen").alias("t2"),
            F.max_by("t3", "n_seen").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
    )
    return (
        final.withColumn("cohort_day", F.expr("t1 div 86400000000"))
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
