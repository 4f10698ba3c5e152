"""Structured-log serialization: turn per-user event streams into
ordered text narratives — the "flatten structured data into LM
training text" step of an SFT/agent-trace pipeline.

Each user's events become one document: deterministic per-event
rendering (epoch-micros, type, integer-cent value — no float
formatting ambiguity across engines) joined in (ts, event_id) order.
Per-user event counts are bounded by human activity, so the grouped
lists stay small at any corpus scale; one shuffle total.

Reference anchor: none (main.py never serializes) — training-data
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_event_narratives(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    sep: str = " | ",
) -> DataFrame:
    """One row per user: ``(user_id, n_events, narrative)``.

    Event rendering: ``t=<epoch_micros> <type> v=<cents>`` with the
    value folded to integer cents (half-away-from-zero DECIMAL(18,2)
    cast — both engines implement double->DECIMAL that way at scale 2,
    see the entry_queries exactness notes) — float-to-string
    formatting is the
    classic cross-engine divergence and is avoided entirely.
    """
    ts_type = dict(events.dtypes)[ts_col]
    if ts_type in ("bigint", "long"):
        micros = F.expr(f"`{ts_col}` div 1000")  # repo-normalized nanos
    else:
        micros = F.unix_micros(F.col(ts_col).cast("timestamp"))

    cents = (
        (F.col(value_col).cast("decimal(18,2)") * 100)
        .cast("bigint")
    )
    rendered = events.select(
        F.col(user_col).alias("user_id"),
        micros.alias("__us"),
        F.col(id_col).alias("__eid"),
        F.concat(
            F.lit("t="),
            micros.cast("string"),
            F.lit(" "),
            F.col(type_col),
            F.lit(" v="),
            F.coalesce(cents.cast("string"), F.lit("null")),
        ).alias("__line"),
    )
    return rendered.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__us", "__eid", "__line"))
                ),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("narrative"),
    )
