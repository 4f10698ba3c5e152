"""Custom stateful streaming operator via applyInPandasWithState —
the Spark shape for operators that need per-key mutable state beyond
built-in windows (SURVEY.md §7.4: "custom stateful operators").

``running_user_stats`` maintains, per user, a running event count and
value sum across micro-batches, emitting the updated totals each
batch. State is a single small row per key (bounded by key
cardinality, not stream length); pair with a timeout for keys that go
quiet if key cardinality is unbounded.

Spark 4's successor API (``transformWithStateInPandas``) was
evaluated r10 and is NOT usable in this environment: its streaming
Python runner requires ``google.protobuf`` (broken import in this
container, and installs are off-limits), crashing on the first real
micro-batch with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE.
``applyInPandasWithState`` has no such dependency and remains the
deployed shape here; revisit when the environment carries a working
protobuf.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": round(total, 2)}]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events must carry (user_id, value). Returns the running per-user
    totals stream (update semantics)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
