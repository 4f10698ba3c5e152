"""Streaming incremental upsert: maintain a keyed current-state table
from a CDC event stream, one MERGE per micro-batch.

This is the streaming face of the batch changelog algebra
(operators/changelog.py): each micro-batch is compacted to one row
per key (tombstones retained), then seq-aware-merged into the running
state. Because the merge is last-write-wins on the SEQUENCE (not on
arrival order) and deleted keys persist as tombstones until the final
projection, the maintained state is independent of how the source
splits the log into batches — a replayed backlog, interleaved files,
or one big availableNow batch all converge to the same state, which
is exactly what the registry oracle certifies against the full-log
batch answer.

Scale shape: per batch, one hash-aggregate over the batch (small) and
one broadcast-build merge against the accumulated state, with a
``localCheckpoint`` barrier so lineage stays O(1) across batches. In
production the state frame would live in a keyed table (Delta/Iceberg
MERGE target or a key-value sink) written from ``foreachBatch``; the
in-memory accumulator here keeps the same per-batch plan while
letting tests and the driver drain with availableNow. The state must
fit the cluster (it is one row per live key — dimension-sized, not
log-sized).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.changelog import (
    changelog_current_state,
    merge_upsert,
)

__all__ = ["incremental_state"]


def incremental_state(
    stream: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("delete",),
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Drain ``stream`` (availableNow) through per-batch compaction +
    seq-aware MERGE and return the final current state (tombstones
    filtered). Raises if the stream yields no batches — there is no
    schema to build an empty state from."""
    acc: dict[str, DataFrame | None] = {"state": None}

    def apply_batch(batch: DataFrame, _epoch_id: int) -> None:
        compact = changelog_current_state(
            batch,
            key_cols,
            seq_cols,
            op_col=op_col,
            delete_ops=delete_ops,
            payload_cols=payload_cols,
            keep_deletes=True,
        )
        prev = acc["state"]
        if prev is None:
            merged = compact
        else:
            merged = merge_upsert(
                prev,
                compact,
                key_cols,
                op_col=op_col,
                delete_ops=delete_ops,
                seq_cols=seq_cols,
                retain_tombstones=True,
                broadcast_delta=True,
            )
        # barrier: keep lineage O(1) in the number of batches (the
        # same tradeoff as the BSP loop in dedup_text — swap for
        # checkpoint() against reliable storage on a real cluster)
        acc["state"] = merged.localCheckpoint(eager=True)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = acc["state"]
    if state is None:
        raise ValueError("incremental_state: stream produced no batches")
    return state.filter(~F.col(op_col).isin(list(delete_ops)))
