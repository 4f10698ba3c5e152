"""Change-data-capture operators: compact a changelog to current
state, build SCD-2 validity history, and MERGE a compacted delta into
a snapshot — the Delta-Lake/Hudi-style upsert algebra expressed as
plain DataFrame ops, so it runs on any store.

Reference anchor: the reference's dedup keep="first"/"last" semantics
(main.py:320 remove_duplicates_from_stage_table) are the degenerate
single-batch case of changelog compaction (latest-wins per key); these
operators generalize that to op-typed logs (insert/update/delete) and
incremental application, which a 100 TB ingest pipeline needs — you
never re-read the full log, you merge the day's compacted delta into
yesterday's snapshot.

Scale shape:
- ``changelog_current_state`` is ONE hash-aggregate shuffle on the key
  (max-struct latest-wins with map-side partial aggregation), not a
  window sort — at 100 TB the map-side combine collapses each
  partition's versions of a key before anything moves.
- ``merge_upsert`` is one join on the key; CDC deltas are usually tiny
  next to the snapshot, so ``broadcast_delta=True`` makes the merge a
  broadcast hash join and the snapshot NEVER shuffles. The algebra
  merge(state(log<T), compact(log>=T)) == state(log) is what the
  registry oracle certifies.
- ``scd2_intervals`` is the one genuinely order-dependent op (lead over
  the key's timeline) — a single window shuffle partitioned by key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["changelog_current_state", "merge_upsert", "scd2_intervals"]


def changelog_current_state(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("delete",),
    payload_cols: Sequence[str] = (),
    keep_deletes: bool = False,
) -> DataFrame:
    """Compact a changelog to one row per key: the row with the
    highest ``seq_cols`` (lexicographic; include a unique id as the
    last seq column to make ties impossible) wins; keys whose latest
    op is a delete are dropped (or kept op-tagged with
    ``keep_deletes=True`` — required when the output is itself a delta
    to merge downstream, since the delete must travel).

    Emits ``key_cols + seq_cols + [op_col] + payload_cols +
    [n_versions]`` where ``n_versions`` counts all log rows seen for
    the key. Single hash-aggregate — the max-of-struct form rather
    than a row_number window, so partial aggregation runs map-side."""
    struct_fields = (
        [F.col(c).alias(f"s_{c}") for c in seq_cols]
        + [F.col(op_col).alias("s_op")]
        + [F.col(c).alias(f"p_{c}") for c in payload_cols]
    )
    agg = log.groupBy(*key_cols).agg(
        F.max(F.struct(*struct_fields)).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
    )
    if not keep_deletes:
        agg = agg.filter(~F.col("__last.s_op").isin(list(delete_ops)))
    return agg.select(
        *key_cols,
        *[F.col(f"__last.s_{c}").alias(c) for c in seq_cols],
        F.col("__last.s_op").alias(op_col),
        *[F.col(f"__last.p_{c}").alias(c) for c in payload_cols],
        "n_versions",
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    delete_ops: tuple[str, ...] = ("delete",),
    version_col: str = "n_versions",
    broadcast_delta: bool = False,
    seq_cols: Sequence[str] | None = None,
    retain_tombstones: bool = False,
) -> DataFrame:
    """MERGE a compacted delta (one row per key, deletes RETAINED —
    ``changelog_current_state(..., keep_deletes=True)``) into a
    snapshot with the same schema: delta rows override base rows,
    delete ops drop the key, version counts add. Satisfies the
    incremental-compaction law the oracle checks:

        merge(state(log < T), compact(log >= T)) == state(log)

    By default the delta is assumed NEWER than the snapshot (the
    in-order CDC batch case) and wins unconditionally. When batches
    can arrive OUT OF ORDER (a replayed backlog, a multi-source log),
    pass ``seq_cols``: the row with the greater sequence tuple wins,
    so merging is commutative up to the final state. Out-of-order
    deletion needs tombstone retention to be correct — with
    ``retain_tombstones=True`` deleted keys stay in the output as
    op-tagged tombstones (so a late pre-delete update compares against
    the tombstone's sequence and loses instead of resurrecting the
    key); filter them when projecting the final state.

    With ``broadcast_delta=False``: one full-outer equi-join on the
    key (both sides shuffle — the general case for deltas too big to
    broadcast). With ``broadcast_delta=True`` (the common CDC case —
    a day's delta vs a 100 TB snapshot): Spark does NOT support a
    broadcast build for full-outer joins (the hint is silently
    dropped, shuffling the snapshot), so the merge decomposes into
    joins that DO take a broadcast build:

      updated  = base LEFT OUTER broadcast(delta)   -- snapshot never
                 (delta wins where matched)            shuffles
      new_keys = delta ANTI broadcast(base ∩ delta keys)
                 (the intersection comes from one extra column-pruned
                  key-only pass over base — cheap next to a shuffle)

    and their union is the merged snapshot."""
    data_cols = [c for c in base.columns if c not in key_cols]
    if set(base.columns) != set(delta.columns):
        raise ValueError(
            f"merge_upsert schema mismatch: {base.columns} vs {delta.columns}"
        )

    def merged_cols(d_wins):
        out_cols: list = list(key_cols)
        for c in data_cols:
            if c == version_col:
                out_cols.append(
                    (
                        F.coalesce(F.col(f"__b_{c}"), F.lit(0))
                        + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                    ).cast("bigint").alias(c)
                )
            else:
                out_cols.append(
                    F.when(d_wins, F.col(f"__d_{c}"))
                    .otherwise(F.col(f"__b_{c}"))
                    .alias(c)
                )
        return out_cols

    def delta_wins():
        has_delta = F.col(f"__d_{op_col}").isNotNull()
        if seq_cols is None:
            return has_delta
        has_base = F.col(f"__b_{op_col}").isNotNull()
        d_seq = F.struct(*[F.col(f"__d_{c}") for c in seq_cols])
        b_seq = F.struct(*[F.col(f"__b_{c}") for c in seq_cols])
        return has_delta & (~has_base | (d_seq > b_seq))

    b_cols = [F.col(f"b.{c}").alias(f"__b_{c}") for c in data_cols]
    d_cols = [F.col(f"d.{c}").alias(f"__d_{c}") for c in data_cols]
    is_deleted = lambda col: col.isin(list(delete_ops))  # noqa: E731

    def drop_tombstones(joined, d_wins):
        if retain_tombstones:
            return joined
        winning_op = F.when(d_wins, F.col(f"__d_{op_col}")).otherwise(
            F.col(f"__b_{op_col}")
        )
        return joined.filter(~is_deleted(winning_op))

    if not broadcast_delta:
        joined = (
            base.alias("b")
            .join(delta.alias("d"), list(key_cols), "full_outer")
            .select(*key_cols, *b_cols, *d_cols)
        )
        d_wins = delta_wins()
        return drop_tombstones(joined, d_wins).select(*merged_cols(d_wins))

    keys = list(key_cols)
    joined = (
        base.alias("b")
        .join(F.broadcast(delta.alias("d")), keys, "left_outer")
        .select(*keys, *b_cols, *d_cols)
    )
    d_wins = delta_wins()
    updated = drop_tombstones(joined, d_wins).select(*merged_cols(d_wins))
    # keys present in BOTH sides: ≤ |delta| rows, so everything after
    # the column-pruned base scan is broadcast-sized
    matched = base.select(*keys).join(
        F.broadcast(delta.select(*keys)), keys, "left_semi"
    )
    fresh = delta.join(F.broadcast(matched), keys, "left_anti")
    if not retain_tombstones:
        fresh = fresh.filter(~is_deleted(F.col(op_col)))
    fresh = fresh.select(
        *keys,
        *[
            F.col(c).cast("bigint").alias(c) if c == version_col else F.col(c)
            for c in data_cols
        ],
    )
    return updated.unionByName(fresh)


def scd2_intervals(
    log: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    payload_cols: Sequence[str] = (),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: each log row becomes a
    validity interval [its own seq, the key's next row's seq), open
    (NULL ``valid_to``, ``is_current=true``) for the key's latest row.
    The first ``seq_cols`` entry is the timeline column used for the
    interval bounds; the rest only break ordering ties. One window
    shuffle partitioned by key."""
    ts = seq_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*seq_cols)
    nxt = F.lead(F.col(ts)).over(w)
    return log.select(*key_cols, *seq_cols, *payload_cols).select(
        *key_cols,
        *seq_cols,
        *payload_cols,
        F.col(ts).alias(from_col),
        nxt.alias(to_col),
        nxt.isNull().alias(current_col),
    )
