"""Structured Streaming pipelines over the events table.

The reference has no streaming at all (SURVEY.md §2.9); these are the
Spark-native streaming analogs of its batch stages, built from
readStream → watermark → windowed/stateful ops → writeStream:

- stream_events            — file-streaming source over the parquet dir
- tumbling_counts          — watermarked tumbling-window counts/sums
- sliding_counts           — overlapping windows
- session_counts           — session_window aggregation (gap-based)
- dedup_within_watermark   — streaming analog of the reference's D1
                             dedup: dropDuplicatesWithinWatermark
- run_available_now        — test/driver helper: drain the source with
                             availableNow into a memory sink

Late data: the watermark bounds state (events later than the watermark
delay are dropped from aggregations) — this is what makes the state
store survive unbounded streams; batch has no equivalent concern.

events.parquet stores ts as timestamp[us] (no timezone); it reads as
TIMESTAMP_NTZ and is cast to a session-timezone (UTC) timestamp here
so watermarks/windows get proper event-time semantics with no
precision loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def _with_event_time(df: DataFrame) -> DataFrame:
    # NTZ -> TIMESTAMP is exact under the UTC session timezone
    return df.withColumn("event_time", F.col("ts").cast("timestamp"))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the file-stream source needs a directory; glob-filter so only
    # events.parquet is listed (not the other tables in the sf dir)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(f"{sf_dir}/")
    )
    return _with_event_time(raw.filter(F.col("event_id").isNotNull()))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(15,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user (stateful; watermark bounds
    open-session state)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming analog of the reference's first-wins dedup (D1/D2):
    keeps the first event per event_id seen within the watermark
    horizon; state for old keys is reclaimed as the watermark advances
    — the only way streaming dedup stays bounded on an infinite
    stream."""
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enriched_segment_counts(
    events: DataFrame,
    customers: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STATIC join: enrich the event stream with a broadcast
    dimension table (customer market segment keyed by user_id =
    c_custkey), then watermarked tumbling counts per (window,
    segment). The static side carries no watermark and no state — it
    is broadcast into every micro-batch, which is exactly how a
    dimension join should run at 100 TB/day (the stream never
    shuffles on the join key). Left join keeps events from unknown
    users under a NULL segment rather than dropping them."""
    dims = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        events.join(dims, "user_id", "left")
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
        )
    )


def simhash_neardup_dedup(
    events: DataFrame, text_col: str = "props", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming NEAR-dup dedup: the portable SimHash fingerprint
    (two 32-bit halves, majority bit votes over md5-hashed tokens) is
    computed as plain column expressions on the stream, then
    ``dropDuplicatesWithinWatermark`` keeps the first record per
    fingerprint within the watermark horizon. SimHash is a
    locality-sensitive hash, so textually-close records (token-level
    edits that don't flip any majority vote) collapse to the SAME
    fingerprint and dedup together — unlike exact-key dedup, which
    only catches byte-identical payloads. State is keyed by the
    16-byte fingerprint (not the text) and reclaimed as the watermark
    advances — bounded on an unbounded stream, the requirement for
    100 TB/day ingest near-dup.

    Hamming-tolerant (> 0) matching needs cross-key coordination that
    per-key streaming state cannot express exactly; the batch
    ``simhash_near_pairs_portable`` + ``neardup_clusters`` pass is the
    exact sweep, with this operator as the cheap in-stream front line
    (the standard lambda-architecture split)."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_fp_columns,
    )

    return (
        simhash_fp_columns(events, text_col)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["fp_lo", "fp_hi"])
    )


def click_purchase_join(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    attribute each purchase to every click by the same user in the
    preceding ``horizon``. Watermarks on BOTH sides plus the range
    bound are what let Spark expire join state — a click older than
    (watermark + horizon) can never match a future purchase, so its
    state-store entry is dropped; without both bounds the join state
    grows without limit on an unbounded stream."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
            F.col("event_time").alias("purchase_time"),
        )
        .withWatermark("purchase_time", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (F.col("purchase_time") <= F.col("click_time") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "purchase_value",
        F.unix_micros("click_time").alias("click_us"),
        F.unix_micros("purchase_time").alias("purchase_us"),
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain all available input (availableNow trigger) into an
    in-memory table and return it as a batch DataFrame — used by tests
    and the driver smoke path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
