"""Structured Streaming tests: drain the events parquet with
availableNow and check streaming results against batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    from universal_importer_duckdb_spark.streaming.events import stream_events

    return stream_events(spark, sf_dir)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    # ts is timestamp[us] (no tz); cast to session-tz timestamp exactly
    # as streaming/events.py does
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("event_time", F.col("ts").cast("timestamp"))


def test_tumbling_counts_match_batch(events_stream, events_batch):
    from universal_importer_duckdb_spark.streaming.events import (
        run_available_now,
        tumbling_counts,
    )

    got = run_available_now(
        tumbling_counts(events_stream), "t_tumbling", output_mode="complete"
    )
    expected = (
        events_batch.groupBy(F.window("event_time", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    g = {(r.window_start, r.event_type): r.n_events for r in got.collect()}
    e = {(r.window_start, r.event_type): r.n_events for r in expected.collect()}
    assert g == e and len(g) > 0


def test_dedup_within_watermark_keeps_unique_ids(events_stream, events_batch):
    from universal_importer_duckdb_spark.streaming.events import (
        dedup_within_watermark,
        run_available_now,
    )

    got = run_available_now(dedup_within_watermark(events_stream), "t_dedup")
    assert got.count() == events_batch.select("event_id").distinct().count()


def test_session_counts_runs_and_is_plausible(events_stream, events_batch):
    from universal_importer_duckdb_spark.streaming.events import (
        run_available_now,
        session_counts,
    )

    got = run_available_now(
        session_counts(events_stream), "t_sessions", output_mode="complete"
    )
    rows = got.collect()
    assert len(rows) > 0
    total_events = sum(r.n_events for r in rows)
    assert total_events == events_batch.count()


def test_sliding_counts_runs(events_stream):
    from universal_importer_duckdb_spark.streaming.events import (
        run_available_now,
        sliding_counts,
    )

    got = run_available_now(
        sliding_counts(events_stream), "t_sliding", output_mode="complete"
    )
    assert got.count() > 0


def test_click_purchase_join_horizon_boundary(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.streaming.events import click_purchase_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, kind, minutes, user=1):
        return (eid, user, kind, 10.0, t0 + dt.timedelta(minutes=minutes))

    df = spark.createDataFrame(
        [
            ev(1, "click", 0),
            ev(2, "purchase", 30),      # within 1h of click 1 -> attributed
            ev(3, "purchase", 61),      # beyond 1h -> NOT attributed
            ev(4, "click", 0, user=2),  # other user's click never matches
        ],
        "event_id bigint, user_id bigint, event_type string, value double, event_time timestamp",
    )
    # watermark is a no-op on a batch frame; the join predicate is the
    # same lineage the stream runs
    got = {(r.click_id, r.purchase_id) for r in click_purchase_join(df).collect()}
    assert got == {(1, 2)}


def test_simhash_neardup_dedup_collapses_near_identical(spark, tmp_path):
    """Two docs differing by one low-weight token vote to the SAME
    SimHash fingerprint and dedup to one survivor within the
    watermark; a genuinely different doc survives separately. Run as a
    real file stream (availableNow drain) to exercise the streaming
    state path."""
    import datetime as dt

    from universal_importer_duckdb_spark.streaming.events import (
        run_available_now,
        simhash_neardup_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog " * 8).strip()
    # a real one-token edit: majority votes are unchanged, so the
    # SimHash fingerprint is identical though the text is not
    near = base.replace("lazy", "sleepy", 1)
    assert near != base
    other = "completely different content about spark streaming state"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "doc", 0.0, base),
        (2, t0 + dt.timedelta(minutes=1), 1, "doc", 0.0, near),
        (3, t0 + dt.timedelta(minutes=2), 1, "doc", 0.0, other),
    ]
    schema = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
              "event_type string, value double, props string")
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(schema).format("parquet").load(src)
        .withColumn("event_time", F.col("ts").cast("timestamp"))
    )
    got = run_available_now(
        simhash_neardup_dedup(stream), "t_simhash_neardup"
    ).collect()
    assert len(got) == 2  # base+near collapse; other survives
    assert {r.fp_lo is not None for r in got} == {True}
    survivors = {r.event_id for r in got}
    assert 3 in survivors and len(survivors & {1, 2}) == 1


def test_enriched_segment_counts_broadcasts_dimension(spark, sf_dir):
    """Stream-static join: counts match the batch equivalent and the
    dimension side is broadcast (checked on the same lineage run as a
    batch frame — the stream must never shuffle on the join key)."""
    from universal_importer_duckdb_spark.streaming.events import (
        enriched_segment_counts,
        run_available_now,
        stream_events,
    )

    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    got = run_available_now(
        enriched_segment_counts(stream_events(spark, sf_dir), customers),
        "t_enriched",
        output_mode="complete",
    )
    batch = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "event_time", F.col("ts").cast("timestamp")
    ).filter(F.col("event_id").isNotNull())
    expected = enriched_segment_counts(batch, customers)
    g = {(r.window_start, r.c_mktsegment): r.n_events for r in got.collect()}
    e = {(r.window_start, r.c_mktsegment): r.n_events for r in expected.collect()}
    assert g == e and len(g) > 0
    plan = expected._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
