from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark):
    from universal_importer_duckdb_spark.functions.skew import salted_join

    # skewed left: key 1 dominates
    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 900), (3, 901)], "k int, v int"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k int, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt=4).select("k", "v", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    from universal_importer_duckdb_spark.functions.skew import salted_join

    left = spark.createDataFrame([(1, 1), (9, 2)], "k int, v int")
    right = spark.createDataFrame([(1, "a")], "k int, name string")
    out = salted_join(left, right, ["k"], salt=4, how="left")
    rows = {r.k: r.name for r in out.collect()}
    assert rows == {1: "a", 9: None}


def test_salted_count_distinct_matches_exact(spark, sf_dir):
    from universal_importer_duckdb_spark.functions.skew import salted_count_distinct

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    salted = {
        r.o_orderstatus: r.n_distinct_o_custkey
        for r in salted_count_distinct(orders, "o_orderstatus", "o_custkey").collect()
    }
    assert salted == exact


def test_stateful_running_user_stats(spark, sf_dir):
    from universal_importer_duckdb_spark.streaming.events import (
        run_available_now,
        stream_events,
    )
    from universal_importer_duckdb_spark.streaming.stateful import running_user_stats

    stream = stream_events(spark, sf_dir)
    got = run_available_now(
        running_user_stats(stream), "t_stateful", output_mode="update"
    )
    # with availableNow the final update per user equals the batch totals
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
    )
    expected = {r.user_id: (r.n, float(r.tv)) for r in batch.collect()}
    # memory sink in update mode may hold one row per micro-batch per
    # user; the max n_events row is the final state
    from collections import defaultdict

    final: dict = defaultdict(lambda: (0, 0.0))
    for r in got.collect():
        if r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.total_value)
    assert dict(final) == expected


def test_selfdup_spans_on_hot_gram_corpus(spark):
    """r9 verdict #4: a gram occurring in 50% of documents (license
    boilerplate at corpus scale) must neither break correctness nor
    funnel into a single window group. Every doc after the first
    containing the hot 8-gram gets exactly that span; unique docs get
    none; and the physical plan has no window partitioned by gram."""
    import contextlib
    import io

    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_duplicate_spans,
    )

    hot = " ".join(f"hot{j}" for j in range(8))
    rows = []
    for d in range(200):
        if d % 2 == 0:  # 50% of docs share the identical 8-gram
            rows.append((d, f"u{d}a u{d}b {hot} u{d}c u{d}d"))
        else:
            rows.append((d, " ".join(f"w{d}x{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    spans = cross_doc_duplicate_spans(docs, n=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spans.explain("formatted")
    for line in buf.getvalue().splitlines():
        if "windowspecdefinition" in line:
            assert "gram" not in line, line

    got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
    # doc 0 is the earliest holder and keeps the passage; every later
    # even doc duplicates tokens 3..10 (1-based, inside its 12 tokens)
    expected = {(d, 3, 10) for d in range(2, 200, 2)}
    assert got == expected


def test_selfdup_spans_correct_when_verdict_side_cannot_broadcast(spark):
    """The 100 TB regime of the r11 shared-gram join-back: when the
    shared-verdict side exceeds the broadcast threshold (corpus-scale
    boilerplate), the join falls back to a shuffled join — and must
    emit the identical spans. Broadcast is disabled outright to force
    that path on the hot-gram corpus."""
    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_duplicate_spans,
    )

    hot = " ".join(f"hot{j}" for j in range(8))
    rows = []
    for d in range(200):
        if d % 2 == 0:
            rows.append((d, f"u{d}a u{d}b {hot} u{d}c u{d}d"))
        else:
            rows.append((d, " ".join(f"w{d}x{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spans = cross_doc_duplicate_spans(docs, n=8)
        got = {(r.doc_id, r.span_start, r.span_end) for r in spans.collect()}
        plan = spans._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "BroadcastHashJoin" not in plan, plan  # the fallback ran
    assert got == {(d, 3, 10) for d in range(2, 200, 2)}
