"""Round-8 regressions: the r7 verdict/advice items.

- testing._check_oracle_dtypes must red-flag container-typed (array/
  map/struct) Spark output columns — the r7 emb_pq_codes driver red:
  the driver's pandas canonicalizer cannot sort a list cell, so even
  the rows-only gate dies (third representation-class escape after
  the r5 HUGEINT and r6 DECIMAL rows).
- integer k-means (operators/int_kmeans.py): the PQ/IVF training is
  now exact scaled-integer Lloyd's, replayable in DuckDB SQL — the
  rows-only class is retired. Determinism, SQL parity at tiny SF, and
  quality budgets are pinned here.
- dsir_scores: no corpus-scale cache in the plan (stats are
  aggregated from the token stream directly; the per-doc side stays
  pure lineage), plus the runtime overflow guard on the vocab-bounded
  stats table.
- top_collocations: the unigram table is pre-filtered to words that
  appear in surviving bigrams before the ratio joins (r7 perf item);
  results must be identical to the unfiltered form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------- dtype-guard hardening
def test_dtype_guard_rejects_container_columns(spark, sf_dir):
    """The r7 emb_pq_codes pattern (array<int> output) must fail fast
    in the local harness even though values would match."""
    from universal_importer_duckdb_spark.testing import (
        _check_oracle_dtypes,
        duckdb_connection,
    )

    con = duckdb_connection(sf_dir)
    old_shape = spark.range(3).select(
        F.array(F.lit(1), F.lit(2)).alias("codes")
    )
    with pytest.raises(AssertionError, match="unhashable"):
        _check_oracle_dtypes(
            old_shape,
            con,
            "SELECT [1, 2] AS codes",
            "old_pq_codes_shape",
        )
    struct_shape = spark.range(3).select(
        F.struct(F.lit(1).alias("a")).alias("s")
    )
    with pytest.raises(AssertionError, match="unhashable"):
        _check_oracle_dtypes(
            struct_shape, con, "SELECT {'a': 1} AS s", "struct_shape"
        )
    con.close()


# -------------------------------------------------- bench tail bound
def test_bench_summary_line_bounded_at_any_query_count():
    """r7 verdict item: the driver parses only the LAST ~2000 chars of
    bench stdout; the final summary line must stay under 1 KB no
    matter how many registry queries the bench grows to."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import build_summary_line

    timings = {
        f"some_quite_long_query_name_number_{i:04d}": i * 0.001
        for i in range(300)
    }
    line = build_summary_line(timings, 0.123, 0.1)
    assert len(line) < 1024
    parsed = json.loads(line)
    assert parsed["n_queries"] == 300
    assert parsed["metric"] == "headline_queries_total_runtime"
    # tiny registries keep the slowest extras
    small = build_summary_line({"q1": 0.5, "q2": 0.25}, 0.1, 0.01)
    assert len(small) < 1024 and "slowest" in json.loads(small)


# --------------------------------------------- round-8-born operators
def test_kmeans_clusters_assignment_properties(spark, sf_dir):
    """Every vector is assigned; d2 is the true minimum over the
    trained centroids (spot-checked by brute force on a few rows);
    the assignment is bit-stable across runs."""
    import numpy as np

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        int_argmin_dists,
        quantize_np,
    )
    from universal_importer_duckdb_spark.operators.similarity import (
        ivf_train_centroids,
        kmeans_clusters,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_clusters(emb, n_clusters=16)
    rows = {r.vec_id: (r.cluster, r.d2) for r in out.collect()}
    assert len(rows) == emb.count()
    assert all(0 <= c < 16 for c, _ in rows.values())
    again = {r.vec_id: (r.cluster, r.d2) for r in kmeans_clusters(emb, n_clusters=16).collect()}
    assert rows == again
    # brute-force a few vectors against the same trained centroids
    C = ivf_train_centroids(emb, 16)
    sample = emb.orderBy("vec_id").limit(5).collect()
    xq = quantize_np(np.asarray([list(r.embedding) for r in sample], dtype=np.float64))
    a, dd = int_argmin_dists(xq, C)
    for r, cl, d2 in zip(sample, a, dd):
        assert rows[r.vec_id] == (int(cl), int(d2))


def test_streaming_dsir_scores_match_batch(spark, sf_dir):
    """The ingest-time DSIR twin must equal the batch scores: same
    artifact, stateless score path, whole-doc rows."""
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.dsir import (
        dsir_contribution_artifact,
        dsir_score_with_artifact,
    )
    from universal_importer_duckdb_spark import entry_queries as eq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    artifact = dsir_contribution_artifact(
        docs, is_target=F.col("source") == "src0"
    )
    batch = {
        r.doc_id: (r.n_words, r.score)
        for r in dsir_score_with_artifact(docs, artifact).collect()
    }
    streamed = {
        r.doc_id: (r.n_words, r.score)
        for r in eq.REGISTRY["stream_dsir_scores"][0](spark, sf_dir).collect()
    }
    assert batch == streamed and len(batch) > 0


def test_fuzzy_contamination_only_cross_set_pairs(spark, sf_dir):
    """Every emitted row pairs a corpus doc with a benchmark doc and
    clears the Jaccard threshold."""
    from universal_importer_duckdb_spark import entry_queries as eq

    rows = eq.REGISTRY["docs_fuzzy_benchmark_contamination"][0](
        spark, sf_dir
    ).collect()
    for r in rows:
        assert r.bench_doc_id % 97 == 0
        assert r.doc_id % 97 != 0
        assert r.jaccard >= 0.4


def test_corpus_card_totals_cross_check(spark, sf_dir):
    """The card's per-source totals must reconcile with independent
    single-signal queries (language-id pass and raw counts)."""
    from universal_importer_duckdb_spark import entry_queries as eq

    card = {r.source: r for r in eq.REGISTRY["docs_corpus_card"][0](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = {r["source"]: (r["cnt"], r["chars"]) for r in
           docs.groupBy("source").agg(
               F.count(F.lit(1)).alias("cnt"),
               F.sum("n_chars").alias("chars")).collect()}
    assert set(card) == set(raw)
    for src, r in card.items():
        assert (r.n_docs, r.total_chars) == raw[src]
        assert 0 <= r.n_pred_en <= r.n_docs
        assert 0 <= r.n_quality <= r.n_docs
        assert 0 <= r.n_exact_dup_surplus < r.n_docs


def test_shuffle_shards_is_a_permutation_and_stable(spark, sf_dir):
    """Every doc gets exactly one (shard, pos); positions are dense
    1..len(shard); the assignment is bit-stable and insertion-local
    (adding a doc never moves docs in OTHER shards)."""
    from universal_importer_duckdb_spark.operators.corpus import (
        shuffle_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shuffle_shards(docs, n_shards=8).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # insertion locality: drop one doc; only its own shard's tail moves
    victim = out[0]
    out2 = {
        r.doc_id: (r.shard, r.pos_in_shard)
        for r in shuffle_shards(
            docs.filter(F.col("doc_id") != victim.doc_id), n_shards=8
        ).collect()
    }
    for r in out:
        if r.doc_id == victim.doc_id:
            continue
        s2, p2 = out2[r.doc_id]
        assert s2 == r.shard
        if r.shard != victim.shard or r.pos_in_shard < victim.pos_in_shard:
            assert p2 == r.pos_in_shard
        else:
            assert p2 == r.pos_in_shard - 1


# --------------------------------------------------- integer k-means
def test_int_kmeans_determinism_and_quantize_guard():
    import numpy as np

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        QOFFSET,
        QSCALE,
        int_lloyds,
        quantize_np,
    )

    rng = np.random.default_rng(11)
    x = rng.normal(0, 0.2, size=(200, 8))
    xq = quantize_np(x)
    assert (xq > 0).all()
    c1 = int_lloyds(xq, 8, 5, list(range(8)))
    c2 = int_lloyds(xq.copy(), 8, 5, list(range(8)))
    assert np.array_equal(c1, c2)
    assert c1.dtype == np.int64
    # centroids stay inside the quantized value range
    assert c1.min() > 0 and c1.max() < 2 * QOFFSET
    # the (0, 2^22) contract hard-fails on BOTH sides instead of
    # silently flooring/wrapping (r8 review: the positive bound was
    # previously unchecked)
    with pytest.raises(ValueError, match="BIGINT-safe"):
        quantize_np(np.array([[-(QOFFSET / QSCALE) - 0.5]]))
    with pytest.raises(ValueError, match="BIGINT-safe"):
        quantize_np(np.array([[QOFFSET / QSCALE + 0.5]]))


def test_int_kmeans_empty_cluster_keeps_previous_centroid():
    import numpy as np

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        int_lloyds,
        quantize_np,
    )

    # two identical points as init: cluster 1 starts identical to
    # cluster 0, every point assigns to the lower id, and cluster 1
    # must keep its (duplicate) centroid rather than divide by zero
    x = quantize_np(np.array([[0.1, 0.1], [0.1, 0.1], [0.2, 0.2]]))
    cent = int_lloyds(x, 2, 3, [0, 1])
    assert np.array_equal(cent[1], x[1])


def test_dsir_plan_has_no_cache_and_one_broadcastable_stats_side(spark, sf_dir):
    """r7 verdict item: dsir_resample scoped-cached a corpus-scale
    (doc, bucket) frame. The r8 shape must keep the whole score
    pipeline pure lineage — no InMemoryRelation anywhere in the
    plan."""
    from universal_importer_duckdb_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dsir_resample(docs, is_target=F.col("source") == "src0")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan


def test_quality_loader_rejects_quoted_tokens(tmp_path):
    """r7 advice: a weight token containing an apostrophe would break
    (or silently alter) the SQL VALUES oracle — loader error."""
    from universal_importer_duckdb_spark.operators.quality_model import (
        load_quality_weights,
    )

    p = tmp_path / "w.tsv"
    p.write_text("good\t5\ndon't\t-3\n")
    with pytest.raises(ValueError, match="quote"):
        load_quality_weights(str(p))


def test_annexb_sniff_requires_plausible_nal_header():
    """r7 advice: an arbitrary blob starting 00 00 01 must fall
    through to the unrecognized-container error, not route to the av
    decoder; a real Annex-B prefix (valid NAL header) still routes."""
    from universal_importer_duckdb_spark.operators.multimodal import (
        _looks_like_annexb,
        decode_media,
    )

    junk = b"\x00\x00\x01\xff" + b"\x00" * 16  # forbidden_zero_bit set
    assert not _looks_like_annexb(junk)
    with pytest.raises(NotImplementedError, match="unrecognized"):
        decode_media(junk)
    # SPS NAL (type 7) after a 4-byte start code: plausible Annex-B
    assert _looks_like_annexb(b"\x00\x00\x00\x01\x67" + b"\x00" * 16)
    # type 0 and type 24+ are undefined nal_unit_types
    assert not _looks_like_annexb(b"\x00\x00\x01\x00")
    assert not _looks_like_annexb(b"\x00\x00\x01\x78")


def test_dsir_plan_shape_broadcast_and_hash_agg(spark, sf_dir):
    """r8 perf pins: the score join must be a broadcast join (the
    measured-count gate — AQE cannot see a checkpointed frame's size)
    and the per-doc aggregation must stay a HashAggregate (a first()
    carry column used to force a corpus-scale SortAggregate)."""
    from universal_importer_duckdb_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dsir_resample(docs, is_target=F.col("source") == "src0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortAggregate" not in plan


def test_collocations_requery_reads_no_corpus(spark, sf_dir):
    """The (a,b) count table is the held artifact: everything after
    construction derives from the checkpointed frame, so the plan
    must contain no parquet scan at all."""
    from universal_importer_duckdb_spark.operators.textrank import (
        top_collocations,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = top_collocations(docs, top_k=5, min_count=2)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" not in plan or "parquet" not in plan.lower()


def test_dsir_overflow_guard_trips():
    """The (c_t+1)*SCALE BIGINT bound is enforced at runtime (r7
    advice): an artificially tiny cap must raise, not wrap."""
    import universal_importer_duckdb_spark.operators.dsir as dsir_mod
    from universal_importer_duckdb_spark.session import get_spark

    spark = get_spark()
    docs = spark.createDataFrame(
        [(1, "a a a", "src0"), (2, "a b", "src1")],
        "doc_id bigint, text string, source string",
    )
    old = dsir_mod.SCALE
    dsir_mod.SCALE = 2**62  # cap becomes 1 -> any bucket overflows
    try:
        with pytest.raises(Exception, match="BIGINT-safe"):
            dsir_mod.dsir_scores(
                docs, is_target=F.col("source") == "src0"
            ).collect()
    finally:
        dsir_mod.SCALE = old


# ------------------------------------------- count-min sketch family
def test_cms_one_sided_error_and_bounded_size(spark, sf_dir):
    """The CMS contract on real data: for EVERY key, estimate >=
    exact (one-sided error), and the sketch never exceeds
    depth*width cells regardless of input size."""
    from universal_importer_duckdb_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
        exact_key_counts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    depth, width = 4, 32  # tiny width -> forced collisions
    sketch = cms_sketch(ev, "user_id", depth=depth, width=width)
    assert sketch.count() <= depth * width

    exact = exact_key_counts(ev, "user_id")
    est = cms_estimate(sketch, exact.select("k"), depth=depth, width=width)
    joined = exact.join(est, "k")
    bad = joined.filter(F.col("cms_est") < F.col("exact_cnt")).count()
    assert bad == 0
    # total mass conservation per row j: sum of cells == n rows
    per_row = sketch.groupBy("j").agg(F.sum("cnt").alias("m")).collect()
    n = ev.count()
    assert len(per_row) == depth and all(r["m"] == n for r in per_row)


def test_cms_weighted_build_equals_raw_build(spark, sf_dir):
    """Additivity: the sketch built from pre-aggregated (key, count)
    weights is cell-identical to the sketch built from raw rows."""
    from universal_importer_duckdb_spark.operators.sketches import (
        cms_sketch,
        exact_key_counts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = cms_sketch(ev, "user_id", depth=4, width=64)
    exact = exact_key_counts(ev, "user_id")
    weighted = cms_sketch(exact, "k", weight_col="exact_cnt", depth=4, width=64)
    assert sorted(map(tuple, raw.collect())) == sorted(
        map(tuple, weighted.collect())
    )


def test_streaming_cms_converges_across_batches(spark, tmp_path):
    """Cells touched in MULTIPLE micro-batches must max-fold to the
    batch sketch: two files, one file per trigger, overlapping
    keys."""
    import os

    from universal_importer_duckdb_spark.operators.sketches import (
        cms_sketch,
        finalize_cms_sketch,
        streaming_cms_sketch,
    )

    schema = "event_id bigint, user_id bigint"
    rows1 = [(i, i % 5) for i in range(40)]
    rows2 = [(100 + i, i % 7) for i in range(60)]
    d = tmp_path / "ev_stream"
    os.makedirs(d)
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(d) + "/*")
    )
    q = (
        streaming_cms_sketch(stream, "user_id", depth=4, width=16)
        .writeStream.format("memory")
        .queryName("t_stream_cms_conv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("t_stream_cms_conv")
    # the overlapping keys (0..4) were updated in both batches
    assert drained.count() > finalize_cms_sketch(drained).count()
    got = sorted(map(tuple, finalize_cms_sketch(drained).collect()))
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = sorted(
        map(tuple, cms_sketch(batch, "user_id", depth=4, width=16).collect())
    )
    assert got == want


def test_cms_heavy_hitters_plan_shapes(spark, sf_dir):
    """Both sides of the literal-gate switchover: below the gate the
    estimate is a pure expression (NO join — one scan, one shuffle,
    TakeOrdered); above it the sketch stays a table and broadcasts.
    Neither form may cartesian."""
    from universal_importer_duckdb_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    def plan_of(width):
        df = cms_heavy_hitters(ev, "user_id", depth=4, width=width)
        return df._jdf.queryExecution().executedPlan().toString()

    lit_plan = plan_of(64)  # 256 cells <= gate -> literal map
    assert "Join" not in lit_plan
    assert "TakeOrderedAndProject" in lit_plan

    tab_plan = plan_of(4096)  # 16384 cells > gate -> table + broadcast
    assert "BroadcastHashJoin" in tab_plan
    assert "TakeOrderedAndProject" in tab_plan
    assert "CartesianProduct" not in tab_plan


# --------------------------------------------------------- semdedup
def test_semdedup_verdicts_match_brute_force(spark, sf_dir):
    """The kept flag must equal the brute-force definition: pruned
    iff ANY earlier same-cluster member (d2 DESC, id ASC order) lies
    within eps2 integer squared L2 — computed here independently with
    a full pairwise matrix per cluster. Also pins determinism and
    that the cluster/d2 columns agree with kmeans_clusters."""
    import numpy as np

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        quantize_np,
    )
    from universal_importer_duckdb_spark.operators.semdedup import (
        EPS2_DEFAULT,
        semdedup,
    )
    from universal_importer_duckdb_spark.operators.similarity import (
        kmeans_clusters,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = {
        r.vec_id: (r.cluster, r.d2, r.kept)
        for r in semdedup(emb, n_clusters=16).collect()
    }
    base = {
        r.vec_id: (r.cluster, r.d2)
        for r in kmeans_clusters(emb, n_clusters=16).collect()
    }
    assert len(out) == emb.count()
    assert {k: v[:2] for k, v in out.items()} == base

    vecs = {
        r.vec_id: np.asarray(list(r.embedding), dtype=np.float64)
        for r in emb.collect()
    }
    pruned_expected = set()
    for c in sorted({v[0] for v in out.values()}):
        members = sorted(
            (i for i, v in out.items() if v[0] == c),
            key=lambda i: (-out[i][1], i),
        )
        if len(members) < 2:
            continue
        Q = quantize_np(np.asarray([vecs[i] for i in members]))
        D = ((Q[:, None, :] - Q[None, :, :]) ** 2).sum(
            axis=2, dtype=np.int64
        )
        for pos in range(1, len(members)):
            if (D[pos, :pos] <= EPS2_DEFAULT).any():
                pruned_expected.add(members[pos])
    got_pruned = {i for i, v in out.items() if not v[2]}
    assert got_pruned == pruned_expected
    assert 0 < len(got_pruned) < len(out)  # non-degenerate at any sf

    again = {
        r.vec_id: (r.cluster, r.d2, r.kept)
        for r in semdedup(emb, n_clusters=16).collect()
    }
    assert out == again


def test_semdedup_plan_single_shuffle_no_cartesian(spark, sf_dir):
    """One Exchange (the groupBy(cluster) pruning shuffle) past the
    assignment pass; no cartesian, no broadcast of corpus-scale
    data. The kernel's pairwise work is inside applyInPandas, not a
    self-join."""
    from universal_importer_duckdb_spark.operators.semdedup import (
        semdedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        semdedup(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_incremental_semdedup_matches_brute_force_and_stream(spark, sf_dir):
    """Admission verdicts must equal the brute-force definition
    (rejected iff some KEPT at-rest member of the assigned cluster is
    within eps2), and the streaming twin must drain to the identical
    frame."""
    import numpy as np

    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.operators.int_kmeans import (
        quantize_np,
    )
    from universal_importer_duckdb_spark.operators.semdedup import (
        EPS2_DEFAULT,
        ingest_split,
        semdedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    at_rest, arriving = ingest_split(emb)
    batch = {
        r.vec_id: (r.cluster, r.d2, r.nn_d2, r.admitted)
        for r in eq.REGISTRY["emb_incremental_semdedup"][0](
            spark, sf_dir
        ).collect()
    }
    assert len(batch) == arriving.count() > 0

    kept_by_cluster: dict[int, list] = {}
    rest_vecs = {
        r.vec_id: np.asarray(list(r.embedding), dtype=np.float64)
        for r in at_rest.collect()
    }
    for r in semdedup(at_rest, n_clusters=16).collect():
        if r.kept:
            kept_by_cluster.setdefault(r.cluster, []).append(
                quantize_np(rest_vecs[r.vec_id])
            )
    arr_vecs = {
        r.vec_id: quantize_np(np.asarray(list(r.embedding), dtype=np.float64))
        for r in arriving.collect()
    }
    n_rejected = 0
    for vid, (cl, _, nn_d2, admitted) in batch.items():
        members = kept_by_cluster.get(cl, [])
        if members:
            dists = [
                int(((arr_vecs[vid] - m) ** 2).sum()) for m in members
            ]
            assert nn_d2 == min(dists)
            assert admitted == (min(dists) > EPS2_DEFAULT)
        else:
            assert nn_d2 == -1 and admitted
        n_rejected += not admitted
    assert n_rejected > 0  # threshold actually bites at any sf

    streamed = {
        r.vec_id: (r.cluster, r.d2, r.nn_d2, r.admitted)
        for r in eq.REGISTRY["stream_semdedup_ingest"][0](
            spark, sf_dir
        ).collect()
    }
    assert streamed == batch


def test_multisignal_admission_is_gate_conjunction(spark, sf_dir):
    """The composite admission frame must equal the conjunction of
    its three independently-tested gates: exact fingerprint (brute
    force here), shipped quality (docs_shipped_quality restricted to
    the arriving class), and SemDeDup admission
    (emb_incremental_semdedup)."""
    import hashlib

    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.operators.semdedup import (
        ingest_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_index, doc_batch = ingest_split(docs, id_col="doc_id")

    def fp(text):
        return hashlib.md5(text.lower().encode()).hexdigest()

    index_fps = {fp(r.text) for r in doc_index.select("text").collect()}
    batch_rows = sorted(
        ((r.doc_id, fp(r.text)) for r in doc_batch.collect())
    )
    seen: set[str] = set()
    exact = {}
    for did, f in batch_rows:  # ids ascending == window order
        exact[did] = f in index_fps or f in seen
        seen.add(f)

    quality = {
        r.doc_id: (r.n_words, r.is_quality)
        for r in eq.REGISTRY["docs_shipped_quality"][0](
            spark, sf_dir
        ).collect()
    }
    sem = {
        r.vec_id: (r.nn_d2, r.admitted)
        for r in eq.REGISTRY["emb_incremental_semdedup"][0](
            spark, sf_dir
        ).collect()
    }

    out = eq.REGISTRY["docs_multisignal_admission"][0](
        spark, sf_dir
    ).collect()
    assert sorted(r.doc_id for r in out) == [d for d, _ in batch_rows]
    n_sem_dup = 0
    for r in out:
        nw, isq = quality[r.doc_id]
        assert (r.exact_dup, r.n_words, r.is_quality) == (
            exact[r.doc_id], nw, isq,
        )
        if r.doc_id in sem:
            nn, adm = sem[r.doc_id]
            assert (r.has_embedding, r.nn_d2, r.sem_dup) == (
                True, nn, not adm,
            )
        else:
            assert (r.has_embedding, r.nn_d2, r.sem_dup) == (
                False, -1, False,
            )
        assert r.admitted == (
            not r.exact_dup and isq and nw >= 1 and not r.sem_dup
        )
        n_sem_dup += r.sem_dup
    assert n_sem_dup > 0  # the semantic gate bites at every sf


def test_stream_admission_matches_batch_when_no_intrabatch_dups(
    spark, sf_dir
):
    """The streaming twin's only contract difference from the batch
    funnel is the dropped intra-batch first-occurrence term; the test
    corpus has no duplicate fingerprints inside the arriving class at
    this sf (asserted), so the two frames must be identical."""
    import hashlib

    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.operators.semdedup import (
        ingest_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, doc_batch = ingest_split(docs, id_col="doc_id")
    fps = [
        hashlib.md5(r.text.lower().encode()).hexdigest()
        for r in doc_batch.select("text").collect()
    ]
    assert len(fps) == len(set(fps))  # precondition for equality

    def frame(name):
        return {
            r.doc_id: (
                r.exact_dup, r.n_words, r.is_quality, r.has_embedding,
                r.nn_d2, r.sem_dup, r.admitted,
            )
            for r in eq.REGISTRY[name][0](spark, sf_dir).collect()
        }

    batch = frame("docs_multisignal_admission")
    streamed = frame("stream_multisignal_admission")
    assert streamed == batch and len(batch) == len(fps)


def test_cluster_aware_split_never_straddles_families(spark, sf_dir):
    """The remediation guarantee: every near-dup family lands in ONE
    split (impossible to straddle by construction), the guarantee is
    non-vacuous (multi-member families exist at this sf), singleton
    clusters degrade to the plain stable hash split, and every member
    inherits exactly its cluster head's assignment."""
    import hashlib

    from universal_importer_duckdb_spark import entry_queries as eq

    out = eq.REGISTRY["docs_cluster_aware_split"][0](
        spark, sf_dir
    ).collect()
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    assert sum(
        1
        for c in by_cluster
        if sum(r.cluster_id == c for r in out) > 1
    ) > 0  # non-vacuous

    b1, b2 = int((1 << 28) * 0.98), int((1 << 28) * 0.99)

    def expected(cid):
        hv = int(
            hashlib.md5(f"cluster-split-v1:{cid}".encode()).hexdigest()[:7],
            16,
        )
        return "train" if hv < b1 else ("val" if hv < b2 else "test")

    assert all(r.split == expected(r.cluster_id) for r in out)


def test_softdedup_weights_make_families_count_once(spark, sf_dir):
    """Each near-dup family's total milli-weight is |family| *
    (10^6 div |family|) — within one truncation unit per member of
    10^6 — and singletons keep exactly 10^6; multi-member families
    exist at this sf so the reweighting is non-vacuous."""
    from universal_importer_duckdb_spark import entry_queries as eq

    rows = eq.REGISTRY["docs_softdedup_weights"][0](
        spark, sf_dir
    ).collect()
    fam: dict[int, list] = {}
    for r in rows:
        assert r.weight_milli == 1_000_000 // r.cluster_size
        fam.setdefault(r.cluster_id, []).append(r)
    assert any(len(v) > 1 for v in fam.values())
    for members in fam.values():
        n = len(members)
        assert all(m.cluster_size == n for m in members)
        total = sum(m.weight_milli for m in members)
        assert 1_000_000 - n < total <= 1_000_000


def test_dsir_artifact_scores_oov_documents(spark, sf_dir):
    """r8 review: the held contribution artifact must score documents
    the corpus has NEVER seen — out-of-vocabulary tokens count in
    n_words with contribution 0 (left join + coalesce), they are not
    silently dropped."""
    from universal_importer_duckdb_spark.operators.dsir import (
        dsir_contribution_artifact,
        dsir_score_with_artifact,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    contrib = dsir_contribution_artifact(
        docs, is_target=F.col("source") == "src0"
    )
    new = spark.createDataFrame(
        [(900001, "zzzunseen qqqnovel wwwfresh"), (900002, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: (r.n_words, r.score)
           for r in dsir_score_with_artifact(new, contrib).collect()}
    assert out[900001] == (3, 0)  # all-OOV doc: counted, zero score
    assert 900002 not in out      # wordless stays excluded by default


def test_kmeans_ctes_rejects_zero_iters():
    import pytest

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        kmeans_ctes,
    )

    with pytest.raises(ValueError, match="iters must be >= 1"):
        kmeans_ctes("pts", 4, 2, 0, "cents")


def test_ivf_lists_are_norm_invariant(spark):
    """r8 review follow-up: ivf_topk serves COSINE, so its list
    geometry must not depend on vector magnitudes. The shipped test
    corpus is already unit-norm (raw-L2 == spherical there, and the
    pre-r8 float trainer's higher recall on one query was init luck,
    not geometry); this pins the property on data where it actually
    bites — per-vector scales spanning 1e-2..1e0 must yield the SAME
    spherical lists and probes as the unit-norm original."""
    import numpy as np

    from universal_importer_duckdb_spark.operators.int_kmeans import (
        quantize_unit_np,
    )
    from universal_importer_duckdb_spark.operators.similarity import (
        ivf_train_centroids,
    )

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, size=(300, 16))
    x /= np.sqrt((x * x).sum(axis=1))[:, None]
    scales = rng.uniform(0.01, 1.0, size=300)
    rows_unit = [(i, [float(v) for v in x[i]]) for i in range(300)]
    rows_scaled = [
        (i, [float(v) for v in x[i] * scales[i]]) for i in range(300)
    ]
    schema = "vec_id bigint, embedding array<double>"
    df_u = spark.createDataFrame(rows_unit, schema)
    df_s = spark.createDataFrame(rows_scaled, schema)
    cu = ivf_train_centroids(df_u, 8, sample_size=300, spherical=True)
    cs = ivf_train_centroids(df_s, 8, sample_size=300, spherical=True)
    # scaling each vector by ~1 +/- double rounding: quantized unit
    # projections may differ by at most 1 ulp-of-quantization per dim
    assert np.abs(cu - cs).max() <= 1
    # and the quantizer itself is exactly scale-free on exact scales
    assert np.array_equal(
        quantize_unit_np(x[:5]), quantize_unit_np(x[:5] * 4.0)
    )


def test_dsir_resample_scans_the_corpus_once(spark, sf_dir):
    """r12 (verdict #3): the separate per-source totals branch was a
    SECOND scan of documents joined back onto the kept-counts; the
    resample report now falls out of the one scoring pass
    (include_wordless explode_outer), so the optimized plan reads the
    corpus exactly once and contains no aggregate-join."""
    from universal_importer_duckdb_spark.operators.dsir import dsir_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = dsir_resample(docs, is_target=F.col("source") == "src0")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # one parquet Relation (the corpus) + the held contrib LogicalRDD;
    # a second corpus scan would print a second Relation line
    assert plan.count("Relation [") == 1, plan
