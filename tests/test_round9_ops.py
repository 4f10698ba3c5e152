"""Round-9 regressions: the r8 verdict items.

- semdedup's bounded-cluster contract is now ENFORCED: a pandas group
  larger than max_cluster_size fails the task with an actionable
  error instead of shipping an unbounded group into executor memory
  (r8 verdict "What's wrong" #3 — the guard class bucket_pairs
  already has, minus the silent drop, which would flip verdicts).
- IVF recall-vs-nprobe is a tested contract: sweeping nprobe must
  yield monotone non-decreasing recall against the exact kNN, and
  full-probe recall must be exact (r8 verdict item #8).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# -------------------------------------------- semdedup cluster guard
def _tiny_vectors(spark, n, dim=4):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_semdedup_raises_on_oversized_cluster(spark):
    """n_clusters=1 funnels every vector into one pandas group; a cap
    below the corpus size must fail the job with the actionable
    message, not OOM-or-succeed silently."""
    from pyspark.errors.exceptions.captured import PythonException

    from universal_importer_duckdb_spark.operators.semdedup import semdedup

    df = _tiny_vectors(spark, 24)
    out = semdedup(
        df, n_clusters=1, sample_size=24, iters=2, max_cluster_size=10
    )
    with pytest.raises(PythonException, match="max_cluster_size"):
        out.collect()


def test_semdedup_guard_disabled_and_healthy_paths(spark):
    """The same corpus passes when the cap clears the cluster size or
    the guard is disabled — verdicts identical both ways."""
    from universal_importer_duckdb_spark.operators.semdedup import semdedup

    df = _tiny_vectors(spark, 24)
    capped = sorted(
        (r.vec_id, r.kept)
        for r in semdedup(
            df, n_clusters=1, sample_size=24, iters=2, max_cluster_size=24
        ).collect()
    )
    uncapped = sorted(
        (r.vec_id, r.kept)
        for r in semdedup(
            df, n_clusters=1, sample_size=24, iters=2, max_cluster_size=None
        ).collect()
    )
    assert capped == uncapped
    assert len(capped) == 24


def test_incremental_semdedup_threads_the_guard(spark):
    """The admission path trains its at-rest artifacts through the
    same pruning kernel, so the guard must fire there too."""
    from pyspark.errors.exceptions.captured import PythonException

    from universal_importer_duckdb_spark.operators.semdedup import (
        incremental_semdedup,
        ingest_split,
    )

    df = _tiny_vectors(spark, 40)
    at_rest, arriving = ingest_split(df, mod=4)
    out = incremental_semdedup(
        at_rest, arriving, n_clusters=1, sample_size=40, iters=2,
        max_cluster_size=5,
    )
    with pytest.raises(PythonException, match="max_cluster_size"):
        out.collect()


# -------------------------------------------- IVF recall contract
def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """Recall@10 vs the exact kNN must be monotone non-decreasing in
    nprobe, and probing every list must reproduce the exact result —
    a regression in the probe order breaks one of the two."""
    from universal_importer_duckdb_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("embedding").alias("q"))
        .collect()[0]["q"]
    )
    k, n_list = 10, 8
    exact = {
        r.vec_id
        for r in cosine_topk(emb, query, k=k).select("vec_id").collect()
    }
    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = {
            r.vec_id
            for r in ivf_topk(
                emb, query, k=k, n_list=n_list, nprobe=nprobe
            )
            .select("vec_id")
            .collect()
        }
        recalls.append(len(got & exact) / k)
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


# -------------------------------------------- r9 births
def test_trigram_langid_classifies_distinct_languages(spark):
    """On a corpus whose languages actually differ (unlike the
    synthetic tables, where labels share one vocabulary), the
    rank-profile classifier must recover every training label."""
    from universal_importer_duckdb_spark.operators.text_analysis import (
        trigram_rank_langid,
    )

    en = "the quick brown fox jumps over the lazy dog and the cat with them"
    de = "der schnelle braune fuchs springt ueber den faulen hund und die katze"
    fr = "le rapide renard brun saute par dessus le chien paresseux et le chat"
    rows = []
    for i, (lang, base) in enumerate(
        [("en", en), ("de", de), ("fr", fr)] * 4
    ):
        rows.append((i, lang, base + f" extra {lang} words here {i % 3}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = {r.doc_id: r for r in trigram_rank_langid(docs, m=50, n=20).collect()}
    assert len(out) == len(rows)
    correct = sum(1 for r in out.values() if r.pred_lang == r.lang)
    assert correct == len(rows), [
        (r.doc_id, r.lang, r.pred_lang) for r in out.values()
    ]
    assert all(r.dist >= 0 for r in out.values())


def test_selfdup_spans_first_occurrence_keeps(spark):
    """A passage pasted into three docs marks spans only in the two
    LATER ones; the earliest holder and an unrelated doc are clean."""
    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_duplicate_spans,
    )

    shared = " ".join(f"w{i}" for i in range(12))  # 12 tokens, n=8
    rows = [
        (1, "prefix one two three " + shared),
        (2, shared + " suffix alpha beta"),
        (3, "a b c " + shared + " tail"),
        (4, " ".join(f"u{i}" for i in range(20))),  # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = cross_doc_duplicate_spans(docs, n=8)
    got = {r.doc_id: (r.span_start, r.span_end) for r in spans.collect()}
    assert 1 not in got and 4 not in got
    # doc 2: shared passage starts at token 1, spans tokens 1..12
    assert got[2] == (1, 12)
    # doc 3: after 3 filler tokens, spans tokens 4..15
    assert got[3] == (4, 15)


def test_sign_hamming_topk_exactness_on_candidates(spark, sf_dir):
    """The Hamming pre-filter must never change the scores: every
    returned cosine equals the exact full-scan cosine for that id,
    and self-similarity ranks first when the query is in the corpus."""
    from universal_importer_duckdb_spark.operators.similarity import (
        cosine_topk,
        sign_hamming_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pyspark.sql.functions as SF

    qv = [
        float(x)
        for x in emb.filter(SF.col("vec_id") == 0).collect()[0].embedding
    ]
    corpus = emb  # query INCLUDED: its own hamming is 0, cosine 1.0
    got = sign_hamming_topk(corpus, qv, k=5, n_candidates=50).collect()
    assert got[0].vec_id == 0 and got[0].hamming == 0
    assert abs(got[0].cosine - 1.0) < 1e-12
    exact = {
        r.vec_id: r.cosine for r in cosine_topk(corpus, qv, k=500).collect()
    }
    for r in got:
        assert exact[r.vec_id] == r.cosine


def test_matryoshka_recall_bounds_and_full_dim_identity(spark, sf_dir):
    """Full-width overlap is k/k by construction; every tier's
    overlap is within [0, k]; dims come back sorted."""
    from universal_importer_duckdb_spark.operators.similarity import (
        matryoshka_recall,
    )
    import pyspark.sql.functions as SF

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [
        float(x)
        for x in emb.filter(SF.col("vec_id") == 0).collect()[0].embedding
    ]
    rows = matryoshka_recall(
        emb.filter(SF.col("vec_id") > 0), qv, dims=(8, 16, 32, 64), k=10
    ).collect()
    assert [r.dim for r in rows] == [8, 16, 32, 64]
    for r in rows:
        assert 0 <= r.n_overlap <= 10
        assert r.recall_milli == r.n_overlap * 100
    assert rows[-1].n_overlap == 10


def test_selfdedup_text_earliest_holder_untouched(spark):
    """Excision composes with the span audit: the earliest holder and
    unrelated docs keep their text verbatim; later copies lose
    exactly their duplicated tokens."""
    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_duplicate_spans,
        excise_spans,
    )

    shared = " ".join(f"w{i}" for i in range(12))
    rows = [
        (1, "prefix one two three " + shared),
        (2, shared + " suffix alpha beta"),
        (4, " ".join(f"u{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        r.doc_id: r
        for r in excise_spans(
            docs, cross_doc_duplicate_spans(docs, n=8)
        ).collect()
    }
    assert out[1].clean_text == rows[0][1]
    assert out[1].n_tokens_removed == 0
    assert out[4].clean_text == rows[2][1]
    assert out[2].clean_text == "suffix alpha beta"
    assert out[2].n_tokens_removed == 12


def test_stream_langid_equals_batch(spark, sf_dir):
    """The ingest twin scored against the held profile must equal the
    batch classifier row-for-row — same ids, labels, predictions,
    and distances."""
    from universal_importer_duckdb_spark import entry_queries as eq

    batch = sorted(
        (r.doc_id, r.lang, r.pred_lang, r.dist)
        for r in eq.REGISTRY["docs_langid_trigram_rank"][0](
            spark, sf_dir
        ).collect()
    )
    stream = sorted(
        (r.doc_id, r.lang, r.pred_lang, r.dist)
        for r in eq.REGISTRY["stream_langid_scores"][0](
            spark, sf_dir
        ).collect()
    )
    assert stream == batch
    assert len(batch) > 0


def test_matryoshka_rejects_overwide_dims_and_ragged_rows(spark, sf_dir):
    """A tier wider than the QUERY fails at plan time (client-side
    check, no Spark job needed); a CORPUS row narrower than the
    widest tier fails at execution — neither may fold cosines to
    NULL through zip_with padding."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from universal_importer_duckdb_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [0.5] * 64
    with _pytest.raises(ValueError, match="query width"):
        matryoshka_recall(emb, qv, dims=(8, 128), k=5)

    ragged = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 32)],
        "vec_id bigint, embedding array<double>",
    )
    with _pytest.raises(Exception, match="narrower than the widest"):
        matryoshka_recall(ragged, qv, dims=(8, 64), k=2).collect()


def test_stream_langid_multibatch_convergence(spark, tmp_path):
    """Drained langid-at-ingest over a source split into two files at
    maxFilesPerTrigger=1 (two real micro-batches) must equal the
    batch classifier trained on the same corpus — the stateless
    scorer cannot depend on how availableNow splits arrivals."""
    import os

    from universal_importer_duckdb_spark.operators.text_analysis import (
        langid_artifact,
        trigram_rank_langid,
    )
    from universal_importer_duckdb_spark.streaming.docs import (
        DOCS_RAW_SCHEMA,
        stream_documents,
        streaming_langid_scores,
    )

    rows1 = [
        (1, "the quick brown fox and the dog", "en", "s", 30),
        (2, "der schnelle fuchs und der hund", "de", "s", 30),
    ]
    rows2 = [
        (3, "the lazy cat with the bird and them", "en", "s", 30),
        (4, "die katze und der vogel mit dem hund", "de", "s", 30),
    ]
    d = tmp_path / "docs_langid_stream"
    os.makedirs(d)
    spark.createDataFrame(rows1, DOCS_RAW_SCHEMA).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(rows2, DOCS_RAW_SCHEMA).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )
    batch = spark.createDataFrame(rows1 + rows2, DOCS_RAW_SCHEMA)
    artifact = langid_artifact(batch, m=50)  # the production knobs

    stream = stream_documents(
        spark, str(d) + "/*", glob="*.parquet", max_files_per_trigger=1
    )
    q = (
        streaming_langid_scores(stream, artifact)
        .writeStream.format("memory")
        .queryName("t_stream_langid_conv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("t_stream_langid_conv").collect())
    # batch classifier at the SAME knobs the streaming scorer pins
    # (m=50 artifact, n=20)
    want = sorted(
        tuple(r) for r in trigram_rank_langid(batch, m=50, n=20).collect()
    )
    assert len(got) == 4
    assert {g[0] for g in got} == {1, 2, 3, 4}
    assert got == want


def test_incremental_selfdup_spans_semantics(spark):
    """Arriving docs are screened against at-rest only: an arriving
    doc sharing a passage with AT-REST text gets a span; an arriving
    doc sharing a passage only with ANOTHER ARRIVAL does not (the
    batch-order-free contract); at-rest docs never appear."""
    from universal_importer_duckdb_spark.operators.corpus import (
        incremental_duplicate_spans,
    )

    shared_rest = " ".join(f"r{i}" for i in range(10))
    shared_arr = " ".join(f"a{i}" for i in range(10))
    at_rest = spark.createDataFrame(
        [(1, shared_rest + " tail one"),
         (2, " ".join(f"z{i}" for i in range(15)))],
        "doc_id bigint, text string",
    )
    arriving = spark.createDataFrame(
        [(10, "x y z " + shared_rest),          # dup vs at-rest
         (20, shared_arr + " end"),              # dup only vs arrival 30
         (30, "p q " + shared_arr)],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.span_start, r.span_end)
        for r in incremental_duplicate_spans(at_rest, arriving, n=8).collect()
    }
    assert set(got) == {10}
    assert got[10] == (4, 13)
