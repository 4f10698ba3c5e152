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
