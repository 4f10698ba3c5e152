"""SemDeDup — semantic deduplication of an embedding corpus by
within-cluster near-neighbor pruning (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication").

The operator composes two primitives the engine already has:

1. **Deterministic integer k-means** (operators/int_kmeans.py): every
   vector is quantized once (``floor(x*10^6)+2^21`` — exact in every
   engine) and assigned to its nearest integer centroid, trained with
   the scaled-integer Lloyd's on a bounded hash-ordered sample. This
   is the identical training contract behind the PQ/IVF/kmeans
   entries, so the cluster structure is bit-replayable in SQL.
2. **First-occurrence pruning within each cluster**: members are
   ordered farthest-from-centroid first (``d2`` DESC, ``vec_id`` ASC
   for ties — the paper's "keep the example with low similarity to
   the centroid" choice), and a member is PRUNED when any EARLIER
   member in that order lies within ``eps2`` integer squared-L2
   distance. This is the paper's upper-triangular-matrix semantics:
   the predicate looks only at earlier rows, NOT at their own
   kept/pruned status, so there is no transitive closure and the
   whole operator is a correlated EXISTS in SQL — the same
   non-recursive first-occurrence shape as the line-dedup family.

Scale shape (100 TB): training is a bounded driver-side computation
(the sample collect is capped regardless of corpus size) and the
centroid matrix rides to executors in the Arrow UDF closure; the one
shuffle is the ``groupBy(cluster)`` for the pruning pass. The
per-cluster kernel is an exact integer GEMM whose working set is
chunked to O(chunk * |cluster|) — but |cluster| itself must stay
bounded, so at corpus scale ``n_clusters`` scales WITH the corpus
(the paper uses 50k clusters for LAION-440M; cluster size, not
corpus size, is the knob). Skewed clusters are visible in the
assignment output (group-by count) before the pruning pass runs.

Cross-engine determinism: every quantity is BIGINT (quantized
coordinates < 2^22, pairwise 64-dim distances < 2^50, GEMM dot
products < 2^50 — no int64 overflow), ordering ties are broken by
vec_id, so the full (vec_id, cluster, d2, kept) assignment — not a
summary — hash-matches the DuckDB replay.

Reference anchor: none (main.py:1-510 has no vector operators) —
north-star LLM-pipeline scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~0.1% of the global quantized pair-distance distribution on the
# synthetic embeddings; prunes ~8% at sf0.01 and ~19% at sf0.1.
EPS2_DEFAULT = 1_250_000_000_000


def semdedup(
    df: DataFrame,
    n_clusters: int = 16,
    eps2: int = EPS2_DEFAULT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 5,
) -> DataFrame:
    """Per-vector SemDeDup verdicts: ``(vec_id, cluster, d2, kept)``.

    ``kept=false`` means an earlier member (d2 DESC, id ASC) of the
    same k-means cluster lies within ``eps2`` integer squared L2
    distance — the corpus keeps exactly the ``kept=true`` rows.
    """
    from universal_importer_duckdb_spark.operators.int_kmeans import (
        int_argmin_dists,
        quantize_np,
    )
    from universal_importer_duckdb_spark.operators.similarity import (
        ivf_train_centroids,
    )

    C = ivf_train_centroids(
        df, n_clusters, vec_col, id_col, sample_size, iters
    )

    def _assign(batches):
        # narrow pass: cluster id + exact d2, quantized vector carried
        # for the pruning shuffle (int64 array, no floats cross here)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xq = quantize_np(
                np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                    dtype=np.float64,
                )
            )
            a, dd = int_argmin_dists(xq, C)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cluster": a,
                    "d2": dd,
                    "q": list(xq),
                }
            )

    assigned = df.mapInPandas(
        _assign,
        schema="vec_id bigint, cluster bigint, d2 bigint, q array<bigint>",
    )

    eps2_i = int(eps2)

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        dd = pdf["d2"].to_numpy()
        Q = np.asarray(pdf["q"].tolist(), dtype=np.int64)
        # paper order: farthest-from-centroid first, ids break ties
        o = np.lexsort((ids, -dd))
        mo = Q[o]
        m = len(o)
        kept_o = np.ones(m, dtype=bool)
        if m > 1:
            # exact integer GEMM distances, chunked so the working
            # set stays O(chunk * m) whatever the cluster size
            norms = (mo * mo).sum(axis=1, dtype=np.int64)
            chunk = max(1, 4_000_000 // m)
            for lo in range(1, m, chunk):
                hi = min(lo + chunk, m)
                dots = mo[lo:hi] @ mo[:hi].T
                D = norms[lo:hi, None] + norms[None, :hi] - 2 * dots
                close = D <= eps2_i
                # strictly earlier rows only (upper-triangular mask)
                close &= np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
                kept_o[lo:hi] = ~close.any(axis=1)
        kept = np.empty(m, dtype=bool)
        kept[o] = kept_o
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].to_numpy(),
                "d2": dd,
                "kept": kept,
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        _prune, schema="vec_id bigint, cluster bigint, d2 bigint, kept boolean"
    )


def semdedup_sql(
    n_clusters: int = 16,
    dim: int = 64,
    eps2: int = EPS2_DEFAULT,
    sample_size: int = 2048,
    iters: int = 5,
) -> str:
    """DuckDB oracle: replay the integer training + assignment (same
    CTE chain as kmeans_clusters_sql), then express the pruning as a
    correlated NOT EXISTS over earlier same-cluster members."""
    from universal_importer_duckdb_spark.operators.int_kmeans import (
        SAMPLE_SALT,
        kmeans_ctes,
        sql_md5_28,
        sql_qdim,
    )

    samp_hash = sql_md5_28(f"'{SAMPLE_SALT}:'||pid")
    dims = ", ".join(
        f"{sql_qdim('embedding', i)} AS d{i}" for i in range(1, dim + 1)
    )
    dist_pc = " + ".join(
        f"(p.d{i}-c.d{i})*(p.d{i}-c.d{i})" for i in range(1, dim + 1)
    )
    dist_ab = " + ".join(
        f"(a.d{i}-b.d{i})*(a.d{i}-b.d{i})" for i in range(1, dim + 1)
    )
    return f"""
WITH
pts0 AS MATERIALIZED (SELECT vec_id AS pid, {dims} FROM embeddings),
sampids AS MATERIALIZED (SELECT pid FROM pts0
            ORDER BY {samp_hash}, pid
            LIMIT {sample_size}),
pts AS MATERIALIZED (SELECT p.* FROM pts0 p JOIN sampids USING (pid)),
{kmeans_ctes('pts', dim, n_clusters, iters, 'cents')},
asn AS MATERIALIZED (
  SELECT pid, cid, dd FROM (
    SELECT p.pid, c.cid, {dist_pc} AS dd,
           row_number() OVER (PARTITION BY p.pid
                              ORDER BY {dist_pc}, c.cid) AS rn
    FROM pts0 p JOIN cents c ON TRUE) WHERE rn = 1),
ap AS MATERIALIZED (
  SELECT a.pid, a.cid, a.dd, p.* EXCLUDE (pid)
  FROM asn a JOIN pts0 p USING (pid))
SELECT a.pid AS vec_id, CAST(a.cid AS BIGINT) AS cluster,
       CAST(a.dd AS BIGINT) AS d2,
       NOT EXISTS (
         SELECT 1 FROM ap b
         WHERE b.cid = a.cid
           AND (b.dd > a.dd OR (b.dd = a.dd AND b.pid < a.pid))
           AND {dist_ab} <= {int(eps2)}) AS kept
FROM ap a
"""
