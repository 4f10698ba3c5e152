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
corpus size, is the knob). That contract is ENFORCED, not hoped for:
``max_cluster_size`` (default 100k) fails the pruning task with an
actionable error when a skewed or under-clustered corpus would ship
an unbounded pandas group into executor memory.

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

# Bounded-cluster cap: 100k members x 64 dims x 8 bytes = ~50 MB of
# quantized vectors per pandas group (plus the O(chunk * m) GEMM
# working set) — comfortably inside one executor task. A corpus that
# trips it needs more clusters, not a bigger cap.
MAX_CLUSTER_SIZE_DEFAULT = 100_000


def semdedup(
    df: DataFrame,
    n_clusters: int = 16,
    eps2: int = EPS2_DEFAULT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 5,
    centroids=None,
    emit_q: bool = False,
    max_cluster_size: int | None = MAX_CLUSTER_SIZE_DEFAULT,
) -> DataFrame:
    """Per-vector SemDeDup verdicts: ``(vec_id, cluster, d2, kept)``.

    ``kept=false`` means an earlier member (d2 DESC, id ASC) of the
    same k-means cluster lies within ``eps2`` integer squared L2
    distance — the corpus keeps exactly the ``kept=true`` rows.

    ``centroids`` (an int64 matrix) skips the training pass — the
    deterministic trainer always reproduces the same matrix from the
    same frame, so callers that already trained (at_rest_artifacts)
    pass it through instead of paying a second sample-collect job.
    ``emit_q`` adds each KEPT row's quantized vector to the output
    (artifact-building callers read it instead of re-scanning the
    corpus); the registry entry keeps the scalar-only default.

    ``max_cluster_size`` ENFORCES the bounded-cluster contract the
    module docstring states (cluster size, not corpus size, must stay
    bounded): a pandas group larger than the cap fails the task with
    an actionable error instead of silently shipping an unbounded
    group into executor memory — the same guard class as
    ``bucket_pairs``' ``max_bucket_size``, except SemDeDup must not
    silently DROP a cluster (that would flip verdicts), so the guard
    raises. The check runs inside the kernel: zero cost when healthy,
    and the failure names the cluster and the fix (raise
    ``n_clusters`` so expected cluster size = corpus / n_clusters
    stays under the cap, as the paper does — 50k clusters for
    LAION-440M). ``None`` disables the guard.
    """
    from universal_importer_duckdb_spark.operators.similarity import (
        ivf_train_centroids,
    )

    C = centroids if centroids is not None else ivf_train_centroids(
        df, n_clusters, vec_col, id_col, sample_size, iters
    )

    # one assignment kernel for the whole module (r8 self-review):
    # the at-rest prune and the arrival-admission paths must quantize
    # and tie-break identically, so both go through _assign_with_q
    assigned = _assign_with_q(df, C, vec_col, id_col)
    if id_col != "vec_id":
        assigned = assigned.withColumnRenamed(id_col, "vec_id")

    eps2_i = int(eps2)
    cap = None if max_cluster_size is None else int(max_cluster_size)

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        if cap is not None and len(pdf) > cap:
            raise ValueError(
                f"SemDeDup cluster {int(pdf['cluster'].iloc[0])} holds "
                f"{len(pdf)} members, above max_cluster_size={cap}. "
                "Cluster size, not corpus size, bounds this kernel's "
                "memory: raise n_clusters so corpus/n_clusters stays "
                "under the cap (SemDeDup scales cluster count with the "
                "corpus), or raise max_cluster_size deliberately."
            )
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
            # set stays O(chunk * m) whatever the cluster size; the
            # dot runs through int_gemm_exact (bit-exact float64
            # BLAS under the quantize range contract — r15, ~4x at
            # 7k-member clusters)
            from universal_importer_duckdb_spark.operators.int_kmeans import (
                int_gemm_exact,
            )

            norms = (mo * mo).sum(axis=1, dtype=np.int64)
            chunk = max(1, 4_000_000 // m)
            for lo in range(1, m, chunk):
                hi = min(lo + chunk, m)
                dots = int_gemm_exact(mo[lo:hi], mo[:hi])
                D = norms[lo:hi, None] + norms[None, :hi] - 2 * dots
                close = D <= eps2_i
                # strictly earlier rows only (upper-triangular mask)
                close &= np.arange(hi)[None, :] < np.arange(lo, hi)[:, None]
                kept_o[lo:hi] = ~close.any(axis=1)
        kept = np.empty(m, dtype=bool)
        kept[o] = kept_o
        out = {
            "vec_id": ids,
            "cluster": pdf["cluster"].to_numpy(),
            "d2": dd,
            "kept": kept,
        }
        if emit_q:
            # kept rows carry their quantized vector out of the prune
            # (it is already in hand), saving the caller a second
            # corpus scan + join; pruned rows carry an empty array
            empty = np.empty(0, dtype=np.int64)
            out["q"] = [Q[i] if kept[i] else empty for i in range(m)]
        return pd.DataFrame(out)

    q_schema = ", q array<bigint>" if emit_q else ""
    return assigned.groupBy("cluster").applyInPandas(
        _prune,
        schema=(
            f"vec_id bigint, cluster bigint, d2 bigint, kept boolean"
            f"{q_schema}"
        ),
    )


ARRIVAL_SALT = "semdedup-ingest-v1"


def _int_dist2(a, b):
    """Exact integer squared L2 between two array<bigint> columns —
    a zip_with/aggregate fold (JVM, no UDF). 64 dims x (<2^22)^2
    terms < 2^50: no BIGINT overflow."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def ingest_split(
    df: DataFrame, mod: int = 8, id_col: str = "vec_id"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (at_rest, arriving) split standing in for "the
    stored corpus" vs "today's ingest": arriving = salted md5-28 of
    the id ≡ 0 (mod ``mod``). Same idiom as the incremental text
    dedup entries."""
    from universal_importer_duckdb_spark.operators.corpus import _md5_28

    h = _md5_28(
        F.concat(F.lit(ARRIVAL_SALT + ":"), F.col(id_col).cast("string"))
    ) % F.lit(mod)
    return df.filter(h != 0), df.filter(h == 0)


def incremental_semdedup(
    at_rest: DataFrame,
    arriving: DataFrame,
    n_clusters: int = 16,
    eps2: int = EPS2_DEFAULT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 5,
    max_cluster_size: int | None = MAX_CLUSTER_SIZE_DEFAULT,
    held: bool = False,
) -> DataFrame:
    """Admission control for newly-ingested vectors against a
    SemDeDup'd at-rest corpus: an arriving vector is ADMITTED iff no
    KEPT at-rest member of its assigned cluster lies within ``eps2``
    integer squared L2. Returns ``(vec_id, cluster, d2, nn_d2,
    admitted)`` — nn_d2 is the exact min distance to a kept member
    (-1 when the cluster holds none).

    Verdicts depend only on the at-rest state, never on other
    arrivals, so the result is batch-order-free — which is what makes
    the streaming twin (streaming/embeddings.py) a stateless
    stream-static join with this exact batch semantics as its oracle.

    Scale shape: the at-rest side (train + semdedup verdicts + the
    kept-member join) is the stored artifact of a prior corpus pass —
    in production it is read, not recomputed, and only the per-batch
    admission runs per ingest. Since r15 the BATCH path routes
    through :func:`_admit_against_kept_kernel` (per-cluster integer
    GEMM via a cogrouped Arrow kernel — an arriving vector only meets
    its own cluster's kept members, never the corpus); the JVM
    zip_with/aggregate fold (:func:`_admit_against_kept`) remains the
    STREAMING twins' stream-static shape (a cogroup cannot be
    stream-static) and the kernel's live differential oracle in
    tests. ``held=True`` materializes the at-rest artifacts once at
    plan construction (see :func:`at_rest_artifacts`) — the serving
    shape the registry entries bench.
    """
    C, kept_q = at_rest_artifacts(
        at_rest, n_clusters, eps2, vec_col, id_col, sample_size, iters,
        max_cluster_size=max_cluster_size, held=held,
    )
    assigned = _assign_with_q(arriving, C, vec_col, id_col)
    return _admit_against_kept_kernel(
        assigned, kept_q, eps2, max_cluster_size=max_cluster_size
    )


def at_rest_artifacts(
    at_rest: DataFrame,
    n_clusters: int = 16,
    eps2: int = EPS2_DEFAULT,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 5,
    max_cluster_size: int | None = MAX_CLUSTER_SIZE_DEFAULT,
    held: bool = False,
):
    """The deployed admission state: the trained centroid matrix and
    the (cluster, quantized-vector) frame of KEPT at-rest members. In
    production both are stored artifacts of the last corpus pass —
    computed here from the at-rest frame so batch and streaming
    ingest share one definition.

    ``held=True`` materializes the kept-member frame via eager
    localCheckpoint — the production serving shape, where the at-rest
    prune ran once in the last corpus pass and per-batch admission
    only pays assignment + the cluster probe (the ``gram_index(held=
    True)`` / BPE / DSIR trained-artifact contract; the build is a
    bounded one-time action whose cost is recorded in
    OPTIMIZATION_r16.md). ``held=False`` keeps the lazy plan for
    one-shot compositions; the streaming twins keep it (their drain
    harness re-plans per micro-batch against the static side)."""
    from universal_importer_duckdb_spark.operators.similarity import (
        ivf_train_centroids,
    )

    C = ivf_train_centroids(
        at_rest, n_clusters, vec_col, id_col, sample_size, iters
    )
    # one training + one corpus pass: the prune emits each kept
    # member's quantized vector (emit_q), so the kept-member frame
    # needs no second corpus scan or join
    verdicts = semdedup(
        at_rest, n_clusters, eps2, vec_col, id_col, sample_size, iters,
        centroids=C, emit_q=True, max_cluster_size=max_cluster_size,
    )
    kept_q = verdicts.filter(F.col("kept")).select(
        "cluster", F.col("q").alias("qk")
    )
    if held:
        kept_q = kept_q.localCheckpoint(eager=True)
    return C, kept_q


def _assign_with_q(
    df: DataFrame,
    C,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Arrow-batched centroid assignment carrying the quantized
    vector: ``(<id_col>, <carry_cols...>, cluster, d2, q)``.
    Stateless, so it runs unchanged on a streaming DataFrame.

    Rows whose vector is NULL (a document not yet embedded, in the
    admission-funnel shape) assign to cluster -1 with d2 -1 and an
    empty q — no kept member lives in cluster -1, so the downstream
    semantic gate abstains on them by construction."""
    from universal_importer_duckdb_spark.operators.int_kmeans import (
        int_argmin_dists,
        quantize_np,
    )

    Cm = np.asarray(C, dtype=np.int64)
    carry = list(carry_cols)
    carry_schema = "".join(
        f", {c} {df.schema[c].dataType.simpleString()}" for c in carry
    )
    # project BEFORE the Arrow map: mapInPandas pins its input
    # columns, so an unpruned frame would ship every column (the
    # embeddings table's label, at 100 TB the whole row) through
    # Arrow for nothing
    df = df.select(id_col, *carry, vec_col)

    def _assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            present = pdf[vec_col].notna().to_numpy()
            n = len(pdf)
            if present.all():
                xq = quantize_np(
                    np.asarray(
                        [
                            np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]
                        ],
                        dtype=np.float64,
                    )
                )
                a, dd = int_argmin_dists(xq, Cm)
                qs = list(xq)
            else:
                a = np.full(n, -1, dtype=np.int64)
                dd = np.full(n, -1, dtype=np.int64)
                empty = np.empty(0, dtype=np.int64)
                qs = [empty] * n
                if present.any():
                    xq = quantize_np(
                        np.asarray(
                            [
                                np.asarray(v, dtype=np.float64)
                                for v in pdf.loc[present, vec_col]
                            ],
                            dtype=np.float64,
                        )
                    )
                    ap, dp = int_argmin_dists(xq, Cm)
                    a[present], dd[present] = ap, dp
                    ptr = 0
                    for i in np.flatnonzero(present):
                        qs[i] = xq[ptr]
                        ptr += 1
            out = {id_col: pdf[id_col].to_numpy()}
            for c in carry:
                out[c] = pdf[c].to_numpy()
            out.update({"cluster": a, "d2": dd, "q": qs})
            yield pd.DataFrame(out)

    return df.mapInPandas(
        _assign,
        schema=(
            f"{id_col} bigint{carry_schema}, "
            "cluster bigint, d2 bigint, q array<bigint>"
        ),
    )


def _admit_against_kept_kernel(
    assigned: DataFrame,
    kept_q: DataFrame,
    eps2: int,
    max_cluster_size: int | None = MAX_CLUSTER_SIZE_DEFAULT,
) -> DataFrame:
    """Batch admission via a per-cluster integer-GEMM cogroup kernel —
    the Arrow twin of :func:`_admit_against_kept` (r15, guide §4.2).

    The join form pays an INTERPRETED zip_with/aggregate fold per
    (arrival, kept-member) pair — measured ~17 µs/pair at sf0.1
    (0.37 s of the 1.0 s entry for just 22k pairs), and the pair count
    grows ~quadratically when a probe replicates the corpus at fixed
    n_clusters (the entry's Spark scale exponent read 0.85 vs the
    oracle's 0.52 at x16 — a crossing trend). Here each cluster's
    arrivals meet its kept members in ONE numpy int64 GEMM
    (``na + nk - 2*A@K.T``), the same exact-integer math and chunked
    working set as the prune kernel, so verdicts are bit-identical
    while the per-pair constant drops to BLAS speed. Bounded by the
    same cluster-size contract as the prune (``max_cluster_size``
    guards BOTH sides; cluster size, not corpus size, is the memory
    unit). Streaming callers keep the join form — a cogroup cannot be
    stream-static.

    Preconditions vs the join form (r15 advice, documented):

    * arrivals must carry UNIQUE vec_ids — the kernel emits one row
      per arrival row, while the join form's groupBy(vec_id, cluster,
      d2) collapses duplicated ids; every caller here feeds ids from
      a primary-key column, so the forms coincide on in-contract
      input;
    * an over-cap cluster RAISES here (fail-loud, see above) where
      the join form would compute it — the upstream prune enforces
      the same cap, so only out-of-contract arrival batches differ."""
    eps2_i = int(eps2)
    cap = None if max_cluster_size is None else int(max_cluster_size)

    def _admit(arr_pdf: pd.DataFrame, kept_pdf: pd.DataFrame) -> pd.DataFrame:
        n, m = len(arr_pdf), len(kept_pdf)
        if n == 0:
            return pd.DataFrame(
                {
                    "vec_id": np.empty(0, dtype=np.int64),
                    "cluster": np.empty(0, dtype=np.int64),
                    "d2": np.empty(0, dtype=np.int64),
                    "nn_d2": np.empty(0, dtype=np.int64),
                    "admitted": np.empty(0, dtype=bool),
                }
            )
        if cap is not None and max(n, m) > cap:
            raise ValueError(
                f"SemDeDup admission cluster {int(arr_pdf['cluster'].iloc[0])} "
                f"holds {n} arrivals / {m} kept members, above "
                f"max_cluster_size={cap}. Cluster size, not corpus size, "
                "bounds this kernel's memory: raise n_clusters so "
                "corpus/n_clusters stays under the cap, or raise "
                "max_cluster_size deliberately."
            )
        ids = arr_pdf["vec_id"].to_numpy()
        cl = arr_pdf["cluster"].to_numpy()
        dd = arr_pdf["d2"].to_numpy()
        if m == 0:
            nn = np.full(n, -1, dtype=np.int64)
            admitted = np.ones(n, dtype=bool)
        else:
            from universal_importer_duckdb_spark.operators.int_kmeans import (
                int_gemm_exact,
            )

            A = np.asarray(arr_pdf["q"].tolist(), dtype=np.int64)
            K = np.asarray(kept_pdf["qk"].tolist(), dtype=np.int64)
            na = (A * A).sum(axis=1, dtype=np.int64)
            nk = (K * K).sum(axis=1, dtype=np.int64)
            chunk = max(1, 4_000_000 // m)
            nn = np.empty(n, dtype=np.int64)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                D = na[lo:hi, None] + nk[None, :] - 2 * int_gemm_exact(
                    A[lo:hi], K
                )
                nn[lo:hi] = D.min(axis=1)
            admitted = nn > eps2_i
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": cl,
                "d2": dd,
                "nn_d2": nn,
                "admitted": admitted,
            }
        )

    return assigned.groupBy("cluster").cogroup(
        kept_q.groupBy("cluster")
    ).applyInPandas(
        _admit,
        schema=(
            "vec_id bigint, cluster bigint, d2 bigint, "
            "nn_d2 bigint, admitted boolean"
        ),
    )


def _admit_against_kept(
    assigned: DataFrame, kept_q: DataFrame, eps2: int
) -> DataFrame:
    """Join assigned arrivals to same-cluster kept members, min-fold
    the exact integer distances, admit when none is within eps2.
    Works identically on batch and stream-static ``assigned`` — the
    batch entry routes through :func:`_admit_against_kept_kernel`
    instead (bit-identical verdicts, BLAS per-pair constant); this
    form remains the streaming twins' stream-static shape."""
    nn = (
        assigned.join(kept_q, "cluster", "left")
        .withColumn("dist2", _int_dist2(F.col("q"), F.col("qk")))
        .groupBy("vec_id", "cluster", "d2")
        .agg(F.min("dist2").alias("nn"))
    )
    return nn.select(
        "vec_id",
        "cluster",
        "d2",
        F.coalesce(F.col("nn"), F.lit(-1)).cast("bigint").alias("nn_d2"),
        (F.col("nn").isNull() | (F.col("nn") > F.lit(int(eps2)))).alias(
            "admitted"
        ),
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


def incremental_semdedup_sql(
    n_clusters: int = 16,
    dim: int = 64,
    eps2: int = EPS2_DEFAULT,
    mod: int = 8,
    sample_size: int = 2048,
    iters: int = 5,
) -> str:
    """DuckDB oracle for ingest_split + incremental_semdedup: the
    at-rest replay is semdedup_sql restricted to the at-rest hash
    class; arrivals are assigned against the same centroids and
    min-joined against the kept set."""
    from universal_importer_duckdb_spark.operators.int_kmeans import (
        SAMPLE_SALT,
        kmeans_ctes,
        sql_md5_28,
        sql_qdim,
    )

    arr_hash = sql_md5_28(f"'{ARRIVAL_SALT}:'||vec_id")
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
all0 AS MATERIALIZED (
  SELECT vec_id AS pid, {arr_hash} % {mod} = 0 AS arriving, {dims}
  FROM embeddings),
pts0 AS MATERIALIZED (SELECT * EXCLUDE (arriving) FROM all0 WHERE NOT arriving),
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
  FROM asn a JOIN pts0 p USING (pid)),
kept AS MATERIALIZED (
  SELECT * FROM ap a
  WHERE NOT EXISTS (
    SELECT 1 FROM ap b
    WHERE b.cid = a.cid
      AND (b.dd > a.dd OR (b.dd = a.dd AND b.pid < a.pid))
      AND {dist_ab} <= {int(eps2)})),
arr AS MATERIALIZED (
  SELECT * EXCLUDE (arriving) FROM all0 WHERE arriving),
arr_asn AS MATERIALIZED (
  SELECT pid, cid, dd FROM (
    SELECT p.pid, c.cid, {dist_pc} AS dd,
           row_number() OVER (PARTITION BY p.pid
                              ORDER BY {dist_pc}, c.cid) AS rn
    FROM arr p JOIN cents c ON TRUE) WHERE rn = 1),
nn AS (
  SELECT a.pid, MIN({dist_ab}) AS nn
  FROM (SELECT s.pid, s.cid, p.* EXCLUDE (pid)
        FROM arr_asn s JOIN arr p USING (pid)) a
  JOIN kept b ON b.cid = a.cid
  GROUP BY a.pid)
SELECT s.pid AS vec_id, CAST(s.cid AS BIGINT) AS cluster,
       CAST(s.dd AS BIGINT) AS d2,
       CAST(COALESCE(n.nn, -1) AS BIGINT) AS nn_d2,
       (n.nn IS NULL OR n.nn > {int(eps2)}) AS admitted
FROM arr_asn s LEFT JOIN nn n USING (pid)
"""
