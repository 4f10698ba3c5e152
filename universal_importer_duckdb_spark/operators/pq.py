"""Product quantization (PQ) for embedding storage and ADC search.

The 100 TB vector-serving layout: split each d-dim vector into ``m``
subspaces, k-means each subspace into ``k`` centroids (codebook), and
store each vector as m small codes (m bytes at k<=256) — 32x smaller
than float32 at d=64/m=8. Query-time asymmetric distance computation
(ADC) sums per-subspace query-to-centroid distances from a lookup
table, never touching the original floats. Companion to
``similarity.py``'s exact/LSH/IVF paths and the int8 quantizer
(Jegou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public method).

Training runs the deterministic scaled-integer Lloyd's from
``int_kmeans.py`` on a bounded hash-ordered sample (driver traffic
O(cap*d) at any corpus size), so — unlike the float k-means it
replaced in r8 — the whole artifact chain (codebook -> codes -> ADC
ranking) is EXACT integer arithmetic, replayable bit-for-bit in
DuckDB SQL by the builders at the bottom of this module. The former
rows-only driver exemption is retired: codes and ADC top-k are
hash-checked like every other entry. Distances are squared L2 in the
quantized integer space (resolution 10^-6 per coordinate), which
preserves the float ranking on any realistically-separated corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.int_kmeans import (
    SAMPLE_SALT,
    collect_hash_ordered_sample,
    init_indices,
    int_argmin_dists,
    int_lloyds,
    kmeans_ctes,
    quantize_np,
    sql_md5_28,
    sql_qdim,
)


def train_pq_codebook(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_cap: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, k, d/m) int64 codebook from a bounded deterministic sample
    (hash-ordered before the limit, so the artifact is layout- and
    engine-independent). Each subspace runs its own integer Lloyd's
    from the shared init point set."""
    ids, x = collect_hash_ordered_sample(df, id_col, vec_col, sample_cap)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    xq = quantize_np(x)
    init = init_indices(ids, k)
    return np.stack(
        [
            int_lloyds(xq[:, j * sub : (j + 1) * sub], k, iters, init)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector: per-subspace integer argmin code (ties to
    the smaller code) + exact integer squared reconstruction distance.
    One Arrow-batched pass, codebook broadcast."""
    m, k, sub = codebook.shape
    b_cb = df.sparkSession.sparkContext.broadcast(codebook)

    def _enc(batches):
        cb = b_cb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xq = quantize_np(np.array(list(pdf[vec_col]), dtype=np.float64))
            codes = np.empty((len(xq), m), dtype=np.int32)
            d2 = np.zeros(len(xq), dtype=np.int64)
            for j in range(m):
                a, dd = int_argmin_dists(
                    xq[:, j * sub : (j + 1) * sub], cb[j]
                )
                codes[:, j] = a
                d2 += dd
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "codes": list(codes.tolist()),
                    "recon_d2": d2,
                }
            )

    # project before the Arrow map (mapInPandas pins its input
    # columns — don't ship label/metadata through Arrow)
    return df.select(id_col, vec_col).mapInPandas(
        _enc, schema="vec_id bigint, codes array<int>, recon_d2 bigint"
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook: np.ndarray,
    query_vec: list[float],
    topk: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: the query builds an (m, k) integer
    lookup table of subspace distances ONCE; each stored vector's
    distance is m table lookups summed — no float vectors are read.
    This is the serving path: at corpus scale the encoded table is
    32x smaller than the floats and the scan is table-lookup bound.
    All-BIGINT fold, so the ranking is engine-exact."""
    m, k, sub = codebook.shape
    qq = quantize_np(np.array(query_vec, dtype=np.float64))
    lut = np.stack(
        [
            ((qq[j * sub : (j + 1) * sub][None, :] - codebook[j]) ** 2).sum(
                axis=1, dtype=np.int64
            )
            for j in range(m)
        ]
    )  # (m, k) int64
    # flatten the LUT into a literal array; distance is a JVM-side
    # BIGINT fold over the codes — no Python in the scan
    lut_col = F.array(*[F.lit(int(v)) for v in lut.reshape(-1)])
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.element_at(lut_col, (j * k + code) + 1),
        ),
        F.lit(0).cast("bigint"),
        lambda s, t: s + t,
    )
    return (
        encoded.select("vec_id", dist.alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(topk)
    )


# ======================================================================
# DuckDB oracle builders: the identical integer pipeline, unrolled
# ======================================================================

def _pq_base_ctes(
    m: int, k: int, sub: int, sample_cap: int, iters: int
) -> str:
    """Shared CTE chain: quantized per-subspace points (full table +
    hash-ordered sample), integer k-means codebook ``cb``, and the
    full-table encoding ``enc(j, pid, cid, dd)``."""
    samp_hash = sql_md5_28(f"'{SAMPLE_SALT}:'||vec_id")
    dims = ", ".join(
        f"{sql_qdim('e.embedding', f's.j*{sub}+{i}')} AS d{i}"
        for i in range(1, sub + 1)
    )
    dist = " + ".join(
        f"(p.d{i}-c.d{i})*(p.d{i}-c.d{i})" for i in range(1, sub + 1)
    )
    return f"""
subs AS MATERIALIZED (SELECT unnest(range(0, {m})) AS j),
allp AS MATERIALIZED (SELECT s.j, e.vec_id AS pid, {dims} FROM embeddings e, subs s),
sampids AS MATERIALIZED (SELECT vec_id AS pid FROM embeddings
            ORDER BY {samp_hash}, vec_id LIMIT {sample_cap}),
pts AS MATERIALIZED (SELECT a.* FROM allp a JOIN sampids USING (pid)),
{kmeans_ctes('pts', sub, k, iters, 'cb', part='j')},
enc AS MATERIALIZED (
  SELECT j, pid, cid, dd FROM (
    SELECT p.j, p.pid, c.cid, {dist} AS dd,
           row_number() OVER (PARTITION BY p.j, p.pid
                              ORDER BY {dist}, c.cid) AS rn
    FROM allp p JOIN cb c ON c.j = p.j) WHERE rn = 1)"""


def pq_codes_sql(
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    sample_cap: int = 2048,
    iters: int = 5,
) -> str:
    """Oracle for the encode path: codes joined '-' (driver-hashable
    scalar; the r7 red was the raw array<int>) + integer squared
    reconstruction distance."""
    sub = dim // m
    return f"""
WITH {_pq_base_ctes(m, k, sub, sample_cap, iters)}
SELECT pid AS vec_id,
       string_agg(CAST(cid AS VARCHAR), '-' ORDER BY j) AS codes,
       CAST(SUM(dd) AS BIGINT) AS recon_d2
FROM enc GROUP BY pid
"""


def pq_adc_sql(
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    sample_cap: int = 2048,
    iters: int = 5,
    topk: int = 10,
    sql_dot: str = "",
    sql_n2: str = "",
) -> str:
    """Oracle for the serving path: integer ADC top-k with the
    in-plan exact-L2 audit column. ``sql_dot``/``sql_n2`` are the
    registry's order-defined double-fold templates (list_reduce) so
    the audit side replays Spark's exact fold bit-for-bit."""
    sub = dim // m
    qdims = ", ".join(
        f"{sql_qdim('e.embedding', f's.j*{sub}+{i}')} AS d{i}"
        for i in range(1, sub + 1)
    )
    qdist = " + ".join(
        f"(c.d{i}-q.d{i})*(c.d{i}-q.d{i})" for i in range(1, sub + 1)
    )
    dot = sql_dot.format(a="embedding::DOUBLE[]", b="qv")
    n2v = sql_n2.format(a="embedding::DOUBLE[]")
    n2q = sql_n2.format(a="qv")
    return f"""
WITH {_pq_base_ctes(m, k, sub, sample_cap, iters)},
qp AS (SELECT s.j, {qdims}
       FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) e, subs s),
lut AS (SELECT c.j, c.cid, {qdist} AS qd
        FROM cb c JOIN qp q ON q.j = c.j),
adc AS (SELECT e.pid AS vec_id, CAST(SUM(l.qd) AS BIGINT) AS adc_d2
        FROM enc e JOIN lut l ON l.j = e.j AND l.cid = e.cid
        GROUP BY e.pid
        ORDER BY adc_d2, vec_id LIMIT {topk}),
qv_t AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
exact AS (
  SELECT vec_id FROM (
    SELECT vec_id, {n2v} - 2 * {dot} + {n2q} AS l2
    FROM embeddings, qv_t)
  ORDER BY l2, vec_id LIMIT {topk})
SELECT a.vec_id, a.adc_d2, (x.vec_id IS NOT NULL) AS in_exact_topk
FROM adc a LEFT JOIN exact x ON x.vec_id = a.vec_id
ORDER BY a.adc_d2, a.vec_id
"""
