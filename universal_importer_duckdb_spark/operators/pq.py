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

Training mirrors the IVF discipline: k-means runs on a BOUNDED,
deterministic sample collected once (cap + seeded selection — driver
traffic is O(cap*d) regardless of corpus size); encoding is an
Arrow-batched argmin against the broadcast codebook. Like IVF, the
trained artifact is float-iterative and therefore NOT SQL-replayable:
the registry entry is rows-only, with the quality claims pinned by
tests (reconstruction error budget, ADC top-k recall vs the exact
kNN join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Tiny deterministic Lloyd's: seeded init from sample rows, fixed
    iteration count, empty clusters re-seeded deterministically."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(cent) < k:  # degenerate tiny input: pad by repetition
        cent = np.vstack([cent] * ((k // len(cent)) + 1))[:k]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
            else:
                cent[j] = x[rng.randint(len(x))]
    return cent


def train_pq_codebook(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_cap: int = 2048,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, k, d/m) codebook from a bounded deterministic sample.

    The sample is the first ``sample_cap`` vectors by ``id_col`` —
    ordered BEFORE the limit, because Spark LIMIT without ORDER BY is
    partition-layout-dependent (r6 advice): an unordered limit would
    make the trained codebook (and every downstream code/ADC result)
    reproducible only for one fixed file layout. A top-k-by-id sort of
    cap rows is cheap at any scale (takeOrdered semantics: each
    partition keeps at most cap rows)."""
    sample = [
        r[0]
        for r in df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(sample_cap))
        .select(vec_col)
        .collect()
    ]
    x = np.array(sample, dtype=np.float64)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack(
        [
            _kmeans(x[:, j * sub : (j + 1) * sub], k, iters, seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector: per-subspace argmin code + exact
    reconstruction error. One Arrow-batched pass, codebook broadcast."""
    m, k, sub = codebook.shape
    b_cb = df.sparkSession.sparkContext.broadcast(codebook)

    def _enc(batches):
        cb = b_cb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            recon = np.empty_like(x)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = ((xs[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                cj = d2.argmin(axis=1)
                codes[:, j] = cj
                recon[:, j * sub : (j + 1) * sub] = cb[j][cj]
            err = np.sqrt(((x - recon) ** 2).sum(axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "codes": list(codes.tolist()),
                    "recon_err": err,
                }
            )

    return df.mapInPandas(
        _enc, schema="vec_id bigint, codes array<int>, recon_err double"
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebook: np.ndarray,
    query_vec: list[float],
    topk: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k: the query builds an (m, k) lookup
    table of subspace distances ONCE; each stored vector's distance is
    m table lookups summed — no float vectors are read. This is the
    serving path: at corpus scale the encoded table is 32x smaller
    than the floats and the scan is table-lookup bound."""
    m, k, sub = codebook.shape
    q = np.array(query_vec, dtype=np.float64)
    lut = np.stack(
        [
            ((q[j * sub : (j + 1) * sub][None, :] - codebook[j]) ** 2).sum(
                axis=1
            )
            for j in range(m)
        ]
    )  # (m, k)
    # flatten the LUT into a literal array; distance is a JVM-side
    # fold over the codes — no Python in the scan
    flat = [float(v) for v in lut.reshape(-1)]
    lut_col = F.array(*[F.lit(v) for v in flat])
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.element_at(lut_col, (j * k + code) + 1),
        ),
        F.lit(0.0),
        lambda s, t: s + t,
    )
    return (
        encoded.select("vec_id", dist.alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(topk)
    )
