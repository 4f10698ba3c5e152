"""Deterministic scaled-integer Lloyd's k-means — the cross-engine
training contract behind PQ codebooks and IVF centroid lists.

Float k-means is iterative and reduction-order-sensitive, which is why
the PQ/IVF registry entries spent rounds 1-7 on the rows-only driver
gate: a float codebook cannot be replayed bit-for-bit in SQL. This
module retires that class the same way textrank.py retired float
PageRank — run the EXACT algorithm in integers:

1. **Quantize** every coordinate once: ``floor(double(x) * 10^6) +
   2^21``. float32 widens to double exactly, the multiply and floor
   are single IEEE ops identical in numpy, Spark, and DuckDB, and the
   offset makes every value a positive BIGINT so the centroid-update
   floor division below is the same operation in every engine
   (``//`` on negatives floors in some engines and truncates in
   others — positivity sidesteps the difference). 10^-6 resolution is
   far below the noise floor of real embeddings, so clustering
   quality is indistinguishable from float training.
2. **Sample + init deterministically**: the training sample is the
   first ``cap`` vectors ordered by the portable md5-28 hash of a
   salted id (no engine RNG), and the initial centroids are the first
   ``k`` sample points under a second salted hash order — effectively
   random, identically replayable.
3. **Iterate in BIGINT**: assignment is argmin of the integer squared
   L2 distance with ties broken by the smaller centroid id; the
   update is the per-dimension floor-divided mean ``sum // count``;
   an empty cluster keeps its previous centroid. Every step is exact
   integer arithmetic — no accumulation order, no rounding mode.

Overflow bounds (all BIGINT-safe by construction): quantized values
are < 2^22, so a squared per-dim difference is < 2^44 and a 64-dim
distance < 2^50; a cluster-sum over the <= 2^11-row sample is < 2^33.
``quantize_np`` hard-fails if |x| >= 2 (QOFFSET/QSCALE), the only way
to breach the positivity contract.

Scale shape: training stays a bounded driver-side computation — the
collect is capped at ``cap`` rows no matter the corpus size (same
discipline as the float version it replaces), and the trained integer
centroid matrix ships to executors in an Arrow-batched UDF closure.
The SQL builders in this module emit the identical algorithm as
unrolled DuckDB CTEs so the driver can verify codes/lists/centroids
hash-exactly.

Reference anchor: none (main.py has no vector indexing) — 100 TB
training-data north-star scope (Jegou et al., TPAMI 2011 for PQ;
Lloyd 1982).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.corpus import _md5_28

QSCALE = 10**6
QOFFSET = 1 << 21  # positive for |x| < ~2.097; embeddings are |x| < 1

SAMPLE_SALT = "km-sample"
INIT_SALT = "km-init"


def md5_28_int(s: str) -> int:
    """Python twin of the portable md5-28 hash (first 7 hex digits as
    an int) — must stay bit-identical to corpus._md5_28 / the DuckDB
    ``('0x'||substr(md5(s),1,7))::BIGINT`` idiom."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)


def quantize_np(x: np.ndarray) -> np.ndarray:
    """floor(x * QSCALE) + QOFFSET on float64 input — the one lossy
    step, identical in every engine."""
    x = np.asarray(x, dtype=np.float64)
    q = np.floor(x * float(QSCALE)).astype(np.int64) + QOFFSET
    # symmetric bound (r8 review): the overflow analysis assumes
    # q < 2^22 on BOTH sides — a large positive coordinate would
    # silently wrap int64 GEMM dots in numpy while DuckDB errors,
    # diverging the engines; fail loudly instead
    if q.size and ((q <= 0).any() or (q >= (QOFFSET << 1)).any()):
        raise ValueError(
            f"int_kmeans.quantize_np: coordinate magnitude >= "
            f"{QOFFSET / QSCALE} breaks the (0, 2^22) BIGINT-safe "
            f"contract; raise QOFFSET (and the oracle SQL constant) "
            f"together"
        )
    return q


def collect_hash_ordered_sample(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int = 2048,
) -> tuple[list[int], np.ndarray]:
    """Bounded deterministic training sample: the first ``cap`` rows
    by (md5_28(SAMPLE_SALT:id), id). Per-partition top-k under the
    hood, so driver traffic is O(cap * dim) at any corpus size; the
    hash order makes the sample layout-independent AND replayable by
    the oracle's ORDER BY ... LIMIT."""
    h = _md5_28(
        F.concat(F.lit(SAMPLE_SALT + ":"), F.col(id_col).cast("string"))
    )
    rows = (
        df.select(F.col(id_col).alias("kid"), F.col(vec_col).alias("kv"))
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(int(cap))
        .collect()
    )
    ids = [int(r.kid) for r in rows]
    x = np.asarray([list(r.kv) for r in rows], dtype=np.float64)
    return ids, x


def init_indices(ids: list[int], k: int) -> list[int]:
    """Positions of the first ``k`` sample points under the salted
    init-hash order — the deterministic stand-in for random init."""
    order = sorted(
        range(len(ids)),
        key=lambda i: (md5_28_int(f"{INIT_SALT}:{ids[i]}"), ids[i]),
    )
    return order[: min(k, len(ids))]


# float64 BLAS is EXACT for GEMMs over quantized coordinates: every
# operand is an integer in (0, 2^22) (the quantize_np contract;
# centroids are floor-means of such points, so they inherit it), so
# each pairwise product is an integer < 2^44 and any non-negative
# partial sum over <= 512 dimensions is an integer < 2^53 — and every
# IEEE-754 double operation whose operands AND result are exactly
# representable integers is exact, independent of accumulation order,
# blocking, or FMA. numpy has no BLAS integer kernel (int64 matmul is
# a scalar C gufunc loop); routing the same math through dgemm
# measured ~4x faster at prune-kernel cluster sizes (7000x7000x64)
# under load and more when BLAS threads are free. Beyond the provable
# dimension bound the helper falls back to the int64 loop — exactness
# is never traded for speed.
_F64_EXACT_MAX_DIM = 512  # d * (2^22)^2 <= 2^53


def int_gemm_exact(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``a @ b.T`` (int64 result) for quantized-coordinate matrices —
    bit-exact float64 BLAS within the provable dimension bound (see
    the proof note above), the int64 matmul loop beyond it."""
    if a.shape[1] <= _F64_EXACT_MAX_DIM:
        return (
            a.astype(np.float64) @ b.astype(np.float64).T
        ).astype(np.int64)
    return a @ b.T


def int_lloyds(
    xq: np.ndarray, k: int, iters: int, init_idx: list[int]
) -> np.ndarray:
    """Exact integer Lloyd's on pre-quantized points ``xq`` (int64,
    (n, d)). Returns (k', d) int64 centroids, k' = min(k, n).
    Assignment ties go to the smaller centroid id (np.argmin's
    first-minimum == the SQL ``ORDER BY dist, cid LIMIT 1``); empty
    clusters keep their previous centroid."""
    cent = xq[np.asarray(init_idx, dtype=np.int64)].copy()
    for _ in range(iters):
        d = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(
            axis=2, dtype=np.int64
        )
        assign = d.argmin(axis=1)
        for j in range(len(cent)):
            members = xq[assign == j]
            if len(members):
                cent[j] = members.sum(axis=0, dtype=np.int64) // len(members)
    return cent


def int_argmin_dists(xq: np.ndarray, cent: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignment, squared-distance-to-assigned) for a quantized
    batch against integer centroids — the Arrow-batched encode/assign
    kernel shared by PQ, IVF, and kmeans_clusters. Processes the
    batch in row chunks so the (rows, k, d) broadcast intermediate
    stays ~16 MB regardless of Arrow batch size (a 10k-row batch at
    k=16, d=64 would otherwise materialize ~80 MB of int64 diffs per
    executor thread).

    r15: distances via the norm expansion ``|x|^2 + |c|^2 - 2x.c``
    with the dot through :func:`int_gemm_exact` (bit-exact float64
    BLAS under the quantize_np range contract) instead of the
    (rows, k, d) int64 broadcast-subtract — same exact integers, same
    first-minimum argmin, and the chunk intermediate shrinks from
    (rows, k, d) to (rows, k).

    r16 (advice): the chunk bound divides by max(k, d), not k alone —
    int_gemm_exact materializes a float64 copy of the (chunk, d)
    operand, so when d > k that copy, not the (chunk, k) distance
    matrix, is the largest per-chunk intermediate. Both now stay
    ~16 MB per executor thread."""
    k, d = cent.shape
    nc = np.einsum("ij,ij->i", cent, cent)
    chunk = max(1, 2_000_000 // max(1, k, d))
    a = np.empty(len(xq), dtype=np.int64)
    dd = np.empty(len(xq), dtype=np.int64)
    for lo in range(0, len(xq), chunk):
        part = xq[lo : lo + chunk]
        npart = np.einsum("ij,ij->i", part, part)
        dist = npart[:, None] + nc[None, :] - 2 * int_gemm_exact(part, cent)
        ai = dist.argmin(axis=1)
        a[lo : lo + chunk] = ai
        dd[lo : lo + chunk] = dist[np.arange(len(part)), ai]
    return a, dd


# ======================================================================
# DuckDB oracle builders: the identical algorithm as unrolled CTEs
# ======================================================================

def sql_qdim(src_expr: str, idx1) -> str:
    """Quantize one 1-based array element (literal or expression
    index) — the SQL twin of quantize_np."""
    return (
        f"CAST(FLOOR(CAST({src_expr}[{idx1}] AS DOUBLE) * {QSCALE}.0)"
        f" AS BIGINT) + {QOFFSET}"
    )


def sql_md5_28(expr: str) -> str:
    return f"('0x'||substr(md5({expr}),1,7))::BIGINT"


def _dist(a: str, b: str, dims: int) -> str:
    terms = " + ".join(
        f"({a}.d{i}-{b}.d{i})*({a}.d{i}-{b}.d{i})" for i in range(1, dims + 1)
    )
    return f"({terms})"


def kmeans_ctes(
    pts_cte: str,
    dims: int,
    k: int,
    iters: int,
    out_cte: str,
    part: str | None = None,
) -> str:
    """CTE chain running int_lloyds over ``pts_cte`` (columns: pid,
    d1..d{dims}[, {part}]) into ``out_cte`` (cid, d1..d{dims}[,
    {part}]). ``part`` partitions independent k-means runs (PQ
    subspaces) — init, assignment, and updates all nest inside it."""
    if iters < 1:
        # only the final loop iteration names a CTE ``out_cte``;
        # iters=0 would emit SQL referencing an undefined relation
        # (r8 review) — fail at build time with the real reason
        raise ValueError("kmeans_ctes: iters must be >= 1")
    pcols = [part] if part else []
    psel = "".join(f"{c}, " for c in pcols)
    pby = ", ".join(["p.pid", *[f"p.{c}" for c in pcols]])
    dsel = ", ".join(f"d{i}" for i in range(1, dims + 1))

    def on(a: str, b: str) -> str:
        return " AND ".join(f"{a}.{c} = {b}.{c}" for c in pcols) or "TRUE"

    init_hash = sql_md5_28(f"'{INIT_SALT}:'||pid")
    # Every CTE is MATERIALIZED: DuckDB inlines multiply-referenced
    # CTEs by default, and the c{t} chain references c{t-1} twice
    # (assignment + empty-cluster fallback), so a lazy chain expands
    # ~3^iters copies of the full expression tree — observed as a
    # planner OOM at dims=64. Materialization makes the chain linear,
    # exactly like the Spark side's per-iteration localCheckpoint in
    # textrank.
    ctes = [
        # deterministic init: first k points per partition by init-hash
        f"{out_cte}_c0 AS MATERIALIZED (SELECT {psel}rn - 1 AS cid, {dsel}"
        f" FROM (SELECT *, row_number() OVER ("
        f"{('PARTITION BY ' + ', '.join(pcols) + ' ') if pcols else ''}"
        f"ORDER BY {init_hash}, pid) AS rn "
        f"FROM {pts_cte}) WHERE rn <= {k})"
    ]
    for t in range(1, iters + 1):
        prev, a, m, cur = (
            f"{out_cte}_c{t - 1}",
            f"{out_cte}_a{t}",
            f"{out_cte}_m{t}",
            f"{out_cte}_c{t}" if t < iters else out_cte,
        )
        ctes.append(
            f"{a} AS MATERIALIZED (SELECT {psel}pid, cid FROM ("
            f"SELECT p.pid, {''.join(f'p.{c}, ' for c in pcols)}c.cid, "
            f"row_number() OVER (PARTITION BY {pby} "
            f"ORDER BY {_dist('p', 'c', dims)}, c.cid) AS rn "
            f"FROM {pts_cte} p JOIN {prev} c ON {on('p', 'c')}) "
            f"WHERE rn = 1)"
        )
        means = ", ".join(
            f"CAST(SUM(p.d{i}) // COUNT(*) AS BIGINT) AS d{i}"
            for i in range(1, dims + 1)
        )
        ctes.append(
            f"{m} AS MATERIALIZED (SELECT {''.join(f'a.{c}, ' for c in pcols)}"
            f"a.cid, {means} FROM {a} a JOIN {pts_cte} p "
            f"ON p.pid = a.pid{''.join(f' AND p.{c} = a.{c}' for c in pcols)} "
            f"GROUP BY {''.join(f'a.{c}, ' for c in pcols)}a.cid)"
        )
        coal = ", ".join(
            f"COALESCE(m.d{i}, c.d{i}) AS d{i}" for i in range(1, dims + 1)
        )
        ctes.append(
            f"{cur} AS MATERIALIZED (SELECT "
            f"{''.join(f'c.{c}, ' for c in pcols)}c.cid, "
            f"{coal} FROM {prev} c LEFT JOIN {m} m "
            f"ON m.cid = c.cid{''.join(f' AND m.{c} = c.{c}' for c in pcols)})"
        )
    return ",\n".join(ctes)


def quantize_unit_np(x: np.ndarray) -> np.ndarray:
    """Spherical quantization: project to the unit sphere in float64,
    THEN quantize — the geometry cosine-serving IVF needs (directional
    neighbors co-locate in lists; raw-L2 lists on non-normalized data
    cluster by norm shell and halve recall, the r8 review finding).

    Cross-engine exactness: the squared-norm accumulates as an
    explicit LEFT FOLD over dimensions (numpy's own axis-sum is
    pairwise above 8 elements and would diverge), matching Spark's
    F.aggregate(0.0, +) and DuckDB's list_reduce association
    (0.0 + x1 == x1 exactly); sqrt and the division are single
    correctly-rounded IEEE doubles in every engine. Zero vectors pin
    to norm 1e-300 (the similarity.py guard), quantizing to QOFFSET
    in all engines."""
    x = np.asarray(x, dtype=np.float64)
    acc = np.zeros(x.shape[:-1], dtype=np.float64)
    for j in range(x.shape[-1]):
        acc = acc + x[..., j] * x[..., j]
    n = np.maximum(np.sqrt(acc), 1e-300)
    return quantize_np(x / n[..., None])


def sql_qdim_unit(src_expr: str, idx1) -> str:
    """SQL twin of quantize_unit_np for one 1-based element: the norm
    is the same order-defined list_reduce fold (bit-identical to the
    numpy left fold), then the identical divide/scale/floor chain."""
    n2 = (
        f"list_reduce(list_apply({src_expr}::DOUBLE[], x -> x * x), "
        f"(a, b) -> a + b)"
    )
    return (
        f"CAST(FLOOR(CAST({src_expr}[{idx1}] AS DOUBLE)"
        f" / GREATEST(sqrt({n2}), 1e-300) * {QSCALE}.0)"
        f" AS BIGINT) + {QOFFSET}"
    )
