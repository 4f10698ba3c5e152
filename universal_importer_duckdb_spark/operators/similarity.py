"""Similarity search over embedding columns (array<float>).

- cosine_topk         — exact brute-force top-k vs a query vector (the
                        correctness baseline; O(n·d) scan, no shuffle
                        beyond the final top-k)
- lsh_ann_topk        — random-hyperplane LSH bucket filter + exact
                        re-rank (the 100 TB path: the scan touches only
                        candidate buckets; bucket key is precomputable
                        and partition-prunable when stored)
- embedding_near_pairs — all-pairs cosine near-dup via shared-bucket
                        join (never O(n²))

Hyperplanes are generated from a seeded PRNG on the driver (tiny:
n_planes × dim floats) and broadcast as literal arrays; bucket
signatures are computed with JVM higher-order functions — no UDFs.

Determinism: exact scores route per-element products through
DECIMAL(33,13) (see entry_queries module docstring) so results are
reproducible bit-for-bit across engines and partitionings.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(33,13)"


def _fold_dec(arr):
    return F.aggregate(
        arr, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def dot_product(a, b):
    return _fold_dec(F.zip_with(a, b, lambda x, y: (x * y).cast(_DEC)))


def _dot_double(a, b):
    """Plain double-precision dot product (JVM fold, no Arrow
    round-trip). The FAST path — selection scores, bucket signatures,
    pre-sifts — where cross-engine bit-exactness is not required; the
    DECIMAL ``dot_product`` above is the exact path."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, t: s + t
    )


def _norm2_double(a):
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, t: s + t
    )


def norm2(a):
    return F.sqrt(_fold_dec(F.transform(a, lambda x: (x * x).cast(_DEC))))


def cosine(a, b):
    return dot_product(a, b) / (norm2(a) * norm2(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. Used as the
    re-rank stage after a candidate filter (ANN paths) — it inherits
    the input's partitioning rather than forcing one (a repartition of
    an already-filtered candidate frame costs more than it buys; for
    full-corpus scans prefer cosine_topk_two_phase)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col), cosine(v, q).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_topk_two_phase(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    overfetch: int = 4,
    extra_cols: tuple[str, ...] = (),
    size_hint: int | None = None,
) -> DataFrame:
    """Exact cosine top-k in two phases: a JVM-side double-precision
    fold SELECTS the top ``k*overfetch`` candidates (zip-with product
    + aggregate sum — stays in the executor JVM, no Arrow round-trip
    of the embedding column to a Python worker), then the exact
    DECIMAL(33,13) fold re-ranks only those candidates, so the output
    is bit-identical to the one-phase exact scan while the per-element
    decimal arithmetic touches k*overfetch rows instead of the corpus.
    The selection score drops the constant |q| factor (order-
    equivalent) and is never emitted.

    Soundness assumption (tie density): phase 1 can only err by
    EXCLUDING a true top-k member, which requires more than
    k*(overfetch-1) vectors within double-rounding distance (~1e-13
    relative) of the kth cosine. Real embedding corpora are nowhere
    near that degenerate; if a corpus is (e.g. quantized vectors with
    mass ties), raise ``overfetch`` toward n/k — at overfetch >= n/k
    this degrades gracefully into the one-phase exact scan.

    At 100 TB the double fold is the part you'd push to a SIMD kernel
    or GPU; the exact re-rank cost stays O(k). No forced repartition:
    phase-1 parallelism comes from file splits (a shuffle of every
    vector would dwarf the fold it feeds at any scale).

    ``size_hint`` (a cheap row-count estimate, e.g. from the parquet
    footer — NOT a Spark action) gates the candidate phase: when the
    corpus is at most ``4 * k * overfetch`` rows, phase 1 would keep
    most of it anyway, so the exact DECIMAL fold runs directly on the
    corpus in ONE TakeOrdered — the degraded-to-one-phase form the
    soundness note above describes, minus the wasted selection stage.
    Results are bit-identical either way (phase 2 alone IS the exact
    scan)."""
    if size_hint is not None and size_hint <= 4 * k * overfetch:
        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        v = F.col(vec_col).cast("array<double>")
        return (
            df.select(
                F.col(id_col), *extra_cols, cosine(v, qlit).alias("cosine")
            )
            .orderBy(F.desc("cosine"), id_col)
            .limit(k)
        )
    vd = F.col(vec_col).cast("array<double>")
    qd = F.array(*[F.lit(float(x)) for x in query_vec])
    dscore = _dot_double(vd, qd) / F.greatest(
        F.sqrt(_norm2_double(vd)), F.lit(1e-300)
    )
    cand = (
        df.select(id_col, *extra_cols, vec_col, dscore.alias("__dscore"))
        .orderBy(F.desc("__dscore"), id_col)
        .limit(k * overfetch)
        .drop("__dscore")
    )
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        cand.select(F.col(id_col), *extra_cols, cosine(v, qlit).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def _hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def bucket_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature: bit p set iff dot(v, plane_p) > 0. Plain
    double arithmetic — the signature is a partition/cluster key, not
    a score, so cross-engine exactness is not required."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = v.cast("array<double>")
    bits = []
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot_double(v, pl)
        bits.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    max_probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the exact scan to vectors whose
    bucket signature is within ``max_probe_hamming`` bits of the
    query's (multi-probe LSH). Recall/cost dial: 0 probes scans ~n/2^p
    of the data."""
    dim = len(query_vec)
    from universal_importer_duckdb_spark.operators.dedup_text import spread_for_compute

    df = spread_for_compute(df, id_col)
    planes = _hyperplanes(n_planes, dim, seed)
    sig = bucket_signature(vec_col, planes)

    # query signature computed on the driver (tiny)
    qsig = 0
    for p, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, plane)) > 0:
            qsig |= 1 << p
    bucketed = df.withColumn("bucket", sig)
    cand = bucketed.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def hard_negative_pairs(
    df: DataFrame,
    label_col: str = "label",
    cosine_floor: float = 0.3,
    k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Hard-negative mining for contrastive training: the top-k
    DIFFERENT-label pairs by cosine among LSH-bucket candidates — the
    pairs a contrastive loss learns most from, mined the way
    production does it (approximate candidate generation, exact
    scoring on candidates only; recall is bounded by bucket collision
    probability, which is the accepted trade at corpus scale).

    Same two-tier verify as :func:`embedding_near_pairs` (double
    pre-sift with 1e-9 margin, DECIMAL(33,13) exact re-score), plus a
    deterministic (cosine desc, id_a, id_b) top-k, so the result
    replays bit-for-bit in the seeded-literal SQL oracle."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        bucket_pairs,
        spread_for_compute,
    )

    planes = _hyperplanes(n_planes, dim, seed)
    vd = F.col(vec_col).cast("array<double>")
    # The exact DECIMAL norm fold is computed once per VECTOR here and
    # carried in the payload — not once per pair side, where each
    # vector's fold would be re-run for every candidate pair it
    # appears in (measured: the decimal folds are the dominant cost of
    # this operator). sqrt(exact_fold) per pair side is the identical
    # expression tree cosine() builds, so scores are bit-unchanged.
    b = (
        spread_for_compute(df, id_col)
        .withColumn("bucket", bucket_signature(vec_col, planes))
        .withColumn(
            "__pl",
            F.struct(
                vd.alias("v"),
                _norm2_double(vd).alias("n2"),
                _fold_dec(F.transform(vd, lambda x: (x * x).cast(_DEC))).alias(
                    "n2x"
                ),
                F.col(label_col).alias("lab"),
            ),
        )
    )
    va, vb = F.col("payload_a.v"), F.col("payload_b.v")
    dcos = _dot_double(va, vb) / F.greatest(
        F.sqrt(F.col("payload_a.n2") * F.col("payload_b.n2")), F.lit(1e-300)
    )
    exact_cos = dot_product(va, vb) / (
        F.sqrt(F.col("payload_a.n2x")) * F.sqrt(F.col("payload_b.n2x"))
    )
    return (
        bucket_pairs(
            b, ["bucket"], id_col, max_bucket_size, "__pl",
            unique_buckets=True,
        )
        .filter(F.col("payload_a.lab") != F.col("payload_b.lab"))
        .filter(dcos >= cosine_floor - 1e-9)
        .select(
            "id_a",
            "id_b",
            F.col("payload_a.lab").alias("label_a"),
            F.col("payload_b.lab").alias("label_b"),
            exact_cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= cosine_floor)
        .orderBy(F.desc("cosine"), "id_a", "id_b")
        .limit(k)
    )


def ivf_train_centroids(
    df: DataFrame,
    n_list: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    iters: int = 8,
    seed: int = 42,
):
    """Spherical k-means centroids for IVF, trained driver-side on a
    deterministic hash-ordered sample. The collect is bounded at
    ``sample_size`` rows regardless of corpus size (per-partition
    top-k under the hood), so training stays O(sample·n_list·dim) on
    the driver even at 100 TB; the resulting centroid matrix
    (n_list×dim floats) ships to executors inside the assignment
    UDF's closure. Returns a (n_list, dim) float64 numpy array of
    unit-norm centroids."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("__h"))
        .orderBy("__h")
        .limit(sample_size)
        .collect()
    )
    X = np.asarray([list(r.v) for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_list, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                c = members.sum(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def ivf_assign_udf(centroids):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch instead of n_list interpreted array-fold expressions per row
    — this is the 100 TB write path (assignments are computed once at
    ingest and stored as a partition/cluster column)."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign(batch: pd.Series) -> pd.Series:
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in batch], dtype=np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series((M @ C.T).argmax(axis=1).astype("int32"))

    return assign


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_list: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k (the clustered-index alternative to
    ``lsh_ann_topk``): spherical-k-means lists, probe the ``nprobe``
    lists whose centroids are nearest the query, exact cosine re-rank
    inside them. Expected scan fraction ≈ nprobe/n_list; recall rises
    with nprobe (nprobe = n_list degenerates to the exact scan). In a
    stored table the list id is a partition column, so probing is
    partition pruning — the non-probed ~(1-nprobe/n_list) of the
    corpus is never read."""
    C = ivf_train_centroids(df, n_list, vec_col, id_col, sample_size, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probe = [int(j) for j in (C @ q).argsort()[::-1][:nprobe]]
    assign = ivf_assign_udf(C)
    from universal_importer_duckdb_spark.operators.dedup_text import spread_for_compute

    cand = (
        spread_for_compute(df, id_col)
        .withColumn("__list", assign(F.col(vec_col)))
        .filter(F.col("__list").isin(probe))
    )
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def embedding_near_pairs(
    df: DataFrame,
    cosine_threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    seed: int = 42,
    dim: int = 64,
    max_bucket_size: int = 500,
) -> DataFrame:
    """Near-duplicate embedding pairs: bucket on the full signature,
    join within buckets, verify exact cosine. Recall is bounded by the
    probability that near vectors share all sign bits — raise recall
    by lowering n_planes or running multiple seeded repetitions.

    Verification is two-tier, mirroring the MinHash σ pre-sift: a
    cheap double-precision cosine (per-vector squared norms are
    computed ONCE before pairing and ride in the pair payload, so the
    pre-sift per pair is one dot product and one division) discards
    every candidate below ``threshold - 1e-9``, and only survivors pay
    the exact DECIMAL(33,13) fold. The margin dominates the double
    fold's rounding error (64 unit-scale terms err < 1e-12 relative),
    so the surviving set — and the emitted exact cosine — is
    bit-identical to verifying every candidate, which is what the
    SQL oracle computes. On random-embedding corpora nearly all
    bucket-mates fall far below threshold, so the decimal work drops
    from O(candidates) to O(true near-pairs)."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        bucket_pairs,
        spread_for_compute,
    )

    planes = _hyperplanes(n_planes, dim, seed)
    vd = F.col(vec_col).cast("array<double>")
    b = (
        spread_for_compute(df, id_col)
        .withColumn("bucket", bucket_signature(vec_col, planes))
        .withColumn(
            "__pl", F.struct(vd.alias("v"), _norm2_double(vd).alias("n2"))
        )
    )
    va, vb = F.col("payload_a.v"), F.col("payload_b.v")
    dcos = _dot_double(va, vb) / F.greatest(
        F.sqrt(F.col("payload_a.n2") * F.col("payload_b.n2")), F.lit(1e-300)
    )
    return (
        bucket_pairs(
            b, ["bucket"], id_col, max_bucket_size, "__pl",
            unique_buckets=True,
        )
        .filter(dcos >= cosine_threshold - 1e-9)
        .select("id_a", "id_b", cosine(va, vb).alias("cosine"))
        .filter(F.col("cosine") >= cosine_threshold)
    )
