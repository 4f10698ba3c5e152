"""Near-duplicate text detection at scale — the generalization of the
reference's exact composite-key dedup (SURVEY.md §2.3) to fuzzy
content identity, built entirely from JVM-side column expressions
(no Python UDFs in any hot path).

Operators:
- exact_dedup        — content-hash groupBy (one shuffle, map-side combine)
- minhash_signatures — k-perm MinHash over character shingles
- minhash_lsh_pairs  — banded LSH candidate generation + exact-Jaccard
                       verification (the classic MMDS ch.3 pipeline)
- simhash_64         — 64-bit SimHash fingerprints
- simhash_near_pairs — banded SimHash bucketing + Hamming verification
- embedding_near_pairs — cosine near-dup via random-hyperplane buckets

Scale design: every pairing step goes through a bucket-join (shuffle on
the band/bucket hash) so candidate generation is O(collisions), never
O(n²); verification runs only on candidates. Skewed buckets (a shingle
shared by everything) are the classic failure mode — AQE skew-join
handles moderate skew, and `max_bucket_size` hard-caps degenerate
buckets the way production LSH pipelines drop stop-shingles.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.caching import scoped_cache


def estimated_splits(df: DataFrame) -> int:
    """Estimated number of scan splits for a file-backed frame,
    mirroring Spark's own FilePartition sizing: ``maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/cores))``
    then ``max(file count, ceil(totalBytes / maxSplitBytes))``
    (bounded driver work: at most 64 files are stat'ed, the rest
    extrapolated). This is the byte-aware proxy the r13 decomposition
    demanded — file COUNT alone said a single 10 GB parquet file was
    "one partition" and triggered a full raw-row shuffle that Spark's
    own byte-ranged splitting makes pointless (at 100 TB every file
    splits into maxPartitionBytes tasks with no exchange at all).
    Returns 0 for non-file-backed frames."""
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    spark = df.sparkSession

    def _bytes_conf(key: str, default: int) -> int:
        try:
            v = spark.conf.get(key)
            return int(v.rstrip("b")) if v.endswith("b") else int(v)
        except Exception:
            return default

    mpb = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 << 20)
    cores = spark.sparkContext.defaultParallelism
    total = 0
    try:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        # stride the sample across the PATH-SORTED listing — a head
        # slice is not size-representative (date-partitioned layouts
        # put same-vintage, same-size files together), and a sample
        # skewed large overestimates splits and skips a spread that
        # would have helped (r13 advice). Ceiling division: floor
        # gave stride=1 for 65-127 files, degenerating back into the
        # head slice the comment promises to avoid (r14 advice).
        stride = -(-len(files) // 64)
        sample = files[::stride][:64]
        for f in sample:
            p = jvm.org.apache.hadoop.fs.Path(f)
            fs = p.getFileSystem(hconf)
            total += fs.getFileStatus(p).getLen()
        if len(files) > len(sample):
            total = total * len(files) // len(sample)
    except Exception:
        return len(files)
    # Spark's FilePartition sizing pads every file by openCostInBytes
    # before computing bytesPerCore — mirror it or maxSplitBytes comes
    # out too small on many-small-file inputs (r13 advice)
    padded = total + open_cost * len(files)
    max_split = min(mpb, max(open_cost, padded // max(cores, 1) + 1))
    byte_splits = max(len(files), -(-total // max_split))
    # Parquet can't split finer than its row groups: a byte-split
    # whose range contains no row-group midpoint reads nothing, so a
    # single-row-group file is ONE effective split no matter how many
    # byte ranges Spark carves (the sf0.1 test tables are exactly
    # this shape). Footer reads are driver-local and cheap for
    # file:// paths; for remote filesystems fall back to the byte
    # estimate (production writers emit ~128 MB row groups, where
    # byte and row-group granularity coincide).
    local = [
        f[len("file:"):] if f.startswith("file:") else f
        for f in sample
        if f.startswith(("file:", "/"))
    ]
    if len(local) == len(sample):
        try:
            import pyarrow.parquet as pq

            rgs = sum(pq.ParquetFile(f).num_row_groups for f in local)
            if len(files) > len(local):
                rgs = rgs * len(files) // len(local)
            return max(len(files), min(byte_splits, rgs))
        except Exception:
            pass
    return byte_splits


def spread_for_compute(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input arrives in fewer partitions. Small parquet files (one 128 MB
    split) otherwise pin the whole CPU-bound shingle/hash pipeline to
    a single core; the shuffle of the raw rows is trivial next to the
    per-row compute. A wide input (>= target partitions) is left
    untouched.

    Split estimation is BYTE-AWARE since r13 (estimated_splits): the
    old file-count proxy would shuffle a large single parquet file
    that Spark's byte-ranged scan splitting already parallelizes —
    at 100 TB that was a full-corpus exchange for nothing. The
    estimate can only SKIP spreads the old rule performed, never add
    one."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if estimated_splits(df) >= target:
        return df
    return df.repartition(target, *[F.col(c) for c in cols]) if cols else df.repartition(target)


def bucket_pairs(
    df: DataFrame,
    bucket_cols,
    id_col: str,
    max_bucket_size: int,
    payload_col: str | None = None,
    unique_buckets: bool = False,
) -> DataFrame:
    """Distinct candidate pairs ``(id_a < id_b)`` of rows sharing a
    bucket: ONE groupBy shuffle + in-bucket combination expansion,
    instead of window-count + self-join + distinct (three shuffles of
    the full bucketed table). Degenerate buckets above
    ``max_bucket_size`` are dropped the way production LSH pipelines
    drop stop-shingles. With ``payload_col`` each side's payload rides
    along as ``payload_a`` / ``payload_b`` so the verify step needs no
    join back.

    ``unique_buckets=True`` declares each id appears in at most ONE
    bucket (e.g. a single LSH signature per row, not banded minhash),
    so no pair can be generated twice and the de-duplicating
    ``distinct()`` — a full shuffle of the pair payloads — is skipped."""
    fields = [F.col(id_col).alias("id")]
    if payload_col:
        fields.append(F.col(payload_col).alias("payload"))
    buckets = (
        df.groupBy(*bucket_cols)
        .agg(F.collect_list(F.struct(*fields)).alias("items"))
        .filter((F.size("items") >= 2) & (F.size("items") <= max_bucket_size))
    )
    pair_expr = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size("items")),
                lambda y: F.struct(
                    F.when(x["id"] < y["id"], x).otherwise(y).alias("a"),
                    F.when(x["id"] < y["id"], y).otherwise(x).alias("b"),
                ),
            ),
        )
    )
    cols = [F.col("p.a.id").alias("id_a"), F.col("p.b.id").alias("id_b")]
    if payload_col:
        cols += [
            F.col("p.a.payload").alias("payload_a"),
            F.col("p.b.payload").alias("payload_b"),
        ]
    out = buckets.select(F.explode(pair_expr).alias("p")).select(*cols)
    return out if unique_buckets else out.distinct()


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest-id row per identical content. Aggregation form:
    partial (map-side) min/count shrink the shuffle to one row per
    distinct fingerprint."""
    content = F.lower(F.col(text_col)) if normalize else F.col(text_col)
    return (
        df.withColumn("fingerprint", F.md5(content))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("kept_" + id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Production ingest dedup: admit only NEW-batch documents whose
    content fingerprint is (a) first within the batch and (b) absent
    from the existing-corpus index. This is the daily-ingest shape — a
    100 TB corpus is deduplicated ONCE, after which every arriving
    batch checks against the stored fingerprint index instead of
    re-scanning history.

    ``index_df`` needs only the fingerprint-bearing columns (here it
    is derived from text for self-containment; production stores the
    fingerprint index as its own bucketed table, making the anti-join
    co-partitioned and shuffle-free on the index side).

    Shape: one within-batch window dedup (single exchange on the
    fingerprint) + one left_anti join on the fingerprint — batch-sized
    work, never corpus-sized rescans.
    """
    content = (
        F.lower(F.col(text_col)) if normalize else F.col(text_col)
    )
    batch = new_df.select(
        F.col(id_col), F.md5(content).alias("fingerprint")
    )
    idx = index_df.select(F.md5(content).alias("fingerprint")).distinct()
    w = Window.partitionBy("fingerprint").orderBy(id_col)
    firsts = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return firsts.join(idx, "fingerprint", "left_anti").select(
        id_col, "fingerprint"
    )


def shingles(col, n: int = 5, distinct: bool = False):
    """Character n-grams of a string column (JVM higher-order
    functions — no UDF). NOT deduplicated by default: every consumer
    here is set-semantic anyway (MinHash min over a multiset equals
    min over its set; ``array_intersect``/``array_union`` dedupe
    internally), and interpreted ``array_distinct`` is O(n²) per row —
    it was the single largest cost of the signature stage. Pass
    ``distinct=True`` if you need the actual set."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.array_distinct(out) if distinct else out


_MERSENNE_31 = (1 << 31) - 1


def shingle_hash(hasher: str = "xxhash64"):
    """Shingle-string -> int hash expression factory.

    - "xxhash64": Spark-native, fastest (the scale default); pmod into
      the Mersenne domain for the permutation arithmetic.
    - "md5_28": first 7 hex chars of md5 as a 28-bit int — bit-exactly
      reproducible in DuckDB as ``('0x'||substr(md5(s),1,7))::BIGINT``,
      which is what makes a full cross-engine SQL oracle for the LSH
      pipeline possible (DuckDB has no xxhash64). 28 bits keep
      a*h+b < 2^59: overflow-free int64 in both engines.
    """
    if hasher == "xxhash64":
        return lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_31))
    if hasher == "md5_28":
        return lambda s: F.conv(
            F.substring(F.md5(s.cast("binary")), 1, 7), 16, 10
        ).cast("bigint")
    raise ValueError(f"unknown hasher: {hasher}")


def _perm_params(num_perm: int, seed: int = 7):
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_perm)
    ]


def _perm_min_pandas_udf(num_perm: int, seed: int = 7, sample_mod: int = 1):
    """Arrow-batched permutation-min: given the JVM-hashed shingle
    array, compute all num_perm (a*h+b) mod p minima. a, h < 2^31 so
    a*h+b < 2^62+2^31 — exact in int64, identical to the JVM
    expression path bit-for-bit.

    Vectorized ACROSS the batch, not per row: all rows' hashes are
    concatenated into one flat vector, each permutation is one
    (a*flat+b) % p pass, and per-row minima come from
    ``np.minimum.reduceat`` at the row offsets — num_perm vectorized
    passes per batch instead of one numpy broadcast per row.

    ``sample_mod > 1`` applies the consistent mod-sampling here (keep
    hashes ≡ 0 mod k, fall back to the full set when a short doc
    samples to empty) — same semantics as the interpreted
    ``F.filter`` projection the expr path uses, without two extra
    interpreted passes over the array column."""
    from pyspark.sql.pandas.functions import pandas_udf

    params = _perm_params(num_perm, seed)
    A = np.array([p[0] for p in params], dtype=np.int64)
    B = np.array([p[1] for p in params], dtype=np.int64)

    @pandas_udf("array<bigint>")
    def sig(hs: pd.Series) -> pd.Series:
        out: list = [None] * len(hs)
        keep_idx: list[int] = []
        arrays: list[np.ndarray] = []
        for i, h in enumerate(hs):
            if h is None or len(h) == 0:
                continue
            hv = np.asarray(h, dtype=np.int64)
            if sample_mod > 1:
                s = hv[hv % sample_mod == 0]
                if s.size:
                    hv = s
            keep_idx.append(i)
            arrays.append(hv)
        if not keep_idx:
            return pd.Series(out)
        flat = np.concatenate(arrays)
        offs = np.zeros(len(arrays), dtype=np.intp)
        np.cumsum([a.size for a in arrays[:-1]], out=offs[1:])
        res = np.empty((len(arrays), num_perm), dtype=np.int64)
        for p in range(num_perm):
            res[:, p] = np.minimum.reduceat((A[p] * flat + B[p]) % _MERSENNE_31, offs)
        for j, i in enumerate(keep_idx):
            out[i] = res[j]
        return pd.Series(out)

    return sig


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    shingle_n: int = 5,
    sample_mod: int = 1,
    impl: str = "pandas",
    hasher: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document via universal hashing: each
    shingle is string-hashed ONCE (xxhash64 -> pmod into [0, 2^31-1)),
    then the i-th permutation is (a_i*h + b_i) mod (2^31-1) — three
    integer ops instead of a fresh string hash per permutation
    (the standard datasketch-style scheme; 32x less string hashing).
    The Mersenne-prime domain keeps a_i*h under 62 bits, so the
    arithmetic can never overflow ANSI-mode bigints.

    Signatures are num_perm*8 bytes however long the document is —
    this is what makes 100 TB near-dedup tractable (shuffle
    signatures, not text).

    ``impl``: "pandas" (default) computes the num_perm minima in an
    Arrow-batched numpy broadcast — one pass over the hashes instead
    of num_perm interpreted higher-order passes (Catalyst does not
    codegen lambda bodies; measured ~4x on the signature stage).
    "expr" keeps the pure-JVM column-expression path. Both produce
    bit-identical signatures (covered by a parity test)."""
    def perm_min(a: int, b: int):
        # factory closure: a `lambda h, a=a, b=b` two-param lambda
        # would make PySpark pass the array index as the second arg
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_31))

    # materialize hashed shingles as a real column FIRST: inlining the
    # (quadratic array_distinct) shingle build into each of the
    # num_perm array_min terms would re-evaluate it num_perm times per
    # row (measured 30x slowdown)
    hashed = F.transform(shingles(text_col, shingle_n), shingle_hash(hasher))
    with_h = spread_for_compute(df, id_col).select(
        F.col(id_col), hashed.alias("__h")
    )
    if impl == "pandas":
        # sampling folded into the Arrow kernel — no interpreted
        # filter/fallback projections over the array column
        sig_udf = _perm_min_pandas_udf(num_perm, sample_mod=sample_mod)
        return with_h.select(F.col(id_col), sig_udf("__h").alias("signature"))
    if sample_mod > 1:
        # consistent mod-sampling: keep shingles whose base hash is
        # 0 (mod k). The filter is a function of the shingle alone, so
        # it selects the SAME shingles in every document — the sampled
        # sets' Jaccard is an unbiased estimate of the full Jaccard,
        # and each permutation now scans |shingles|/k elements
        # (higher-order functions run interpreted, so per-element
        # node-evaluation count is the actual cost driver).
        # Short docs that sample to empty fall back to the full set.
        # NB each step is its own projection: inlining one step's
        # expression into the next re-evaluates it per reference.
        with_h = with_h.select(
            id_col,
            "__h",
            F.filter("__h", lambda h: h % sample_mod == 0).alias("__hs"),
        ).select(
            id_col,
            F.when(F.size("__hs") > 0, F.col("__hs")).otherwise(F.col("__h")).alias("__h"),
        )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__h"), perm_min(a, b)))
            for (a, b) in _perm_params(num_perm)
        ]
    )
    return with_h.select(F.col(id_col), sig.alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 50,
    cache_intermediate: bool = True,
    sample_mod: int = 1,
    impl: str = "pandas",
    presift_sigma: float = 3.0,
    hasher: str = "xxhash64",
    portable_buckets: bool = False,
) -> DataFrame:
    """Candidate pairs from banded MinHash, verified with exact
    shingle-set Jaccard. Returns (id_a, id_b, jaccard), id_a < id_b.

    ``hasher="md5_28"`` + ``portable_buckets=True`` makes every stage
    bit-reproducible in DuckDB SQL (band buckets keyed on the raw
    signature component tuple instead of their xxhash64), enabling a
    full cross-engine oracle; the default keeps the cheaper
    Spark-native hashing for the scale path. Semantics are identical.

    bands must divide num_perm; rows-per-band r = num_perm//bands sets
    the S-curve threshold ≈ (1/bands)^(1/r).

    ``cache_intermediate`` persists the signature/shingle frames that
    feed both sides of the self-joins (signatures are num_perm*8 bytes
    per doc — tiny; shingle sets are corpus-sized, trade memory for
    the recompute on the verify join).

    ``presift_sigma``: before the exact-Jaccard verify, estimate each
    candidate pair's Jaccard from its (already-computed, tiny)
    signatures — the fraction of equal components — and drop pairs
    whose estimate is more than this many standard deviations
    (σ = sqrt(j(1-j)/num_perm)) below the threshold. Single-band
    chance collisions sit near r/num_perm and are eliminated without
    ever touching their shingle sets; a true-positive pair at exactly
    the threshold survives with P ≈ Φ(sigma) (99.87% at 3σ). The
    exact verify — the only stage that shuffles corpus-sized shingle
    arrays — then runs on the survivors alone, and only THEIR
    documents are shingled at all (left-semi pushdown). 0 disables.
    """
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, shingle_n, sample_mod, impl, hasher
    )
    if cache_intermediate:
        # scoped_cache = cache() semantics (CacheManager plan-equality
        # reuse across actions AND rebuilt identical queries) plus a
        # per-session ledger so sweepers release storage explicitly
        # (caching.release_scoped) instead of accumulating to LRU
        sigs = scoped_cache(sigs)

    if portable_buckets:
        # raw component tuple as the bucket key (groupable in any
        # engine); at scale the xxhash64 form below shrinks the
        # shuffled key to 8 bytes, which is why it stays the default
        bucket_fields = lambda b: [  # noqa: E731
            F.col("signature")[b * r + j].alias(f"c{j}") for j in range(r)
        ]
        bucket_cols = ["band"] + [f"c{j}" for j in range(r)]
    else:
        bucket_fields = lambda b: [  # noqa: E731
            F.xxhash64(*[F.col("signature")[b * r + j] for j in range(r)]).alias("bucket")
        ]
        bucket_cols = ["band", "bucket"]

    banded = sigs.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), *bucket_fields(b))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, *[f"bb.{c}" for c in bucket_cols])

    # candidates: same (band, bucket); degenerate buckets capped — at
    # scale the banded table is corpus×bands rows, so shuffling it
    # once (bucket_pairs) is the difference that matters.
    cand = bucket_pairs(banded, bucket_cols, id_col, max_bucket_size)

    if presift_sigma > 0:
        cutoff = jaccard_threshold - presift_sigma * math.sqrt(
            jaccard_threshold * (1.0 - jaccard_threshold) / num_perm
        )
        if cutoff > 0:
            est = F.size(
                F.filter(F.zip_with("__sa", "__sb", lambda x, y: x == y), lambda m: m)
            ) / F.lit(float(num_perm))
            cand = (
                cand.join(sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("__sa")), "id_a")
                .join(sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("__sb")), "id_b")
                .filter(est >= cutoff)
                .select("id_a", "id_b")
            )
    if cache_intermediate:
        cand = scoped_cache(cand)

    # shingle ONLY documents that appear in a surviving pair — at scale
    # the corpus is orders of magnitude larger than the candidate set,
    # and shingle sets are the one corpus-sized intermediate here.
    need_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # Verify on HASHED shingles: exact set-Jaccard is preserved
    # (xxhash64 collisions among a few hundred shingles are ~2^-50),
    # while array_intersect/array_union compare bigints instead of
    # n-char strings — measurably cheaper in the interpreted
    # higher-order evaluator, and the shuffled verify payload is 8
    # bytes per shingle regardless of shingle_n.
    # The per-doc array is pre-deduplicated and each side's set size
    # rides along, so the per-pair work is ONE array_intersect —
    # |A∪B| = |A|+|B|-|A∩B| replaces the (larger) array_union pass.
    # xxhash64 for verify even when the signature hasher is md5_28:
    # full-width hashing makes collisions ~2^-50 instead of ~2^-29.
    # EXCEPT in portable mode, where the oracle must replay the exact
    # same hashed sets — there the md5_28 sets themselves are the
    # cross-engine ground truth (any collision affects both engines
    # identically, so the comparison stays bit-exact).
    verify_hash = (
        shingle_hash(hasher) if hasher != "xxhash64" else (lambda s: F.xxhash64(s))
    )
    sh = spread_for_compute(df.join(need_ids, [id_col], "left_semi"), id_col).select(
        F.col(id_col),
        F.array_distinct(
            F.transform(shingles(text_col, shingle_n), verify_hash)
        ).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    if cache_intermediate:
        sh = scoped_cache(sh)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cand.join(
            sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"),
                      F.col("n_sh").alias("n_a")),
            "id_a",
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"),
                      F.col("n_sh").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (inter / (F.col("n_a") + F.col("n_b") - inter)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified


def simhash_64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-token xxhash64 votes
    +1/-1 per bit; fingerprint bit b set iff the vote sum is positive.
    Per-bit set-vote counts via array filters (shift amounts must be
    Python ints in Spark, so the 64-bit loop runs at plan-build time;
    the data-path is still pure JVM expressions)."""
    df = spread_for_compute(df, id_col)
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    terms = []
    for b in range(64):
        # signed-64 bit mask (b=63 wraps to the sign bit)
        mask = (1 << b) if b < 63 else (1 << 63) - (1 << 64)

        def bit_set(t, mask=mask):
            return F.xxhash64(t).bitwiseAND(F.lit(mask)) != 0

        set_votes = F.size(F.filter(toks, bit_set))
        terms.append(
            F.when(set_votes * 2 > n_tok, F.lit(mask).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    fp = terms[0]
    for t in terms[1:]:
        fp = fp + t
    return df.select(F.col(id_col), fp.alias("simhash"))


def _simhash_pandas_udf():
    """Arrow-batched portable-SimHash kernel: md5 per token via
    hashlib (identical bytes to the SQL ``md5``), bit votes vectorized
    in numpy. Bit-identical to the expression path — covered by a
    differential test.

    r16 rewrite (guide §4.2): the r15 body paid one ``hashlib.md5`` +
    hexdigest + two 8-hex-char int parses PER TOKEN OCCURRENCE plus a
    fresh (n_tok, 32) broadcast per row. Token distributions are
    heavy-tailed (the certification corpus has ~31 distinct tokens
    over 270k occurrences; any natural corpus is Zipfian), so the md5
    now runs once per DISTINCT token per Arrow batch: a per-batch
    dict maps token -> row of a precomputed (uniq, 64) 0/1 bit matrix
    (``np.unpackbits`` over the first 8 digest bytes, MSB-first), and
    each row's votes are one fancy-index + column sum. Same md5 bytes,
    same majority rule, same (fp_lo, fp_hi) split — int(hexdigest[:8],
    16) is exactly the big-endian int of digest bytes 0-4, and
    [8:16] of bytes 4-8. Measured ~4.5x single-core on a 90:1
    dedup-ratio batch; degrades gracefully to ~the old cost when
    every token is unique (one md5 per token either way, minus the
    hex parsing). Per-batch memory is O(distinct tokens * 64 bytes)."""
    from pyspark.sql.pandas.functions import pandas_udf

    import hashlib

    weights = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)

    @pandas_udf("struct<fp_lo:bigint,fp_hi:bigint>")
    def fp(texts: pd.Series) -> pd.DataFrame:
        md5 = hashlib.md5
        lo_out = np.zeros(len(texts), dtype=np.int64)
        hi_out = np.zeros(len(texts), dtype=np.int64)
        if not len(texts):
            return pd.DataFrame({"fp_lo": lo_out, "fp_hi": hi_out})
        tok_lists = [("" if t is None else t).split(" ") for t in texts]
        tokmap: dict = {}
        for toks in tok_lists:
            for t in toks:
                if t not in tokmap:
                    tokmap[t] = len(tokmap)
        dig = np.empty(len(tokmap), dtype=np.uint64)
        for t, j in tokmap.items():
            # first 8 digest bytes big-endian: top 32 bits == the
            # hexdigest[:8] 'hi' half, low 32 == hexdigest[8:16] 'lo'
            dig[j] = int.from_bytes(md5(t.encode("utf-8")).digest()[:8], "big")
        # (uniq, 64) 0/1 rows; column k holds bit (63-k) — unpackbits
        # is MSB-first per byte, matching the big-endian byte view
        bits = np.unpackbits(
            dig.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
        )
        for i, toks in enumerate(tok_lists):
            idx = np.fromiter(
                (tokmap[t] for t in toks), dtype=np.intp, count=len(toks)
            )
            votes = bits[idx].sum(axis=0, dtype=np.int64)
            fp64 = int((weights * (2 * votes > len(toks))).sum())
            hi_out[i] = fp64 >> 32
            lo_out[i] = fp64 & 0xFFFFFFFF
        return pd.DataFrame({"fp_lo": lo_out, "fp_hi": hi_out})

    return fp


def simhash_32x2_portable(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    impl: str = "pandas",
) -> DataFrame:
    """Portable SimHash: the 64-bit fingerprint as TWO 32-bit halves
    (fp_lo, fp_hi), with per-token bit sources taken from md5 hex
    halves — ``('0x'||substr(md5(t),1,8))::BIGINT`` is reproducible in
    DuckDB, which a xxhash64-based fingerprint is not. Splitting into
    halves keeps every intermediate in non-negative int32 range, so no
    cross-engine signed-overflow semantics are ever in play.

    ``impl="pandas"`` (default) computes fingerprints in an
    Arrow-batched numpy kernel; ``"expr"`` keeps the pure-JVM
    column-expression path (per-token hash arrays materialized once,
    64 bit-vote filters over bigint arrays). Both produce bit-identical
    fingerprints."""
    if impl == "pandas":
        fp_udf = _simhash_pandas_udf()
        return spread_for_compute(df, id_col).select(
            F.col(id_col), fp_udf(F.col(text_col)).alias("__fp")
        ).select(id_col, "__fp.fp_lo", "__fp.fp_hi")

    return simhash_fp_columns(spread_for_compute(df, id_col), text_col).select(
        id_col, "fp_lo", "fp_hi"
    )


def simhash_fp_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the portable SimHash halves as ``fp_lo``/``fp_hi``
    columns, preserving every input column. Pure column expressions —
    no UDF, no repartition — so this lifts UNCHANGED onto Structured
    Streaming frames (the streaming near-dup dedup builds on it).
    Bit-identical to the pandas kernel and the DuckDB SQL replica."""
    # coalesce NULL text to '' so the expr path fingerprints [''] like
    # the pandas kernel (None -> ""); keeps the bit-identical guarantee
    # on corpora that carry null text
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")

    def half(start: int):
        return lambda t: F.conv(
            F.substring(F.md5(t.cast("binary")), start, 8), 16, 10
        ).cast("bigint")

    base = df.withColumns({
        "__n": F.size(toks),
        "__hi": F.transform(toks, half(1)),
        "__lo": F.transform(toks, half(9)),
    })

    def fingerprint(arr: str):
        terms = []
        # factory closure: a `lambda h, b=b` two-param lambda would
        # make PySpark pass the array index as the second arg; and
        # mask-AND instead of shiftright, which rejects lambda vars
        def make_bit_set(b: int):
            mask = 1 << b
            return lambda h: h.bitwiseAND(F.lit(mask)) != 0

        for b in range(32):
            votes = F.size(F.filter(F.col(arr), make_bit_set(b)))
            terms.append(
                F.when(votes * 2 > F.col("__n"), F.lit(1 << b).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint"))
            )
        fp = terms[0]
        for t in terms[1:]:
            fp = fp + t
        return fp

    return base.withColumns({
        "fp_lo": fingerprint("__lo"),
        "fp_hi": fingerprint("__hi"),
    }).drop("__n", "__hi", "__lo")


# 16-bit popcount lookup table for the pair kernel: numpy < 2.0 has
# no vectorized bit_count, and LUT[x & 0xFFFF] + LUT[x >> 16] over
# int64 values < 2^32 is one gather + one add per half
_POPCNT16 = np.unpackbits(
    np.arange(1 << 16, dtype=np.uint16).view(np.uint8).reshape(-1, 2),
    axis=1,
).sum(axis=1).astype(np.uint8)


def _simhash_pairs_kernel(
    chunks: DataFrame,
    id_col: str,
    max_hamming: int,
    max_bucket_size: int,
) -> DataFrame:
    """(id_a, id_b, hamming) from bucketed portable fingerprints via
    an Arrow kernel — the admission-kernel playbook (r16, guide §4.2)
    applied to ``bucket_pairs``' in-bucket expansion, which evaluates
    INTERPRETED (nested transform + per-element array slice, O(m²)
    slice copies per bucket; measured +1.08 s of the 2.44 s x16 pair
    stage). The bucket grouping itself stays a JVM ``collect_list``
    aggregation (map-side partial, one exchange — same plan shape);
    only the expansion + hamming verify moves into numpy:

      * buckets are grouped BY SIZE inside each Arrow batch, so every
        size class is one stacked (k, m) triu-indexed XOR + popcount
        pass — no per-bucket numpy dispatch on the (dominant) tiny
        buckets;
      * popcount via a 16-bit lookup table (values are 32-bit halves);
      * pairs failing ``hamming <= max_hamming`` never leave the
        kernel, so the de-duplicating ``distinct()`` shuffles only
        true near-pairs. Filtering before the distinct is equivalent:
        hamming is a function of the pair, and Catalyst pushed the
        same predicate below the distinct in the expr form too.

    Three parallel ``collect_list``s (ids / fp_lo / fp_hi) index-align
    because one aggregation operator feeds every buffer row-by-row.
    Emits rows directly from ``mapInPandas`` (cardinality changes; no
    explode, no struct rebuild). Output is bit-identical to the
    expr form modulo row order — pinned by a differential test."""
    maxh = int(max_hamming)
    buckets = (
        chunks.groupBy("chunk", "bkey")
        .agg(
            F.collect_list(F.col(id_col)).alias("ids"),
            F.collect_list(F.col("fps.fp_lo")).alias("los"),
            F.collect_list(F.col("fps.fp_hi")).alias("his"),
        )
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size)
        )
        .select("ids", "los", "his")
    )

    def expand(batches):
        lut = _POPCNT16
        for pdf in batches:
            nb = len(pdf)
            if nb == 0:
                continue
            rows = [
                (
                    np.asarray(pdf["ids"].iloc[r], dtype=np.int64),
                    np.asarray(pdf["los"].iloc[r], dtype=np.int64),
                    np.asarray(pdf["his"].iloc[r], dtype=np.int64),
                )
                for r in range(nb)
            ]
            szs = np.fromiter(
                (len(r[0]) for r in rows), dtype=np.int64, count=nb
            )
            order = np.argsort(szs, kind="stable")
            out_a, out_b, out_h = [], [], []
            pos = 0
            while pos < nb:
                m = szs[order[pos]]
                end = pos
                while end < nb and szs[order[end]] == m:
                    end += 1
                grp = order[pos:end]
                ids = np.stack([rows[g][0] for g in grp])
                lo = np.stack([rows[g][1] for g in grp])
                hi = np.stack([rows[g][2] for g in grp])
                ia, ib = np.triu_indices(m, 1)
                x = lo[:, ia] ^ lo[:, ib]
                y = hi[:, ia] ^ hi[:, ib]
                h = (
                    lut[x & 0xFFFF].astype(np.int32)
                    + lut[(x >> 16) & 0xFFFF]
                    + lut[y & 0xFFFF]
                    + lut[(y >> 16) & 0xFFFF]
                )
                keep = h <= maxh
                a = ids[:, ia][keep]
                b = ids[:, ib][keep]
                sw = a > b
                out_a.append(np.where(sw, b, a))
                out_b.append(np.where(sw, a, b))
                out_h.append(h[keep])
                pos = end
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a),
                    "id_b": np.concatenate(out_b),
                    "hamming": np.concatenate(out_h).astype(np.int32),
                }
            )

    return buckets.mapInPandas(
        expand, schema="id_a bigint, id_b bigint, hamming int"
    ).distinct()


def simhash_near_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    max_bucket_size: int = 200,
    impl: str = "pandas",
    pair_impl: str = "kernel",
) -> DataFrame:
    """simhash_near_pairs on the portable two-half fingerprint: band
    into four 16-bit chunks (two per half), bucket-join, verify with
    bit_count(xor) summed over the halves. Bit-reproducible in DuckDB
    — see the generated oracle in entry_queries._simhash_sql.

    ``pair_impl``: "kernel" (default) runs the in-bucket pair
    expansion + hamming verify in an Arrow numpy kernel
    (:func:`_simhash_pairs_kernel`); "expr" keeps the interpreted
    ``bucket_pairs`` HOF expansion + JVM bit_count verify. Identical
    output — pinned by a differential test. The kernel requires
    integral ids (numpy int64); non-integral id columns take the expr
    path automatically."""
    fp = simhash_32x2_portable(df, text_col, id_col, impl)
    chunk_key = [
        (F.shiftrightunsigned(F.col("fp_lo"), 0) if c == 0 else
         F.shiftrightunsigned(F.col("fp_lo"), 16) if c == 1 else
         F.shiftrightunsigned(F.col("fp_hi"), 0) if c == 2 else
         F.shiftrightunsigned(F.col("fp_hi"), 16)).bitwiseAND(F.lit(0xFFFF))
        for c in range(4)
    ]
    chunks = fp.select(
        id_col,
        F.struct("fp_lo", "fp_hi").alias("fps"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("chunk"), chunk_key[c].alias("bkey"))
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "fps", "cc.chunk", "cc.bkey")
    if pair_impl == "kernel":
        from pyspark.sql import types as T

        if isinstance(
            chunks.schema[id_col].dataType, (T.LongType, T.IntegerType)
        ):
            return _simhash_pairs_kernel(
                chunks, id_col, max_hamming, max_bucket_size
            )
    ham = (
        F.bit_count(F.col("payload_a.fp_lo").bitwiseXOR(F.col("payload_b.fp_lo")))
        + F.bit_count(F.col("payload_a.fp_hi").bitwiseXOR(F.col("payload_b.fp_hi")))
    )
    return (
        bucket_pairs(chunks, ["chunk", "bkey"], id_col, max_bucket_size, "fps")
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 12,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into four
    16-bit chunks (pigeonhole: any pair within Hamming distance 3*16
    shares a chunk; for tighter thresholds the chunk match is a recall
    heuristic), bucket-join, verify with bit_count(xor)."""
    fp = simhash_64(df, text_col, id_col)
    chunks = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.key")
    return (
        bucket_pairs(chunks, ["chunk", "key"], id_col, max_bucket_size, "simhash")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("payload_a").bitwiseXOR(F.col("payload_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def neardup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
    checkpoint_dir: str | None = None,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS — the step that turns
    pairwise similarity into an actual dedup decision (drop all but
    one doc per connected component). Pairs alone under-dedup: if
    A~B and B~C but A!~C, keeping "one per pair" keeps two of the
    three.

    Connected components by iterative min-label propagation (the
    HashMin BSP algorithm): every node starts labeled with its own id;
    each round takes the min of its label and its neighbors' labels;
    at the fixed point every node carries the MINIMUM id reachable
    from it, which is iteration-order independent — the reason a
    declarative oracle (recursive-CTE closure) can check this exactly.

    Scale: the iteration runs ONLY over edge endpoints — a node with
    no near-dup pair can never change its label, so the corpus-sized
    frame is touched exactly twice (an anti-join to emit singletons,
    once, at the end). Each round is one join + one groupBy on the
    EDGE list (O(|E|), and near-dup pair lists are orders of magnitude
    smaller than the corpus), and rounds needed equal the component
    diameter — near-dup graphs are overwhelmingly tiny stars and
    chains, so this converges in a handful of rounds. Labels are
    eagerly localCheckpointed per round to keep the plan linear in
    rounds (not exponential). For adversarial graphs with huge
    diameters, swap in alternating-star contraction (Kiveris et al.);
    the interface stays the same.

    ``driver_max_edges`` bounds the driver-local path: at or below it
    (default 100k edges ~ 1.6 MB) components are solved exactly by
    union-find on the collected edge list — the BSP loop's per-round
    job latency dwarfs the work at that size — and above it the
    distributed BSP owns the graph. Both paths produce the identical
    min-label fixed point. Set 0 to force BSP.

    Fault tolerance: per-round barriers default to ``localCheckpoint``
    — executor-local blocks, fastest, but lost if an executor dies
    mid-loop (the whole query restarts). Pass ``checkpoint_dir`` (an
    HDFS/object-store path on a real cluster) to write round barriers
    through ``checkpoint()`` to reliable storage instead — each round
    costs a write to stable storage, but a lost executor replays from
    the last round, not from scratch. Local runs don't need it.

    Returns (id_col, cluster_id, is_kept): every id keeps a row;
    singletons are their own cluster; ``is_kept`` marks the cluster
    representative (min id)."""
    restore_dir = None
    if checkpoint_dir is not None:
        # setCheckpointDir is SESSION-GLOBAL state; every checkpoint
        # here is EAGER (written before this function returns), so the
        # prior dir — if one was configured — is restored on exit
        # rather than leaving later callers silently redirected. (If
        # none was set before, the new dir stays: the JVM offers no
        # clean unset, and nothing else was using checkpoint().)
        sc = pairs.sparkSession.sparkContext
        prior = sc._jsc.sc().getCheckpointDir()
        if prior.isDefined():
            restore_dir = (sc, prior.get())
        sc.setCheckpointDir(checkpoint_dir)

        def _barrier(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _barrier(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # materialize the pair list ONCE before symmetrizing: the union
    # references `pairs` twice, and without this barrier the entire
    # upstream candidate pipeline (e.g. MinHash banding + verify) is
    # evaluated once per orientation
    p0 = _barrier(pairs.select("id_a", "id_b"))
    edges = (
        p0.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
        .unionByName(p0.select(F.col("id_b").alias("s"), F.col("id_a").alias("d")))
        .distinct()
    )
    edges = _barrier(edges)
    # Size the BSP working set from the MEASURED edge count (a count on
    # the materialized checkpoint is free): the checkpoint inherits the
    # upstream shuffle's partitioning (64 near-empty partitions here),
    # and without this every round schedules dozens of empty tasks —
    # pure overhead locally, and still wasteful on a cluster when the
    # pair list is small. ~100k edges per partition, capped at the
    # session's parallelism.
    n_edges = edges.count()
    # Scale-adaptive strategy: near-dup edge lists are orders of
    # magnitude smaller than the corpus, and BELOW ``driver_max_edges``
    # (bounded: 100k (s,d) int64 pairs = ~1.6 MB) the BSP loop's cost
    # is pure per-round job latency. Solve those exactly on the driver
    # with union-find (same min-label fixed point, same oracle) and
    # keep the distributed BSP as the path that owns anything larger —
    # the same bounded-collect pattern as the IVF training-sample cap.
    try:
        if n_edges <= driver_max_edges:
            labels = _driver_union_find(edges)
        else:
            labels = _bsp_min_label(edges, _barrier, max_iters, n_edges)
    finally:
        if restore_dir is not None:
            restore_dir[0].setCheckpointDir(restore_dir[1])
    clustered = labels.select(
        F.col("n").alias(id_col),
        F.col("lab").alias("cluster_id"),
        (F.col("n") == F.col("lab")).alias("is_kept"),
    )
    singletons = (
        ids.select(F.col(id_col))
        .join(labels.select(F.col("n").alias(id_col)), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.col(id_col).alias("cluster_id"),
            F.lit(True).alias("is_kept"),
        )
    )
    return clustered.unionByName(singletons)


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Exact connected components of a BOUNDED edge list on the
    driver: union-find with path compression, labels resolved to the
    minimum id per component (identical to the BSP fixed point)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in edges.select("s", "d").collect():
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = [(n, find(n)) for n in parent]
    # labels keep the EDGE id type (string URLs cluster as well as
    # bigints; the downstream unionByName with the ids frame requires
    # the types to line up). The explicit schema rides the Arrow
    # fast path via pandas without ever coercing values.
    from pyspark.sql import types as T

    id_type = edges.schema["s"].dataType
    schema = T.StructType(
        [T.StructField("n", id_type), T.StructField("lab", id_type)]
    )
    if not out:
        return edges.sparkSession.createDataFrame([], schema)
    return edges.sparkSession.createDataFrame(
        pd.DataFrame(out, columns=["n", "lab"]), schema
    )


def _bsp_min_label(
    edges: DataFrame, _barrier, max_iters: int, n_edges: int
) -> DataFrame:
    target = max(1, min(
        edges.sparkSession.sparkContext.defaultParallelism,
        -(-n_edges // 100_000),
    ))
    edges = _barrier(edges.coalesce(target))
    # active subgraph: only edge endpoints can ever change label
    labels = _barrier(
        edges.select(F.col("s").alias("n")).distinct()
        .select("n", F.col("n").alias("lab"))
        .coalesce(target)
    )
    converged = False
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels, edges.d == labels.n)
            .groupBy("s")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        hashed = labels.join(nbr_min, labels.n == nbr_min.s, "left").select(
            F.col("n"),
            F.least(F.col("lab"), F.coalesce("nbr_lab", F.col("lab"))).alias("lab"),
        )
        # pointer jumping (lab := lab[lab]): plain HashMin moves a
        # label ONE hop per round, so a path component of diameter d
        # needs d rounds; shortcutting through the current label makes
        # the distance-to-root roughly halve per round — O(log d)
        # rounds total, so max_iters=25 covers any real graph instead
        # of silently mislabeling chains longer than max_iters
        lut = hashed.select(F.col("n").alias("__ln"), F.col("lab").alias("__ll"))
        stepped = (
            hashed.join(lut, hashed.lab == lut.__ln, "left")
            .select(
                "n",
                F.least(F.col("lab"), F.coalesce("__ll", F.col("lab"))).alias("new_lab"),
            )
            # convergence flag rides along in the same materialization
            # (one checkpoint job + one cheap count over it per round)
            .join(labels.select(F.col("n").alias("__on"), F.col("lab").alias("__ol")),
                  F.col("n") == F.col("__on"))
            .select(
                "n",
                F.col("new_lab"),
                (F.col("new_lab") < F.col("__ol")).alias("chg"),
            )
            .coalesce(target)
        )
        stepped = _barrier(stepped)
        changed = stepped.filter("chg").count()
        labels = stepped.select("n", F.col("new_lab").alias("lab"))
        if changed == 0:
            converged = True
            break
    if not converged:
        # wrong clusters are a silent data-correctness trap; refuse
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iters} rounds "
            "(pathological component diameter?); raise max_iters"
        )
    return labels


def cluster_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Canonical-member selection per near-dup cluster: instead of
    blindly keeping the min-id member, keep the LONGEST one (by
    ``size_col``, min id on ties) — the standard "most complete copy"
    policy when near-dups are truncations/excerpts of each other.

    One aggregation (single shuffle on cluster_id): member count,
    argmax by (size, -id) for the canonical, and the total size
    dropped by deduplication. All-integer comparisons, so the choice
    is deterministic and oracle-replayable; singletons are included,
    certifying every document's cluster assignment.
    """
    joined = clusters.join(docs.select(id_col, size_col), id_col)
    pick = F.struct(F.col(size_col), (-F.col(id_col)).alias("__nid"))
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max_by(id_col, pick).alias("canonical_" + id_col),
            F.max(size_col).cast("bigint").alias("canonical_" + size_col),
            (F.sum(size_col) - F.max(size_col))
            .cast("bigint")
            .alias(size_col + "_dropped"),
        )
    )
