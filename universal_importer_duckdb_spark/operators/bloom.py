"""Portable Bloom-filter membership pre-filter, built from DataFrame
primitives only (no internal ``bloom_filter_agg`` — Spark keeps that
aggregate engine-internal, so we build the same structure with
``xxhash64`` + bit arithmetic that any engine can reproduce).

Why this exists: the reference's dedup path (main.py:214 area)
re-scans the full corpus per ingest. At 100 TB the membership
question "is this fingerprint already in the index?" must NOT shuffle
the batch against the whole index. A Bloom bitmap over the index keys
is a few GB for billions of keys at ~1% false-positive rate — small
enough to broadcast — so the batch is answered locally on each
executor and only *possible* members pay the exact verification join.

Representation: the m-bit bitmap is a DataFrame of non-zero 64-bit
words ``(word_idx BIGINT, word BIGINT)``. Building it is one
explode + one ``bit_or`` aggregation (map-side combinable); probing
is an explode of the k bit positions + a broadcast join on word_idx.
Bloom filters have NO false negatives, so `might_contain = false` is
a definitive "new key"; survivors are verified exactly, keeping the
end-to-end result bit-identical to a plain anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _positions(col, num_bits: int, num_hashes: int):
    """Array of k bit positions for a key: xxhash64(key, seed_i) mod m.

    Distinct seeds (the literal int column) give k independent hash
    functions from the one xxhash64 primitive; ``pmod`` keeps the
    position non-negative. All JVM-side, codegen-friendly.
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Aggregate a key column into a Bloom bitmap of non-zero words.

    One shuffle, keyed by word_idx (cardinality <= num_bits/64, i.e.
    thousands of rows for a megabit filter), with map-side partial
    ``bit_or`` — the corpus-sized input never crosses the wire, only
    per-partition word partials do.
    """
    pos = F.explode(_positions(F.col(key_col), num_bits, num_hashes))
    return (
        df.select(pos.alias("p"))
        # SQL shiftleft: the python F.shiftleft only takes a literal
        # shift amount, the SQL form shifts by a column
        .select(
            F.expr("p div 64").alias("word_idx"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_might_contain(
    probe: DataFrame,
    key_col: str,
    bloom_words: DataFrame,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    flag_col: str = "might_contain",
) -> DataFrame:
    """Annotate each probe row with a might-contain verdict.

    The k positions explode the probe k-fold, broadcast-join the word
    table (absent word_idx means an all-zero word, a definite miss),
    and fold back with ``min(hit)`` — every one of the k bits must be
    set. ``false`` is definitive (no false negatives); ``true`` means
    "verify exactly".
    """
    cols = probe.columns
    # Row identity for the k-fold explode/fold-back: grouping on the
    # probe's own columns would silently collapse duplicate probe rows
    # (and break on non-groupable column types) — the r6 advice row.
    # monotonically_increasing_id is stable within this one plan (no
    # shuffle between stamp and regroup), which is all the fold needs.
    with_pos = probe.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).withColumn(
        "__p", F.explode(_positions(F.col(key_col), num_bits, num_hashes))
    ).withColumn("__widx", F.expr("__p div 64"))
    joined = with_pos.join(
        F.broadcast(bloom_words.withColumnRenamed("word_idx", "__widx")),
        "__widx",
        "left",
    ).withColumn(
        "__hit",
        (
            F.coalesce(F.col("word"), F.lit(0).cast("bigint")).bitwiseAND(
                F.expr("shiftleft(1L, cast(__p % 64 as int))")
            )
            != 0
        ).cast("int"),
    )
    return (
        joined.groupBy("__rid")
        .agg(
            *[F.first(c).alias(c) for c in cols],
            (F.min("__hit") == 1).alias(flag_col),
        )
        .drop("__rid")
    )


def bloom_incremental_dedup(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Incremental ingest dedup with a Bloom pre-filter on the index.

    Same contract as ``dedup_text.incremental_exact_dedup`` (admit
    batch docs that are first-in-batch by fingerprint and absent from
    the index; reference anchor main.py:214's exclusionary dedup
    semantics) — but the index membership check goes through a
    broadcast Bloom bitmap first. Batch keys the bitmap rejects are
    admitted with no index join at all; only the "maybe" keys (true
    members + ~1% false positives) pay the exact left_anti join, so
    the shuffled volume is proportional to the *duplicate* rate, not
    the batch size. Result is bit-identical to the plain anti-join.
    """
    content = F.lower(F.col(text_col))
    batch = new_df.select(F.col(id_col), F.md5(content).alias("fingerprint"))
    idx = index_df.select(F.md5(content).alias("fingerprint")).distinct()

    w = Window.partitionBy("fingerprint").orderBy(id_col)
    firsts = (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    words = bloom_build(idx, "fingerprint", num_bits, num_hashes)
    flagged = bloom_might_contain(
        firsts, "fingerprint", words, num_bits, num_hashes
    )
    definite_new = flagged.filter(~F.col("might_contain")).select(
        id_col, "fingerprint"
    )
    maybe = flagged.filter(F.col("might_contain")).select(id_col, "fingerprint")
    verified_new = maybe.join(idx, "fingerprint", "left_anti").select(
        id_col, "fingerprint"
    )
    return definite_new.unionByName(verified_new)
