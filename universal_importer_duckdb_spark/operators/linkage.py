"""Fuzzy entity resolution (record linkage): blocked pairwise
edit-distance matching, the classic dedup shape for ENTITY tables
(names, addresses, product titles) where near-dup text operators
(MinHash over shingles, dedup_text.py) are too coarse — a 10-char
name has too few shingles to sketch.

Reference capability anchor: the reference dedups only on EXACT
composite keys (main.py:214 remove_duplicates_from_stage_table);
fuzzy matching is a scale-path extension per the north star.

Shape at 100 TB — the standard blocking discipline:
- Pair generation is never all-pairs. Rows first collapse to DISTINCT
  values (one hash-agg with map-side combine; entity columns are
  low-cardinality relative to row count, e.g. 64 distinct names over
  2,000 part rows here, and the ratio widens with scale), then a
  deterministic blocking key partitions the distinct values and a
  self-equi-join pairs ONLY within a block. Cost is sum(block²) over
  DISTINCT values, not rows².
- Block sizes are bounded by construction (`max_block_size` raises
  rather than silently running a quadratic block), mirroring the
  max_bucket_size cap in dedup_text.minhash_lsh_pairs.
- The verify predicate (edit distance) runs on candidate pairs only,
  JVM-side (`F.levenshtein` — identical semantics to DuckDB's
  `levenshtein`, so the whole pipeline replays in the oracle).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def last_token_block(col: Column) -> Column:
    """Default blocking key: the last whitespace token (for product
    names shaped 'adjective noun', the noun; for person names, the
    surname). Swap in a phonetic key (F.soundex) or a (prefix, length
    DIV k) composite for messier domains."""
    return F.element_at(F.split(col, " "), -1)


def fuzzy_match_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_key: Callable[[Column], Column] = last_token_block,
    max_distance: int = 3,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Candidate entity-merge pairs: distinct values of ``text_col``
    whose edit distance is <= ``max_distance`` within the same block.

    Returns one row per unordered pair (name_a < name_b) with the
    representative id (min ``id_col``) and occurrence count of each
    side — everything a downstream merge/cluster step needs (the
    pairs feed ``dedup_text.neardup_clusters`` unchanged).

    Raises at plan-execution time if any block exceeds
    ``max_block_size`` distinct values: a quadratic block is a design
    error to surface, not a job to run.
    """
    distinct = (
        df.groupBy(F.col(text_col).alias("name"))
        .agg(
            F.min(F.col(id_col)).cast("bigint").alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .withColumn("blk", block_key(F.col("name")))
    )
    guarded = distinct.withColumn(
        "__bn", F.count(F.lit(1)).over(Window.partitionBy("blk"))
    ).withColumn(
        "blk",
        F.when(
            F.col("__bn") <= max_block_size, F.col("blk")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("fuzzy_match_pairs: block '"),
                    F.col("blk"),
                    F.lit(f"' exceeds max_block_size={max_block_size}"),
                )
            )
        ),
    ).drop("__bn")
    a = guarded.select(
        F.col("blk"),
        F.col("name").alias("name_a"),
        F.col("rep_id").alias("id_a"),
        F.col("n_rows").alias("n_a"),
    )
    b = guarded.select(
        F.col("blk"),
        F.col("name").alias("name_b"),
        F.col("rep_id").alias("id_b"),
        F.col("n_rows").alias("n_b"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("bigint")
        )
        .filter(F.col("edit_dist") <= max_distance)
        .drop("blk")
    )
