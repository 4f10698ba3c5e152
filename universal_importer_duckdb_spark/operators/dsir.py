"""DSIR-style importance weighting for training-data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every raw-corpus document by how much its
hashed n-gram feature distribution looks like a small *target* corpus
(wiki-quality text, an in-domain seed set, ...): weight(doc) = sum
over the doc's features of log(p_target(f) / p_raw(f)), then resample
by weight. Reference anchor: none — the reference (main.py) has no
selection stage; this is north-star scope for the 100 TB pipeline.

This implementation keeps the estimator but makes the score a
SCALED-INTEGER likelihood ratio instead of a float log-ratio: each
hashed feature bucket contributes ``(c_target+1) * SCALE div
(c_raw+1)`` (add-one smoothing, integer division), and a document's
score is the exact BIGINT sum of its buckets' contributions weighted
by its own term counts, normalized by document length with one final
integer division. Monotone in the same direction as the log-ratio for
ranking purposes at fixed smoothing, and — unlike float log/exp —
bit-identical across engines and reduction orders, so the top-k is
reproducible anywhere.

Scale shape: tokens explode once into (doc, bucket, cnt) with
map-side combine; bucket statistics are ONE aggregation over the same
exploded pass (the target side is a conditional sum, not a second
scan); the stats table is vocab-bounded (``n_buckets`` rows, 2^14
default) so the score join broadcasts under AQE's size gate at any
corpus size; the final per-doc sum is map-side combinable. Overflow
bound (cf. textrank.py): contributions need ``(c_target+1) * SCALE <
2^63`` — with SCALE=10^6 that allows ~9.2e12 target-corpus token
occurrences per bucket, far past 100 TB-corpus bucket counts at 2^14
buckets only if the target stays a (typical) curated subset; raise
``n_buckets`` or lower SCALE for extreme targets.

The feature hash is the repo's portable md5-28 (identical in DuckDB
as ``('0x'||substr(md5(...),1,7))::BIGINT``), so the whole ranking is
oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.corpus import _md5_28

SCALE = 10**6


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
    top_k: int = 20,
    salt: str = "dsir-v1",
) -> DataFrame:
    """Top-``top_k`` documents by scaled-integer DSIR importance.

    ``is_target`` marks the target ("what good data looks like")
    subset; every document — target rows included — is scored against
    it. Returns ``(doc_id, n_words, score)`` where ``score`` is the
    length-normalized scaled ratio (SCALE = proportions identical to
    the target estimate), ordered by (score DESC, doc_id) for a
    deterministic cut.
    """
    words = (
        docs.select(
            F.col(id_col),
            is_target.alias("__t"),
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            F.col(id_col),
            "__t",
            (
                _md5_28(F.concat(F.lit(salt + ":"), F.col("w")))
                % F.lit(n_buckets)
            ).alias("b"),
        )
    )
    # one exploded pass feeds both consumers below
    from universal_importer_duckdb_spark.caching import scoped_cache

    per_doc = scoped_cache(
        words.groupBy(id_col, "b").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.max("__t").alias("__t"),
        )
    )
    stats = per_doc.groupBy("b").agg(
        F.sum("cnt").cast("bigint").alias("c_raw"),
        F.sum(F.when(F.col("__t"), F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
    )
    contrib = F.expr(f"((c_t + 1) * {SCALE}) div (c_raw + 1)")
    scored = (
        per_doc.join(stats, "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_words"),
            F.sum(F.col("cnt") * contrib).cast("bigint").alias("__s"),
        )
        .select(
            id_col,
            "n_words",
            F.expr("__s div n_words").cast("bigint").alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), id_col).limit(top_k)
