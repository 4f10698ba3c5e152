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


def dsir_scores(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
    salt: str = "dsir-v1",
    carry_cols: tuple[str, ...] = (),
    include_wordless: bool = False,
) -> DataFrame:
    """Every document's scaled-integer DSIR importance.

    ``is_target`` marks the target ("what good data looks like")
    subset; every document — target rows included — is scored against
    it. Returns ``(id, *carry_cols, n_words, score)`` where ``score``
    is the length-normalized scaled ratio (SCALE = proportions
    identical to the target estimate).

    ``carry_cols`` rides doc-constant columns through the scoring
    aggregations so callers (dsir_resample) need no second corpus
    scan + join; ``include_wordless=True`` keeps empty/null-text
    documents in the output via explode_outer (n_words 0, score 0) —
    off by default so the ranking surface stays words-only.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != "",
    )
    bucket = _md5_28(F.concat(F.lit(salt + ":"), F.col("w"))) % F.lit(
        n_buckets
    )
    # Pass 1 — vocab-bounded bucket stats straight off the token
    # stream: one map-side-combinable aggregate, NO (doc, bucket)
    # intermediate and NO cache (the r7 shape scoped-cached a
    # corpus-scale per-doc frame to feed this 2^14-row table; at
    # 100 TB a second narrow scan is strictly cheaper than
    # materializing ~|corpus tokens| rows — see README scale notes).
    stats = (
        docs.select(is_target.alias("__t"), F.explode(toks).alias("w"))
        .select("__t", bucket.alias("b"))
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c_raw"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0))
            .cast("bigint")
            .alias("c_t"),
        )
    )
    # Overflow guard (r7 advice, textrank precedent): (c_t+1)*SCALE
    # must stay under 2^63 — Spark would wrap silently in non-ANSI
    # mode while DuckDB errors, diverging the engines. textrank's
    # driver-side pre-check would force a second execution of the
    # stats aggregate (its edge list is checkpointed; this lineage is
    # not), so the guard rides IN the contrib expression instead:
    # assert_true returns NULL on pass, so the WHEN arm always takes,
    # and Catalyst cannot prune it away. Evaluated once per stats row
    # (vocab-bounded), not per token.
    c_t_cap = (2**63 - 1) // SCALE - 1
    contrib_val = F.expr(f"((c_t + 1) * {SCALE}) div (c_raw + 1)")
    contrib_guarded = F.when(
        F.assert_true(
            F.col("c_t") <= F.lit(c_t_cap),
            f"dsir_scores: target bucket count exceeds the BIGINT-safe "
            f"cap {c_t_cap} for SCALE={SCALE}; raise n_buckets or "
            f"lower SCALE",
        ).isNull(),
        contrib_val,
    )
    stats = stats.select("b", contrib_guarded.alias("contrib"))
    # Pass 2 — per-token contribution via the bucket join (2^14-row
    # build side: AQE converts it to a broadcast join at any corpus
    # size), folded per document in one map-side-combinable aggregate.
    # Summing contrib per TOKEN is the same integer sum as the old
    # per-(doc,bucket) cnt*contrib — order-free BIGINT addition.
    explode = F.explode_outer if include_wordless else F.explode
    words = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        explode(toks).alias("w"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.when(F.col("w").isNotNull(), bucket).alias("b"),
    )
    join_how = "left" if include_wordless else "inner"
    return (
        words.join(stats, "b", join_how)
        .groupBy(id_col)
        .agg(
            *[F.first(c).alias(c) for c in carry_cols],
            F.count("b").cast("bigint").alias("n_words"),
            F.sum(F.coalesce(F.col("contrib"), F.lit(0)))
            .cast("bigint")
            .alias("__s"),
        )
        .select(
            id_col,
            *carry_cols,
            "n_words",
            F.expr(
                "CASE WHEN n_words > 0 THEN __s div n_words "
                "ELSE CAST(0 AS BIGINT) END"
            ).cast("bigint").alias("score"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
    top_k: int = 20,
    salt: str = "dsir-v1",
) -> DataFrame:
    """Top-``top_k`` documents by DSIR importance, ordered by
    (score DESC, id) for a deterministic cut."""
    scored = dsir_scores(
        docs, is_target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, salt=salt,
    )
    return scored.orderBy(F.desc("score"), id_col).limit(top_k)


_HASH_SPACE = 1 << 28


def dsir_resample(
    docs: DataFrame,
    is_target: Column,
    by_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 14,
    salt: str = "dsir-v1",
    keep_salt: str = "dsir-keep-v1",
) -> DataFrame:
    """The resampling half of DSIR: keep each document with
    probability equal to its importance (score / SCALE — the score is
    the length-normalized ratio and is <= SCALE by construction, since
    every bucket has c_target <= c_raw), decided by the deterministic
    hash-threshold idiom — ``md5_28(keep_salt:id) * SCALE < score *
    2^28`` — so the sample is reproducible with no RNG state and a
    document's fate never changes when other documents arrive.
    All-integer compare (28-bit hash x scaled score stays far under
    2^63); no max-renormalization pass, so the plan is the score
    pipeline plus one corpus-by-key join (AQE-gated) and the final
    aggregate.

    Returns the per-``by_col`` selection report
    ``(by, n_docs, n_kept, tokens_kept)`` — the aggregate runs over
    every document's keep decision, so it certifies the whole sample.
    ``by_col`` and the wordless documents (score 0, never kept) ride
    through the scoring pass itself (carry_cols + explode_outer), so
    the corpus is scanned exactly once and there is no second
    corpus-sized join.
    """
    scored = dsir_scores(
        docs, is_target, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets, salt=salt,
        carry_cols=(by_col,), include_wordless=True,
    )
    hv = _md5_28(
        F.concat(F.lit(keep_salt + ":"), F.col(id_col).cast("string"))
    )
    sel = scored.select(
        by_col,
        "n_words",
        (hv * F.lit(SCALE) < F.col("score") * F.lit(_HASH_SPACE)).alias(
            "__keep"
        ),
    )
    return (
        sel.groupBy(by_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("__keep").cast("int")).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("__keep"), F.col("n_words")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
        .orderBy(by_col)
    )
