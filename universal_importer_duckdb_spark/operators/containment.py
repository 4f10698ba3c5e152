"""Substring-containment deduplication via rare-feature blocking.

A document that appears verbatim *inside* another (syndicated
article + wrapper page, quoted reposts, truncated re-crawls) is a
duplicate that fingerprint dedup misses (different full-text hash)
and MinHash only catches when the container is mostly the containee.
The exact predicate is ``instr(container.text, containee.text) > 0``
— a quadratic self-join if done naively.

Blocking makes it linear-ish: if doc A's raw text occurs inside doc
B's, then every *interior* token of A (tokens[1..n-2] — flanked by
the delimiter on both sides within A's own text, so their boundaries
survive wherever A lands inside B) appears in B as a complete token,
consecutively. Hence A's interior word-``n``-grams are all members
of B's consecutive-``n``-gram set. Pick ONE blocking n-gram per
containee — the globally rarest (min document frequency,
lexicographic tiebreak) — and join it against the exploded n-gram
sets; only those pairs are verified with the exact ``instr``. Rare
features keep candidate lists short; the verification keeps the
result exactly equal to the quadratic join (the blocking is lossless
by the boundary argument above for containees with >= ngram+2
tokens — fewer yield no interior n-gram and are excluded by
contract).

``ngram`` trades blocking power against the containee-size floor:
longer n-grams are rarer (fewer false candidates — decisive on
low-vocabulary corpora where any single trigram is common) but
exclude shorter docs. Default 5 (containees need >= 7 tokens).

Reference anchor: none (main.py's dedup is row-equality only) —
north-star scope for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ngrams(toks, n: int):
    """Consecutive word-n-grams of a token array as ' '-joined
    strings; empty when fewer than n tokens."""
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def containment_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = " ",
    ngram: int = 5,
) -> DataFrame:
    """All (contained_id, container_id) pairs where the contained
    doc's text is a substring of the container's, the contained doc
    has >= ngram+2 tokens, and either it is strictly shorter or
    (equal text) has the larger id — so mutual containment yields
    exactly one removable side.

    Plan: one explode for the corpus n-gram sets (distinct per doc),
    one count-distinct for document frequency, a min-by window to
    pick each containee's rarest interior n-gram, an equi-join on
    that n-gram (with the length precondition pushed into the join),
    and an ``instr`` verification on the joined pair. No cartesian
    product anywhere; the join key is by construction the
    lowest-frequency feature available.

    r16 (guide §2.3 — shuffle keys, not payloads): every gram is
    ``xxhash64``-hashed AT THE MAP, before any exchange, so the
    df-count aggregation, the rare-gram pick, and the candidate join
    all move 8-byte ints instead of ~30-60-byte gram strings — the
    gram strings never leave their scan stage. Correctness is
    unchanged: the blocking is lossless on hashes too (if A occurs
    inside B, every interior gram of A — hence its hash — is in B's
    hashed set), a collision can only ADD a candidate, and every
    candidate still passes the exact ``instr`` verify. The rare PICK
    can differ (df counts merge colliding grams; ties break on the
    hash, not the string) — immaterial, since any interior pick
    finds the same verified pairs. Measured (bench-protocol A/B,
    cache-warm min-of-5 blocks): sf0.1 ~1.35 -> ~1.20 s, x16 ~10.0
    -> ~8.1 s; output identical at both SFs.
    """
    toks = F.split(F.col(text_col), delimiter)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).cast("bigint").alias("len"),
        toks.alias("toks"),
    )

    from universal_importer_duckdb_spark.caching import scoped_cache

    def hashed(arr):
        return F.transform(arr, lambda g: F.xxhash64(g))

    # every doc's consecutive n-grams, distinct within doc — ids and
    # HASHED grams ONLY: the corpus-sized explode must never carry
    # document texts or gram strings; texts are re-attached to the
    # tiny candidate set at the end. Cached: the frame feeds both the
    # df-count branch and the container side of the candidate join.
    all_grams = scoped_cache(
        base.select(
            "id",
            F.explode(
                F.array_distinct(hashed(_ngrams(F.col("toks"), ngram)))
            ).alias("g"),
        )
    )
    # per-doc distinct already -> plain count IS the document frequency
    df_counts = all_grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))

    # containees: >= ngram+2 tokens -> interior n-grams over toks[1..n-2];
    # rarest pick is a min_by aggregation (map-side combinable), not a
    # per-id window sort
    interior = base.filter(F.size("toks") >= ngram + 2).select(
        "id",
        F.explode(
            F.array_distinct(
                hashed(_ngrams(F.slice(F.col("toks"), 2, F.size("toks") - 2), ngram))
            )
        ).alias("g"),
    )
    rare = (
        interior.join(df_counts, "g")
        .groupBy("id")
        .agg(F.min_by("g", F.struct("df", "g")).alias("g"))
        .select(F.col("id").alias("contained_id"), "g")
    )

    cand = (
        rare.join(
            all_grams.select(F.col("id").alias("container_id"), "g"), "g"
        )
        .filter(F.col("contained_id") != F.col("container_id"))
        .select("contained_id", "container_id")
    )

    texts = base.select("id", "txt", "len")
    verified = (
        cand.join(
            texts.select(
                F.col("id").alias("contained_id"),
                F.col("txt").alias("c_txt"),
                F.col("len").alias("c_len"),
            ),
            "contained_id",
        )
        .join(
            texts.select(
                F.col("id").alias("container_id"),
                F.col("txt").alias("b_txt"),
                F.col("len").alias("b_len"),
            ),
            "container_id",
        )
        .filter(
            (F.instr(F.col("b_txt"), F.col("c_txt")) > 0)
            & (
                (F.col("c_len") < F.col("b_len"))
                | (
                    (F.col("c_len") == F.col("b_len"))
                    & (F.col("contained_id") > F.col("container_id"))
                )
            )
        )
    )
    return verified.select("contained_id", "container_id").distinct()
