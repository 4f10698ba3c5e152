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
consecutively. Hence A's interior word-trigrams are all members of
B's consecutive-trigram set. Pick ONE blocking trigram per containee
— the globally rarest (min document frequency, lexicographic
tiebreak) — and join it against the exploded trigram sets; only those
pairs are verified with the exact ``instr``. Rare features keep
candidate lists short; the verification keeps the result exactly
equal to the quadratic join (the blocking is lossless by the
boundary argument above, for containees with >= 5 tokens — fewer
tokens yield no interior trigram, and such micro-docs are excluded
by contract).

Reference anchor: none (main.py's dedup is row-equality only) —
north-star scope for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _trigrams(toks):
    """Consecutive word-trigrams of a token array as ' '-joined
    strings; empty when fewer than 3 tokens."""
    n = F.size(toks)
    return F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def containment_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = " ",
) -> DataFrame:
    """All (contained_id, container_id) pairs where the contained
    doc's text is a substring of the container's, the contained doc
    has >= 5 tokens, and either it is strictly shorter or (equal
    text) has the larger id — so mutual containment yields exactly
    one removable side.

    Plan: one explode for the corpus trigram sets (distinct per doc),
    one count-distinct for document frequency, a min-by window to
    pick each containee's rarest interior trigram, an equi-join on
    that trigram, and an ``instr`` verification on the joined pair.
    No cartesian product anywhere; the join key is by construction
    the lowest-frequency feature available.
    """
    toks = F.split(F.col(text_col), delimiter)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).cast("bigint").alias("len"),
        toks.alias("toks"),
    )

    # every doc's consecutive trigrams, distinct within doc
    all_tris = (
        base.select("id", "txt", "len", F.explode(_trigrams(F.col("toks"))).alias("tri"))
        .dropDuplicates(["id", "tri"])
    )
    df_counts = all_tris.groupBy("tri").agg(
        F.countDistinct("id").alias("df")
    )

    # containees: >= 5 tokens -> interior trigrams = trigrams of toks[1..n-2]
    interior = base.filter(F.size("toks") >= 5).select(
        "id",
        "txt",
        "len",
        F.explode(
            _trigrams(F.slice(F.col("toks"), 2, F.size("toks") - 2))
        ).alias("tri"),
    )
    w = Window.partitionBy("id").orderBy("df", "tri")
    rare = (
        interior.join(df_counts, "tri")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id").alias("contained_id"),
            F.col("txt").alias("c_txt"),
            F.col("len").alias("c_len"),
            "tri",
        )
    )

    cand = rare.join(
        all_tris.select(
            F.col("id").alias("container_id"),
            F.col("txt").alias("b_txt"),
            F.col("len").alias("b_len"),
            "tri",
        ),
        "tri",
    ).filter(F.col("contained_id") != F.col("container_id"))

    verified = cand.filter(
        (F.instr(F.col("b_txt"), F.col("c_txt")) > 0)
        & (
            (F.col("c_len") < F.col("b_len"))
            | (
                (F.col("c_len") == F.col("b_len"))
                & (F.col("contained_id") > F.col("container_id"))
            )
        )
    )
    return verified.select("contained_id", "container_id").distinct()
