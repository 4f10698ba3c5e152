"""Distributed BPE (byte-pair-encoding) tokenizer induction and
application — the vocabulary-learning step of an LLM data pipeline,
run as pure DataFrame algebra.

The reference has no tokenizer surface (its text handling stops at
row validation, main.py:152); this is a scale-path extension per the
north star: training corpora need token counts under the TARGET
tokenizer, and the tokenizer itself is learned from corpus statistics.

Algorithm (the classic merge loop, on the word-frequency table):
1. One corpus-sized pass builds (word, count) — after which EVERY
   round runs on the vocabulary frame, which by Heaps' law is orders
   of magnitude smaller than the corpus (the same collapse
   vocab_topk exploits).
2. Each round: count adjacent symbol pairs weighted by word count
   (hash-agg with map-side combine), take the most frequent pair
   (TakeOrderedAndProject, ties broken lexicographically so the
   learned table is deterministic), and merge that pair inside every
   word. The winning pair rides into the merge step as a
   BROADCAST ONE-ROW FRAME — no driver collect anywhere in the loop.
3. Merging uses a delimited symbol-string representation
   ("·h·e·l·l·o·") and two sequential `replace` passes. Spark's
   `replace`, DuckDB's `replace`, and Python's `str.replace` share
   identical leftmost-non-overlapping scan semantics (verified on
   pathological same-symbol runs), so the ENTIRE learn loop replays
   bit-for-bit in the SQL oracle.

Deviations from canonical (Sennrich) BPE, documented for honesty:
lowercased [a-z0-9]+ word normalization, no end-of-word marker, and
same-symbol runs pair by replace-scan order rather than strict
left-to-right re-pairing after each merge (e.g. "aaaaaa" merges to
aa·a·aa·a, not aa·aa·aa). All three are deterministic and
cross-engine identical; a production tokenizer swaps this module for
a trained tokenizer file and keeps the surrounding plumbing.

Shape at 100 TB: the corpus is touched exactly twice (once to build
word counts, once to encode); each of the k merge rounds is a
vocab-sized narrow map + one hash-agg + a 1-row broadcast, with a
per-round ``localCheckpoint`` barrier keeping the plan linear in
rounds (the neardup_clusters discipline, dedup_text.py:704).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELIM = "·"  # '·' — cannot collide with [a-z0-9] symbols

__all__ = ["word_frequency_table", "learn_bpe", "bpe_token_counts"]


def word_frequency_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, d): corpus word frequencies with each word's
    delimited initial symbol string ("·h·i·"). The ONE corpus-sized
    aggregation of the learn phase."""
    word = F.explode(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
    ).alias("word")
    return (
        df.select(word)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn(
            "d",
            F.concat(
                F.regexp_replace(F.col("word"), "(.)", DELIM + "$1"),
                F.lit(DELIM),
            ),
        )
    )


def _symbols():
    # built lazily: F.expr needs an active SparkContext at call time
    return F.split(F.expr(f"trim(BOTH '{DELIM}' FROM d)"), DELIM)


def learn_bpe(
    words: DataFrame, n_merges: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Run ``n_merges`` BPE merge rounds over a word-frequency table
    (from :func:`word_frequency_table`). Returns ``(merges, vocab)``:
    the learned merge table (round, sym_a, sym_b, pair_count — THE
    tokenizer artifact) and the final vocabulary frame with each
    word's merged symbol string.

    Materializes each round eagerly (localCheckpoint barrier); raises
    if the corpus runs out of distinct pairs before ``n_merges``
    rounds — a sign the caller asked for more merges than the corpus
    supports, which would silently diverge from the SQL replay."""
    w = words.localCheckpoint(eager=True)
    merge_frames: list[DataFrame] = []
    for i in range(n_merges):
        base = w.select("cnt", _symbols().alias("__s"))
        n = F.size("__s")
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        )
        pairs = base.select(
            "cnt",
            F.explode(
                F.transform(
                    idx,
                    lambda j: F.struct(
                        F.element_at("__s", j).alias("a"),
                        F.element_at(F.col("__s"), j + 1).alias("b"),
                    ),
                )
            ).alias("pr"),
        )
        best = (
            pairs.groupBy(
                F.col("pr.a").alias("__ba"), F.col("pr.b").alias("__bb")
            )
            .agg(F.sum("cnt").alias("__bc"))
            .orderBy(F.desc("__bc"), "__ba", "__bb")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        if best.isEmpty():
            raise ValueError(
                f"learn_bpe: corpus exhausted after {i} merges "
                f"(asked for {n_merges})"
            )
        merge_frames.append(
            best.select(
                F.lit(i + 1).cast("bigint").alias("round"),
                F.col("__ba").alias("sym_a"),
                F.col("__bb").alias("sym_b"),
                F.col("__bc").cast("bigint").alias("pair_count"),
            )
        )
        pat = F.concat(
            F.lit(DELIM), F.col("__ba"), F.lit(DELIM), F.col("__bb"),
            F.lit(DELIM),
        )
        rep = F.concat(F.lit(DELIM), F.col("__ba"), F.col("__bb"), F.lit(DELIM))
        w = (
            w.crossJoin(F.broadcast(best))
            .withColumn("d", F.replace(F.replace("d", pat, rep), pat, rep))
            .select("word", "cnt", "d")
            .localCheckpoint(eager=True)
        )
    merges = merge_frames[0]
    for mf in merge_frames[1:]:
        merges = merges.unionByName(mf)
    return merges, w


def bpe_token_counts(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode: per-document token counts under the learned vocabulary
    — (id, n_words, n_bpe_tokens). The corpus-sized word stream joins
    the vocab's final symbol counts on the word (broadcast when the
    vocab is small; a plain shuffle join at dictionary scale), then
    one per-doc aggregation. Documents with no [a-z0-9] words keep a
    row with zero counts."""
    doc_words = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
    )
    tok = vocab.select(
        "word", F.size(_symbols()).cast("bigint").alias("__n_syms")
    )
    per_doc = (
        doc_words.join(tok, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("__n_syms").cast("bigint").alias("n_bpe_tokens"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
    )
