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
   word. The winning pair is the round's ONE-ROW argmax collect —
   bounded driver traffic that is inherent to BPE (round i+1's merge
   depends on round i's data-derived winner), after which the merge
   itself is a literal narrow map, so the vocabulary chain stays a
   single linear lineage off one materialization barrier with no
   per-round checkpoint or join.
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
word counts, once to encode); each of the k merge rounds is one
vocab-sized hash-agg job whose input is the checkpointed word table
plus i literal replace maps (map-only recompute, no shuffle replay),
and the only driver traffic is k single-row argmax results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELIM = "·"  # '·' — cannot collide with [a-z0-9] symbols

__all__ = [
    "word_frequency_table",
    "learn_bpe",
    "bpe_token_counts",
    "load_merges_file",
    "apply_merges",
]


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

    One materialization barrier on the word table, then one argmax
    job per round (the 1-row collect is the sequential dependence
    inherent to BPE); raises if the corpus runs out of distinct pairs
    before ``n_merges`` rounds — a sign the caller asked for more
    merges than the corpus supports, which would silently diverge
    from the SQL replay."""
    if n_merges < 1:
        # an empty merge list would render `SELECT * FROM VALUES`
        # (no rows) below — a ParseException, not an empty frame; and
        # a 0-merge "learned tokenizer" is a caller error anyway
        raise ValueError(f"learn_bpe: n_merges must be >= 1, got {n_merges}")
    w = words.localCheckpoint(eager=True)
    spark = w.sparkSession
    # vocab-proportional partitioning (the dedup_text edge-count
    # discipline): the loop's 8+ agg jobs otherwise run 32 near-empty
    # tasks per stage on a small vocabulary; ~64k words per partition
    # keeps tasks meaningful at dictionary scale too
    n_words = w.count()
    target = max(1, min(int(n_words // 65_536) + 1, w.rdd.getNumPartitions()))
    if target < w.rdd.getNumPartitions():
        w = w.coalesce(target)
    learned: list[tuple[int, str, str, int]] = []
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
                F.col("pr.a").alias("a"), F.col("pr.b").alias("b")
            )
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"learn_bpe: corpus exhausted after {i} merges "
                f"(asked for {n_merges})"
            )
        a, b, c = best[0].a, best[0].b, best[0].c
        # Enforce the [a-z0-9]+ normalization contract at the merge
        # boundary (the same check load_merges_file applies): learn_bpe
        # accepts ANY word table, and a non-normalized symbol would
        # reach the SQL VALUES literal below, where quoting only covers
        # single quotes — Spark SQL string literals also treat
        # backslash as an escape, so raising here beats silent symbol
        # corruption or a parse error downstream.
        for sym in (a, b):
            if not sym or DELIM in sym or not all(
                ch.islower() or ch.isdigit() for ch in sym
            ):
                raise ValueError(
                    f"learn_bpe: merged symbol {sym!r} outside the "
                    f"[a-z0-9]+ normalization contract — the word "
                    f"table was not built by word_frequency_table"
                )
        learned.append((i + 1, a, b, c))
        pat = F.lit(f"{DELIM}{a}{DELIM}{b}{DELIM}")
        rep = F.lit(f"{DELIM}{a}{b}{DELIM}")
        w = w.withColumn("d", F.replace(F.replace("d", pat, rep), pat, rep))
    # JVM-side VALUES literal, NOT spark.createDataFrame: a
    # Python-local frame serves through applySchemaToPythonRDD — a
    # Python-RDD scan re-serialized on EVERY action, measured
    # 0.3-0.5 s per noop write of 8 rows (r11; the whole recorded
    # "2.26x" of docs_bpe_learn_merges was this floor, zero compute).
    # The VALUES form is a LocalRelation: pure JVM, ~10 ms to serve.
    # Symbols are [a-z0-9]+ by this module's normalization contract
    # (load_merges_file validates the same), so quoting is belt and
    # braces only.
    rows = ", ".join(
        "(CAST({r} AS BIGINT), '{a}', '{b}', CAST({c} AS BIGINT))".format(
            r=r, a=a.replace("'", "''"), b=b.replace("'", "''"), c=c
        )
        for r, a, b, c in learned
    )
    merges = spark.sql(
        f"SELECT * FROM VALUES {rows} "
        "AS t(round, sym_a, sym_b, pair_count)"
    )
    return merges, w


def load_merges_file(path: str) -> list[tuple[str, str]]:
    """Parse a GPT-2-style ``merges.txt``: one ``sym_a sym_b`` pair
    per line in priority order; ``#``-prefixed lines (the
    ``#version:`` header) and blank lines are skipped. This is the
    interop point a production corpus pipeline needs — token budgets
    (docs_budget_selection) are meaningless unless counted under the
    TARGET model's shipped tokenizer, not a corpus-learned one.

    Symbols are validated against this module's normalization
    ([a-z0-9]+, no delimiter char): a merge whose symbols can never
    occur would silently no-op, and a delimiter collision would
    corrupt the symbol-string representation — both are loader
    errors, not data conditions."""
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for ln, raw in enumerate(fh, 1):
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(
                    f"{path}:{ln}: expected 'sym_a sym_b', got {line!r}"
                )
            for sym in parts:
                if not sym or DELIM in sym or not all(
                    c.islower() or c.isdigit() for c in sym
                ):
                    raise ValueError(
                        f"{path}:{ln}: symbol {sym!r} outside the "
                        f"[a-z0-9]+ normalization this tokenizer applies"
                    )
            merges.append((parts[0], parts[1]))
    return merges


def apply_merges(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Replay a SHIPPED merge list over a word-frequency table — the
    encode-under-a-fixed-tokenizer path. Identical per-merge semantics
    to :func:`learn_bpe`'s round merge (two sequential leftmost-non-
    overlap replace passes on the delimited symbol string), but the
    pairs come from a file, so the whole chain is literal narrow maps:
    NO aggregation jobs, no collects, nothing data-derived. A merge
    whose pair never occurs is a no-op, exactly as in GPT-2's encoder
    when a priority rule doesn't fire."""
    w = words
    for a, b in merges:
        pat = F.lit(f"{DELIM}{a}{DELIM}{b}{DELIM}")
        rep = F.lit(f"{DELIM}{a}{b}{DELIM}")
        w = w.withColumn("d", F.replace(F.replace("d", pat, rep), pat, rep))
    return w


def vocab_symbol_counts(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, n_syms) under a SHIPPED merge list, from a bare
    ``word``-column frame (typically a distinct-word vocabulary).
    Same delimited-symbol-string construction and per-merge replay as
    :func:`word_frequency_table` + :func:`apply_merges`, but with no
    corpus frequencies attached — for aggregate consumers (fertility,
    budget screens) that only need symbols-per-word, this keeps the
    merge replay on a vocab-sized frame and skips the corpus-count
    columns entirely."""
    d = F.concat(
        F.regexp_replace(F.col("word"), "(.)", DELIM + "$1"),
        F.lit(DELIM),
    )
    w = apply_merges(words.withColumn("d", d), merges)
    return w.select(
        "word", F.size(_symbols()).cast("bigint").alias("n_syms")
    )


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
    one per-doc aggregation. Out-of-vocabulary words (encoding a LATER
    batch under a previously trained vocab) fall back to character
    tokens — length(word) symbols, exactly what untrained BPE does —
    via a LEFT join, so n_words always counts every word. Documents
    with no [a-z0-9] words keep a row with zero counts.

    Wordless docs are kept by EXPLODE_OUTER over the RAW split array
    (every doc contributes at least one row — empty-string splitter
    artifacts and the NULL row of a null text included), with the
    empty/null screening done in the aggregate's CASE guards instead
    of a pre-filter. Two r13 findings shape this: (a) the old form
    joined the per-doc aggregate BACK to the corpus ids purely to
    resurrect wordless docs — a second corpus scan plus a
    SortMergeJoin (two exchanges + sorts); (b) filtering empties
    inside the array (F.filter) is an interpreted HOF per token,
    while the raw explode + codegen CASE guards keep the whole
    per-row path in whole-stage codegen. Decomposed at x16:
    1.03 s / 5 jobs -> one Generate + broadcast join + ONE agg
    exchange."""
    doc_words = df.select(
        F.col(id_col),
        F.explode_outer(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
        ).alias("word"),
    )
    tok = vocab.select(
        "word", F.size(_symbols()).cast("bigint").alias("__n_syms")
    )
    is_word = F.col("word").isNotNull() & (F.col("word") != "")
    return (
        doc_words.join(tok, "word", "left")
        .withColumn(
            "__n_syms",
            # empty/NULL word rows (splitter artifacts / wordless
            # docs) stay NULL and are skipped by both aggregates
            F.when(
                is_word,
                F.coalesce(
                    F.col("__n_syms"), F.length("word").cast("bigint")
                ),
            ),
        )
        .groupBy(id_col)
        .agg(
            F.sum(F.when(is_word, 1).otherwise(0))
            .cast("bigint")
            .alias("n_words"),
            F.coalesce(F.sum("__n_syms"), F.lit(0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
    )
