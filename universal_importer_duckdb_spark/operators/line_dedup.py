"""Line-level (Falcon-style) corpus deduplication.

Doc-level dedup (exact/MinHash/SimHash in ``dedup_text``) removes
whole documents; web corpora additionally carry boilerplate *lines*
(nav bars, cookie banners, footers) repeated across many otherwise
distinct pages. The RefinedWeb/Falcon recipe removes any line whose
exact text occurs in >= k documents, then keeps the document with the
surviving lines re-joined. Reference anchor: none — the reference
(main.py:188-240) stops at row-level dedup; this is north-star scope
for the 100 TB training-data pipeline.

Scale shape: one corpus shuffle to count distinct docs per line
(map-side combinable), then the per-document duplicate-line sets are
built by joining the exploded lines against the (small) duplicated-
line set and aggregating ONLY the matched rows — shuffle volume is
proportional to the duplicate rate, not the corpus. Reassembly is
pure array expressions on the original row (filter + array_join); no
posexplode/regroup, no Python, and documents never shuffle.

Broadcast size gate (r6 verdict watch item): neither the duplicated-
line set nor the per-doc hit table is force-broadcast. A 100 TB web
corpus can have 10^8+ distinct boilerplate lines — an unconditional
``F.broadcast`` would OOM the driver. Both joins are declarative and
AQE's ``spark.sql.autoBroadcastJoinThreshold`` (default 10 MB) is the
gate: below it the runtime converts the exchange to a broadcast join
(the bench path — boilerplate sets are tiny at test SFs), above it
they stay shuffle joins keyed on line / doc id. Both paths emit
identical rows (tests/test_round7_ops.py exercises both).

The splitter is pluggable: real corpora split on newline
(``newline_lines``); the test corpus is single-line space-separated
text, so ``word_segments`` fabricates fixed-width word segments (the
same dedup algebra at a sub-line granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def newline_lines(text: Column) -> Column:
    """Default splitter: physical lines."""
    return F.split(text, "\n")


def word_segments(text: Column, width: int = 10) -> Column:
    """Fixed-width word-window splitter for single-line corpora:
    tokens [i*width, (i+1)*width) re-joined with spaces. The trailing
    partial segment is kept (slice truncates identically in Spark and
    DuckDB)."""
    from universal_importer_duckdb_spark.operators.text_analysis import (
        _bind,
    )

    def _segs(toks):
        n_seg = F.ceil(F.size(toks) / F.lit(width)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(
                F.slice(toks, i * width + 1, width), " "
            ),
        )

    # bind the split ONCE per row — captured in the lambda it would
    # re-split the document once per segment (O(n²/width); the
    # lm.py::_bigrams bug class, found by the r12 scale probe)
    return _bind(F.split(text, " "), _segs)


def line_level_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_dup_docs: int = 2,
    splitter=newline_lines,
    joiner: str = " ",
) -> DataFrame:
    """Remove lines occurring in >= min_dup_docs distinct documents.

    Returns one row per input document:
    ``(id, n_lines, n_removed, clean_text)`` where clean_text is the
    surviving lines in original order joined by ``joiner``. Empty
    lines are never counted as duplicates and are always dropped from
    the reassembled text (they carry no content either way).
    """
    from universal_importer_duckdb_spark.caching import scoped_cache

    segs = splitter(F.coalesce(F.col(text_col), F.lit("")))
    # cached: the segmented array feeds the dup-set count, the per-doc
    # hit aggregation, and the reassembly projection; uncached, the
    # splitter would re-run per consumer
    base = scoped_cache(
        docs.select(
            F.col(id_col),
            F.filter(segs, lambda s: s != "").alias("__ne"),
        )
    )

    lines = base.select(F.col(id_col), F.explode("__ne").alias("line"))
    # Duplicate-line set: an aggregation (map-side combinable — for
    # the common k=2 threshold "in >= 2 docs" is min(id) != max(id),
    # no count-distinct expansion) filtered down to just the
    # boilerplate lines.
    if min_dup_docs <= 2:
        seen = lines.groupBy("line").agg(
            (F.min(id_col) != F.max(id_col)).alias("__d")
        )
    else:
        seen = lines.groupBy("line").agg(
            (F.countDistinct(id_col) >= min_dup_docs).alias("__d")
        )
    dup = seen.filter("__d").select("line")

    # Per-document duplicate-line sets: only (doc, line) pairs that
    # actually match a duplicated line survive the join, so this
    # aggregation shuffles a volume proportional to the duplicate
    # rate. AQE picks broadcast vs shuffle for both joins (module
    # docstring). collect_set is safe: a document's duplicate lines
    # are a subset of its own segments — bounded by document size.
    hits = (
        lines.join(dup, "line")
        .groupBy(id_col)
        .agg(F.collect_set("line").alias("__dl"))
    )

    # Reassembly never shuffles documents: one left join against the
    # (duplicate-rate-sized) hit table, then pure array expressions —
    # filter preserves original segment order.
    keep = F.when(
        F.col("__dl").isNull(), F.col("__ne")
    ).otherwise(
        F.filter(
            F.col("__ne"), lambda s: ~F.array_contains(F.col("__dl"), s)
        )
    )
    return base.join(hits, id_col, "left").select(
        F.col(id_col),
        F.size("__ne").cast("bigint").alias("n_lines"),
        (F.size("__ne") - F.size(keep)).cast("bigint").alias("n_removed"),
        F.array_join(keep, joiner).alias("clean_text"),
    )


def intradoc_segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    splitter=newline_lines,
    joiner: str = " ",
) -> DataFrame:
    """WITHIN-document line dedup: keep only the first occurrence of
    each line/segment inside a single document (repeated in-page
    boilerplate — nav blocks, pagination footers, scraped-template
    repetition). The intra-document counterpart of
    :func:`line_level_dedup`'s cross-document pass; training-data
    pipelines typically run both.

    Scale shape: a pure narrow map — ``array_distinct`` keeps the
    first occurrence of each segment in original order, so the whole
    operator is per-row array expressions with NO shuffle, no state,
    and no Python. At 100 TB this runs at scan speed fused into
    whatever stage reads the text.

    Same output contract as line_level_dedup:
    ``(id, n_lines, n_removed, clean_text)``; empty segments are
    dropped from both the count and the reassembled text.
    """
    segs = splitter(F.coalesce(F.col(text_col), F.lit("")))
    ne = F.filter(segs, lambda s: s != "")
    kept = F.array_distinct(ne)
    return docs.select(
        F.col(id_col),
        F.size(ne).cast("bigint").alias("n_lines"),
        (F.size(ne) - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, joiner).alias("clean_text"),
    )
