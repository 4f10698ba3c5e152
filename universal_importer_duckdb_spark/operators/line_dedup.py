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
(map-side combinable), the duplicated-line set broadcast back
(boilerplate is a tiny fraction of distinct lines), then a
dirty/clean split — documents carrying NO duplicated line (the large
majority) are rebuilt from their in-row segment array with pure array
expressions and never shuffled again; only the dirty minority pays
the posexplode -> flag -> ordered-regroup reassembly. No Python in
the path.

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
    toks = F.split(text, " ")
    n_seg = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(toks, i * width + 1, width), " "
        ),
    )


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
    # Dirty/clean split: most documents contain NO boilerplate line
    # (measured 22% dirty at sf0.1), so only the dirty minority pays
    # the explode -> flag -> regroup reassembly; clean documents are
    # rebuilt from their in-row segment array with pure array
    # expressions — no second corpus-wide exchange. Both paths emit
    # the same expressions (non-empty count, join of surviving
    # segments in order), so the split is invisible in the output.
    from universal_importer_duckdb_spark.caching import scoped_cache

    segs = splitter(F.coalesce(F.col(text_col), F.lit("")))
    # cached: the segmented array feeds three consumers (dup-set
    # counting, the clean-side anti-join, the dirty-side reassembly);
    # uncached, the splitter would re-run per consumer
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
    # boilerplate lines — a tiny fraction of distinct lines —
    # and broadcast back.
    if min_dup_docs <= 2:
        seen = lines.groupBy("line").agg(
            (F.min(id_col) != F.max(id_col)).alias("__d")
        )
    else:
        seen = lines.groupBy("line").agg(
            (F.countDistinct(id_col) >= min_dup_docs).alias("__d")
        )
    dup = seen.filter("__d").select("line")

    dirty_ids = (
        lines.join(F.broadcast(dup), "line").select(id_col).distinct()
    )

    clean_out = base.join(F.broadcast(dirty_ids), id_col, "left_anti").select(
        id_col,
        F.size("__ne").cast("bigint").alias("n_lines"),
        F.lit(0).cast("bigint").alias("n_removed"),
        F.array_join("__ne", joiner).alias("clean_text"),
    )

    d_lines = (
        base.join(F.broadcast(dirty_ids), id_col, "left_semi")
        .select(F.col(id_col), F.posexplode("__ne").alias("pos", "line"))
        .join(
            F.broadcast(dup.withColumn("__dup0", F.lit(True))),
            "line",
            "left",
        )
        .withColumn("__dup", F.coalesce("__dup0", F.lit(False)))
    )
    dirty_out = d_lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.count(F.when(F.col("__dup"), 1)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("__dup"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            joiner,
        ).alias("clean_text"),
    )
    return clean_out.unionByName(dirty_out)
