"""Stage-by-stage decomposition of the r10 verdict's unexplained >2x
entries (Next-round #3/#4/#6) — the docs_corpus_card precedent: every
adjudication note in tools/bench_report.py:NOTES must be backed by a
measurement, and this script IS the measurement (run it on the bench
host; it prints one JSON block per entry).

Protocol matches bench.py: warm each plan shape at sf0.001 first,
clearCache + release_scoped before each measured family, 5 runs per
stage, min AND median reported, noop sink. Per-run Spark JOB COUNTS
are recorded via job groups — the scheduling-floor adjudications
(docs_bpe_learn_merges) are claims about job count x ~0.1-0.3 s/job,
so the count is the evidence.

Usage: python tools/decompose_r11.py   (SPARK_GRAFT_SF_DIR to override)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# runnable as `python tools/decompose_r11.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(spark, name, build_fn, warm_dir, sf_dir, runs=5):
    """bench.py's protocol for one plan shape, plus job counting."""
    from universal_importer_duckdb_spark.caching import release_scoped

    try:
        build_fn(warm_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
    release_scoped(spark)
    spark.catalog.clearCache()
    df = build_fn(sf_dir)
    samples, n_jobs = [], None
    sc = spark.sparkContext
    for i in range(runs):
        group = f"decomp_{name}_{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        n_jobs = len(jobs)  # steady-state count = last run's
    return {
        "min": round(min(samples), 3),
        "median": round(statistics.median(samples), 3),
        "runs": [round(s, 3) for s in samples],
        "n_jobs_last_run": n_jobs,
    }


def main() -> int:
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = "/root/testdata/sf0.001"
    spark = get_spark(app_name="decompose_r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).count()

    def t(d, name="documents"):
        return spark.read.parquet(f"{d}/{name}.parquet")

    q = eq.queries()
    out = {}

    # ---- docs_source_gram_overlap: scan+fold floor vs pair expansion
    from universal_importer_duckdb_spark.operators.corpus import (
        _gram64,
        positioned_ngrams,
        word_ngrams_hashed,
    )
    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )

    def ov_scan(d):
        return word_ngrams_hashed(
            spread_for_compute(t(d), "doc_id"), 8, "text", "source"
        )

    def ov_fold(d):
        return ov_scan(d).groupBy("gram").agg(
            F.array_sort(F.collect_set("source")).alias("__ss")
        )

    out["docs_source_gram_overlap"] = {
        "scan_tokenize_gram_explode": _measure(
            spark, "ov_scan", ov_scan, warm, sf_dir
        ),
        "plus_collect_set_exchange": _measure(
            spark, "ov_fold", ov_fold, warm, sf_dir
        ),
        "full_entry": _measure(
            spark,
            "ov_full",
            lambda d: q["docs_source_gram_overlap"](spark, d),
            warm,
            sf_dir,
        ),
    }

    # ---- self-dedup pair: tokenize+hash / +exchange / +join-back /
    # +island merge (verdict #6's prescribed cut)
    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_duplicate_spans,
        merge_token_spans,
    )

    def sd_pos(d):
        return positioned_ngrams(
            spread_for_compute(t(d), "doc_id"), 8, "text", "doc_id",
            hasher=_gram64,
        )

    def sd_firsts(d):
        return sd_pos(d).groupBy("gram").agg(F.min("doc_id").alias("__first"))

    def sd_hits(d):
        pos = sd_pos(d)
        firsts = pos.groupBy("gram").agg(F.min("doc_id").alias("__first"))
        return (
            pos.join(firsts, "gram")
            .filter(F.col("__first") < F.col("doc_id"))
            .select("doc_id", F.col("i").alias("s"), (F.col("i") + 7).alias("e"))
        )

    out["docs_selfdup_spans"] = {
        "tokenize_hash_map_only": _measure(spark, "sd_pos", sd_pos, warm, sf_dir),
        "plus_gram_exchange_min": _measure(
            spark, "sd_firsts", sd_firsts, warm, sf_dir
        ),
        "plus_join_back_no_cache": _measure(
            spark, "sd_hits", sd_hits, warm, sf_dir
        ),
        "full_entry_cached_fanout": _measure(
            spark,
            "sd_full",
            lambda d: q["docs_selfdup_spans"](spark, d),
            warm,
            sf_dir,
        ),
        "full_excision_entry": _measure(
            spark,
            "sdt_full",
            lambda d: q["docs_selfdedup_text"](spark, d),
            warm,
            sf_dir,
        ),
    }

    # ---- docs_segment_line_dedup: explode / +count exchange / full
    from universal_importer_duckdb_spark.operators.line_dedup import (
        word_segments,
    )

    def seg_explode(d):
        segs = word_segments(F.coalesce(F.col("text"), F.lit("")), 10)
        return t(d).select(
            F.col("doc_id"),
            F.explode(F.filter(segs, lambda s: s != "")).alias("line"),
        )

    def seg_counts(d):
        # the k=2 min!=max form line_level_dedup actually runs
        return (
            seg_explode(d)
            .groupBy("line")
            .agg((F.min("doc_id") != F.max("doc_id")).alias("__d"))
            .filter("__d")
        )

    out["docs_segment_line_dedup"] = {
        "segment_explode_map_only": _measure(
            spark, "seg_explode", seg_explode, warm, sf_dir
        ),
        "plus_dupline_count_exchange": _measure(
            spark, "seg_counts", seg_counts, warm, sf_dir
        ),
        "full_entry": _measure(
            spark,
            "seg_full",
            lambda d: q["docs_segment_line_dedup"](spark, d),
            warm,
            sf_dir,
        ),
    }

    # ---- docs_bigram_lm_bits: the artifact is held (localCheckpoint
    # at construction); the timed plan is explode_outer bigrams +
    # broadcast bit-table lookup + per-doc agg. Stages: map-only
    # explode / + broadcast join / full (adds the per-doc agg, which
    # reuses the spread partitioning map-side).
    from universal_importer_duckdb_spark.operators.lm import (
        _bigrams,
        bigram_lm_artifact,
    )

    def lm_base(d):
        return spread_for_compute(t(d), "doc_id")

    def lm_explode(d):
        return lm_base(d).select(
            F.col("doc_id"), F.explode_outer(_bigrams("text")).alias("b")
        ).select("doc_id", "b.w1", "b.w2")

    lm_art = {}

    def lm_joined(d):
        if d not in lm_art:
            lm_art[d] = bigram_lm_artifact(
                lm_base(d), is_target=F.col("source") == "src0"
            )
        return lm_explode(d).join(F.broadcast(lm_art[d]), ["w1", "w2"], "left")

    out["docs_bigram_lm_bits"] = {
        "bigram_explode_map_only": _measure(
            spark, "lm_explode", lm_explode, warm, sf_dir
        ),
        "plus_broadcast_bit_lookup": _measure(
            spark, "lm_joined", lm_joined, warm, sf_dir
        ),
        "full_entry": _measure(
            spark,
            "lm_full",
            lambda d: q["docs_bigram_lm_bits"](spark, d),
            warm,
            sf_dir,
        ),
    }

    # ---- docs_bpe_learn_merges: the claim is a multi-job scheduling
    # floor — record the job count and the time (held-artifact serve)
    out["docs_bpe_learn_merges"] = {
        "full_entry": _measure(
            spark,
            "bpe_full",
            lambda d: q["docs_bpe_learn_merges"](spark, d),
            warm,
            sf_dir,
        ),
    }

    # ---- docs_dsir_resample: record the run spread under the new
    # median regime (verdict #7)
    out["docs_dsir_resample"] = {
        "full_entry": _measure(
            spark,
            "dsir_full",
            lambda d: q["docs_dsir_resample"](spark, d),
            warm,
            sf_dir,
        ),
    }

    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
