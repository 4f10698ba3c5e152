"""Standing stage-by-stage decomposition tool (r12, verdict #4 —
formerly tools/decompose_r11.py) — the docs_corpus_card precedent:
every adjudication note in tools/bench_report.py:NOTES must be backed
by a measurement, and this script IS the measurement. Run it on the
bench host; it prints one JSON block per requested entry.

Protocol matches bench.py: warm each plan shape at sf0.001 first,
clearCache + release_scoped before each measured family, 5 runs per
stage, min AND median reported, noop sink. Per-run Spark JOB COUNTS
are recorded via job groups — the scheduling-floor adjudications
(docs_bpe_learn_merges, docs_dsir_resample) are claims about
job count x ~0.1-0.3 s/job, so the count is the evidence.

Usage:
    python tools/decompose.py                 # every registered entry
    python tools/decompose.py NAME [NAME...]  # just those entries
    python tools/decompose.py --list          # registered entry names
SPARK_GRAFT_SF_DIR overrides the measured dataset (default sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# runnable as `python tools/decompose.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARM = "/root/testdata/sf0.001"

# entry name -> decomposer(ctx) -> {stage: measurement}; registration
# order is run order. A decomposer measures the full registry entry
# plus the cumulative plan prefixes that explain where its time goes.
DECOMPOSERS: dict[str, object] = {}


def decomposer(name):
    def register(fn):
        DECOMPOSERS[name] = fn
        return fn

    return register


class Ctx:
    """Everything a decomposer needs: the session, the registry, and
    the bench measurement protocol."""

    def __init__(self, spark, queries, sf_dir):
        self.spark = spark
        self.q = queries
        self.sf_dir = sf_dir

    def t(self, d, name="documents"):
        return self.spark.read.parquet(f"{d}/{name}.parquet")

    def measure(self, name, build_fn, runs=5):
        """bench.py's protocol for one plan shape, plus job counting."""
        from universal_importer_duckdb_spark.caching import release_scoped

        spark = self.spark
        try:
            build_fn(WARM).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        release_scoped(spark)
        spark.catalog.clearCache()
        df = build_fn(self.sf_dir)
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

    def measure_entry(self, entry_name, label=None):
        return self.measure(
            label or entry_name,
            lambda d: self.q[entry_name](self.spark, d),
        )


@decomposer("docs_source_gram_overlap")
def _ov(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.corpus import (
        word_ngrams_hashed,
    )
    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )

    def ov_scan(d):
        return word_ngrams_hashed(
            spread_for_compute(ctx.t(d), "doc_id"), 8, "text", "source"
        )

    def ov_fold(d):
        return ov_scan(d).groupBy("gram").agg(
            F.array_sort(F.collect_set("source")).alias("__ss")
        )

    return {
        "scan_tokenize_gram_explode": ctx.measure("ov_scan", ov_scan),
        "plus_collect_set_exchange": ctx.measure("ov_fold", ov_fold),
        "full_entry": ctx.measure_entry("docs_source_gram_overlap", "ov_full"),
    }


@decomposer("docs_selfdup_spans")
def _sd(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.corpus import (
        _gram64,
        positioned_ngrams,
    )
    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )

    def sd_pos(d):
        return positioned_ngrams(
            spread_for_compute(ctx.t(d), "doc_id"), 8, "text", "doc_id",
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
            .select(
                "doc_id", F.col("i").alias("s"), (F.col("i") + 7).alias("e")
            )
        )

    return {
        "tokenize_hash_map_only": ctx.measure("sd_pos", sd_pos),
        "plus_gram_exchange_min": ctx.measure("sd_firsts", sd_firsts),
        "plus_join_back_no_cache": ctx.measure("sd_hits", sd_hits),
        "full_entry_cached_fanout": ctx.measure_entry(
            "docs_selfdup_spans", "sd_full"
        ),
        "full_excision_entry": ctx.measure_entry(
            "docs_selfdedup_text", "sdt_full"
        ),
    }


@decomposer("docs_segment_line_dedup")
def _seg(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.line_dedup import (
        word_segments,
    )

    def seg_explode(d):
        segs = word_segments(F.coalesce(F.col("text"), F.lit("")), 10)
        return ctx.t(d).select(
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

    return {
        "segment_explode_map_only": ctx.measure("seg_explode", seg_explode),
        "plus_dupline_count_exchange": ctx.measure("seg_counts", seg_counts),
        "full_entry": ctx.measure_entry("docs_segment_line_dedup", "seg_full"),
    }


@decomposer("docs_bigram_lm_bits")
def _lm(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )
    from universal_importer_duckdb_spark.operators.lm import (
        _bigrams,
        bigram_lm_artifact,
    )

    # the artifact is held (localCheckpoint at construction); the
    # timed plan is explode_outer bigrams + broadcast bit-table lookup
    # + per-doc agg. Stages: map-only explode / + broadcast join /
    # full (adds the per-doc agg, which reuses the spread
    # partitioning map-side).
    def lm_base(d):
        return spread_for_compute(ctx.t(d), "doc_id")

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

    return {
        "bigram_explode_map_only": ctx.measure("lm_explode", lm_explode),
        "plus_broadcast_bit_lookup": ctx.measure("lm_joined", lm_joined),
        "full_entry": ctx.measure_entry("docs_bigram_lm_bits", "lm_full"),
    }


@decomposer("docs_bpe_learn_merges")
def _bpe(ctx):
    # the claim is a multi-job scheduling floor — record the job
    # count and the time (held-artifact serve)
    return {
        "full_entry": ctx.measure_entry("docs_bpe_learn_merges", "bpe_full"),
    }


@decomposer("docs_dsir_resample")
def _dsir(ctx):
    # the r11 adjudication is the per-run job count x scheduling
    # floor; the job count in full_entry's measurement is the
    # evidence (verdict r12 #3 watches it round-over-round)
    return {
        "full_entry": ctx.measure_entry("docs_dsir_resample", "dsir_full"),
    }


@decomposer("emb_hard_negatives")
def _ehn(ctx):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.similarity import (
        _hyperplanes,
        bucket_signature,
    )

    # r12 kernel form (the pre-r12 JVM stages — payload struct +
    # bucket_pairs expansion + interpreted HOF sifts — were replaced
    # after the scale probe measured them data-proportional, exp
    # 0.90). Stages now mirror operators/similarity.py::
    # hard_negative_pairs: (1) the map-only signature select; (2) +
    # the one bucket exchange feeding an Arrow-batched per-bucket
    # BLAS kernel (measured here with a count-only kernel body, so
    # the stage isolates scan + exchange + Arrow transfer + X@X.T
    # without survivor serialization); (3) the full entry, adding
    # survivor output + the order-defined JVM exact re-score +
    # deterministic top-k (TakeOrderedAndProject).
    planes = _hyperplanes(6, 64, 42)

    def hn_map(d):
        return ctx.t(d, "embeddings").select(
            F.col("vec_id").alias("__id"),
            F.col("label").alias("__lab"),
            F.col("embedding").cast("array<double>").alias("__v"),
            bucket_signature("embedding", planes).alias("__bucket"),
        )

    def hn_kernel(d):
        # the PRODUCTION kernel, wrapped to emit only the survivor
        # count (r12 advice: a hand-rolled copy here lacked the
        # per-length grouping — ragged buckets raised instead of
        # mirroring the drop contract — and hard-coded the 500 cap;
        # inspecting the entry's defaults keeps probe and entry in
        # lockstep). The stage still isolates scan + exchange +
        # Arrow transfer + X@X.T without survivor serialization.
        import inspect

        from universal_importer_duckdb_spark.operators.similarity import (
            _bucket_presift_kernel,
            hard_negative_pairs,
        )

        sig = inspect.signature(hard_negative_pairs).parameters
        presift = _bucket_presift_kernel(
            0.3 - 1e-9,
            sig["max_bucket_size"].default,
            with_labels=True,
        )

        def count_sift(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": [len(presift(pdf))]})

        return (
            hn_map(d)
            .groupBy("__bucket")
            .applyInPandas(count_sift, "n long")
        )

    return {
        "signature_map_only": ctx.measure("hn_map", hn_map),
        "plus_exchange_and_blas_kernel": ctx.measure(
            "hn_kernel", hn_kernel
        ),
        "full_entry_topk": ctx.measure_entry("emb_hard_negatives", "hn_full"),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--list" in sys.argv:
        print("\n".join(DECOMPOSERS))
        return 0
    unknown = [a for a in args if a not in DECOMPOSERS]
    if unknown:
        print(f"unknown entries: {unknown}; --list shows registered",
              file=sys.stderr)
        return 2
    names = args or list(DECOMPOSERS)

    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.range(1000).count()

    ctx = Ctx(spark, eq.queries(), sf_dir)
    out = {name: DECOMPOSERS[name](ctx) for name in names}
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
