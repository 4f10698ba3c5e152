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



@decomposer("docs_bpe_token_counts")
def _bpetc(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.bpe import (
        learn_bpe,
        word_frequency_table,
    )
    from universal_importer_duckdb_spark.registry.advanced import (
        N_BPE_MERGES,
    )

    # r12 watch item (x16 2.39x, exp 0.52): where does the encode
    # spend — the corpus word stream, the memoized-vocab REPLAY plan
    # (re-executed per run: the vocab DataFrame embeds the full merge
    # replay over the corpus frequency table), or the join+agg?
    def word_stream(d):
        return (
            ctx.t(d)
            .select(
                "doc_id",
                F.explode(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                ).alias("word"),
            )
            .filter(F.col("word") != "")
        )

    def vocab_plan(d):
        _, vocab = learn_bpe(
            word_frequency_table(ctx.t(d)), n_merges=N_BPE_MERGES
        )
        return vocab

    return {
        "word_stream_map_only": ctx.measure("bpetc_words", word_stream),
        "vocab_replay_plan": ctx.measure("bpetc_vocab", vocab_plan),
        "full_entry_join_agg": ctx.measure_entry(
            "docs_bpe_token_counts", "bpetc_full"
        ),
    }


@decomposer("docs_tokenizer_fertility")
def _fert(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.bpe import (
        load_merges_file,
        vocab_symbol_counts,
    )
    from universal_importer_duckdb_spark.registry.advanced import (
        _SHIPPED_MERGES_PATH,
    )

    # r12 watch item (x16 2.20x, same family as bpe_token_counts):
    # stage the (source, word) count exchange vs the merge replay on
    # the distinct-word vocabulary vs the full join+per-source agg.
    def sw(d):
        return (
            ctx.t(d)
            .select(
                "source",
                F.explode(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+")
                ).alias("word"),
            )
            .filter(F.col("word") != "")
            .groupBy("source", "word")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )

    def replay(d):
        merges = load_merges_file(_SHIPPED_MERGES_PATH)
        return vocab_symbol_counts(sw(d).select("word").distinct(), merges)

    return {
        "source_word_counts_exchange": ctx.measure("fert_sw", sw),
        "plus_distinct_and_merge_replay": ctx.measure("fert_replay", replay),
        "full_entry": ctx.measure_entry(
            "docs_tokenizer_fertility", "fert_full"
        ),
    }


@decomposer("lineitem_content_checksum")
def _cksum(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )

    # r12 watch item (x16 2.95x; DuckDB's vectorized md5 is flat):
    # is the cost the pre-hash ROW EXCHANGE (spread_for_compute
    # repartitions the raw rows because the single-file testdata
    # parquet arrives as one split), the per-row md5+conv map, or the
    # final commutative aggregate? The no-spread twin quantifies what
    # the exchange buys at each scale.
    def _c(col):
        return F.coalesce(col.cast("string"), F.lit("\u2400"))

    def canon_h(li):
        canon = F.concat_ws(
            "|",
            _c(F.col("l_orderkey")),
            _c(F.col("l_partkey")),
            _c(F.col("l_suppkey")),
            _c(F.col("l_linenumber")),
            _c(F.col("l_quantity").cast("decimal(15,2)")),
            _c(F.col("l_extendedprice").cast("decimal(15,2)")),
            _c(F.col("l_returnflag")),
            _c(F.col("l_linestatus")),
            _c(F.col("l_shipdate")),
        )
        return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast(
            "bigint"
        )

    def spread_only(d):
        return spread_for_compute(ctx.t(d, "lineitem")).select("l_orderkey")

    def hash_spread(d):
        li = spread_for_compute(ctx.t(d, "lineitem"))
        return li.select(canon_h(li).alias("__h"))

    def hash_no_spread(d):
        li = ctx.t(d, "lineitem")
        return li.select(canon_h(li).alias("__h"))

    return {
        "spread_exchange_only": ctx.measure("ck_spread", spread_only),
        "plus_md5_map": ctx.measure("ck_hash", hash_spread),
        "md5_map_no_spread": ctx.measure("ck_hash_nospread", hash_no_spread),
        "full_entry_agg": ctx.measure_entry(
            "lineitem_content_checksum", "ck_full"
        ),
    }



@decomposer("q1_pricing_summary")
def _qclass(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.functions.fixed_point import (
        scaled,
    )
    from universal_importer_duckdb_spark.registry.core import (
        _fx_disc_f4,
        _fx_ext2,
        _fx_tax_f4,
    )

    # r12 verdict #7: the q-class final adjudication — name the Spark
    # constant at scale. Stages split the entry into (a) pure scan +
    # pushed filter (scan setup + task scheduling only, zero
    # arithmetic), (b) + the scaled-int64 measure map (adds the
    # whole-stage-codegen per-row arithmetic), (c) the full entry
    # (adds the ONE partial+final agg exchange). All three reuse the
    # same DataFrame across runs, so codegen compiles once — the
    # steady-state gap between stages is data work, and stage (a)'s
    # steady-state time IS the scheduling + scan-setup constant the
    # floor adjudication names. Job counts recorded per stage.
    cutoff = F.lit("1998-09-02 00:00:00").cast("timestamp")

    def q1_scan_only(d):
        return (
            ctx.t(d, "lineitem")
            .filter(F.col("l_shipdate") <= cutoff)
            .select(F.lit(1).alias("one"))
        )

    def q1_measure_map(d):
        li = ctx.t(d, "lineitem").filter(F.col("l_shipdate") <= cutoff)
        return li.select(
            "l_returnflag",
            "l_linestatus",
            scaled("l_quantity", 2).alias("q2"),
            _fx_ext2().alias("e2"),
            (_fx_ext2() * _fx_disc_f4()).alias("d6"),
            (_fx_ext2() * _fx_disc_f4() * _fx_tax_f4()).alias("c10"),
        )

    return {
        "q1_scan_filter_only": ctx.measure("q1_scan", q1_scan_only),
        "q1_plus_measure_map": ctx.measure("q1_map", q1_measure_map),
        "q1_full_entry_one_exchange": ctx.measure_entry(
            "q1_pricing_summary", "q1_full"
        ),
    }


@decomposer("q9_profit_by_nation_year")
def _q9(ctx):
    from pyspark.sql import functions as F

    # same adjudication protocol for the join-heavy q-class shape:
    # (a) bare 4-table join tree with no arithmetic (scan + broadcast
    # builds + join probes), (b) the full entry (adds measure map +
    # the one agg exchange). NOTE: the joins-only tree is kept at the
    # r14 topology (fact probes nation directly) so historical
    # decomposition rows stay comparable; the r15 entry pre-joins
    # nation dim-side and probes only twice (registry/breadth.py).
    def q9_joins_only(d):
        li = ctx.t(d, "lineitem")
        part = ctx.t(d, "part")
        supp = ctx.t(d, "supplier")
        nation = ctx.t(d, "nation")
        return (
            li.join(part, li.l_partkey == part.p_partkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .join(
                F.broadcast(nation),
                F.col("s_nationkey") == nation.n_nationkey,
            )
            .select(F.lit(1).alias("one"))
        )

    return {
        "q9_join_tree_only": ctx.measure("q9_joins", q9_joins_only),
        "q9_full_entry": ctx.measure_entry(
            "q9_profit_by_nation_year", "q9_full"
        ),
    }



@decomposer("docs_corpus_prep")
def _cprep(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.text_analysis import (
        quality_filter,
    )

    # r13: the bound-gate fix cleared docs_quality_filter_ids (probe
    # 0.39x at x16) but corpus_prep still reads 3.15x — which of the
    # chain's three stages owns the residual: the gate scan, the
    # md5-dedup exchange (shuffles the surviving TEXT bytes), or the
    # final bound-tokenize aggregate?
    def kept_only(d):
        kept, _ = quality_filter(
            ctx.t(d), min_tokens=10, min_alpha_ratio=0.5,
            max_digit_ratio=0.3, min_unique_token_ratio=0.1,
        )
        return kept.select("doc_id")

    def plus_dedup(d):
        kept, _ = quality_filter(
            ctx.t(d), min_tokens=10, min_alpha_ratio=0.5,
            max_digit_ratio=0.3, min_unique_token_ratio=0.1,
        )
        return (
            kept.withColumn("__fp", F.md5(F.lower("text")))
            .groupBy("__fp")
            .agg(F.min_by("text", "doc_id").alias("text"))
            .select(F.length("text").alias("n"))
        )

    return {
        "gate_scan_only": ctx.measure("cprep_gate", kept_only),
        "plus_md5_dedup_exchange": ctx.measure("cprep_dedup", plus_dedup),
        "full_entry_token_totals": ctx.measure_entry(
            "docs_corpus_prep", "cprep_full"
        ),
    }



@decomposer("q18_large_orders")
def _q18(ctx):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.functions.fixed_point import (
        FixedSum,
        fixed_point_agg,
        scaled,
    )

    # r13: where do the ~0.9 s at x16 go — the 9.6M-row scan + qty
    # map, the order-key agg exchange (2.4M groups), or the join-back
    # + top-k?
    def q18_scan(d):
        return ctx.t(d, "lineitem").select(
            F.col("l_orderkey"), scaled("l_quantity", 2).alias("q2")
        )

    def q18_agg(d):
        return fixed_point_agg(
            ctx.t(d, "lineitem").select(
                F.col("l_orderkey").alias("big_okey"), "l_quantity"
            ),
            ["big_okey"],
            sums=[FixedSum("sum_qty", scaled("l_quantity", 2), 2,
                           direct=True)],
        ).filter(F.col("sum_qty") > 250)

    return {
        "scan_qty_map_only": ctx.measure("q18_scan", q18_scan),
        "plus_orderkey_agg_having": ctx.measure("q18_agg", q18_agg),
        "full_entry_joins_topk": ctx.measure_entry(
            "q18_large_orders", "q18_full"
        ),
    }


@decomposer("pipeline_flagship")
def _flagship(ctx):
    # r15: the bench's biggest line (1.4-2.1 s min at sf0.1) with a
    # FLAT scale exponent (-0.02) — i.e. nearly all fixed cost. Where:
    # plan construction (bench.py rebuilds the lineage every run),
    # the validate map, the dedup window exchange+sort, or the rule
    # filter? Stage prefixes + a bench-parity loop that separates
    # plan-build time from execution.
    from universal_importer_duckdb_spark.config.schema_compiler import (
        compile_schema,
    )
    from universal_importer_duckdb_spark.operators.dedup import dedupe_cascade
    from universal_importer_duckdb_spark.operators.rules import (
        execute_custom_validations,
    )
    from universal_importer_duckdb_spark.operators.validate import (
        validate_dataframe,
    )
    from universal_importer_duckdb_spark.registry.core import (
        LINEITEM_COLS,
        LINEITEM_ENTITY_CONFIG,
        TODAY,
    )

    details = LINEITEM_ENTITY_CONFIG["transformations_config"]["lineitem"]
    schema_cfg = details["validations"]["schema"]["fields"]
    rules = details["validations"]["custom"]["rules"]

    def scan_only(d):
        return ctx.t(d, "lineitem")

    def valid_only(d):
        schema = compile_schema(schema_cfg)
        valid, _err = validate_dataframe(ctx.t(d, "lineitem"), schema)
        return valid

    def plus_dedup(d):
        kept, _ = dedupe_cascade(
            valid_only(d), [["l_partkey", "l_suppkey"]], "first", LINEITEM_COLS
        )
        return kept

    def full_stage(d):
        kept, _ = execute_custom_validations(
            plus_dedup(d), rules, mode="skip", today=TODAY
        )
        return kept

    out = {
        "scan_only": ctx.measure("flag_scan", scan_only),
        "validate_map_only": ctx.measure("flag_validate", valid_only),
        "plus_dedup_window": ctx.measure("flag_dedup", plus_dedup),
        "plus_rules_full_stage": ctx.measure("flag_full", full_stage),
        "full_entry_prebuilt_plan": ctx.measure_entry(
            "pipeline_flagship", "flag_entry"
        ),
    }
    # bench-parity loop: rebuild the plan every run, timing the Python/
    # py4j/analysis plan-construction slice separately from the action
    q = ctx.q["pipeline_flagship"]
    samples, build = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        df = q(ctx.spark, ctx.sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
        build.append(t1 - t0)
    out["bench_parity_rebuild_each_run"] = {
        "min": round(min(samples), 3),
        "median": round(statistics.median(samples), 3),
        "plan_construction_min": round(min(build), 3),
        "plan_construction_median": round(statistics.median(build), 3),
    }
    return out


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
