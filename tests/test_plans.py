"""Plan-quality regression tests: the physical plans behind the
headline queries must keep predicate pushdown, column pruning, and
broadcast joins (the properties that matter at 100 TB) — `.explain`
as a test, per SURVEY.md's scale mandate."""

from __future__ import annotations

import contextlib
import io

import pytest

from universal_importer_duckdb_spark import entry_queries as eq


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _plan(eq.q1_pricing_summary(spark, sf_dir))
    # (no IsNotNull here: constraint propagation is disabled — see
    # session.py; the user filter itself still reaches the scan)
    assert "LessThanOrEqual(l_shipdate,1998-09-02" in plan
    # projection pruning: the scan must not read the join keys
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_q3_broadcasts_dimension_join(spark, sf_dir):
    plan = _plan(eq.q3_top_unshipped(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(eq.q5_revenue_by_nation(spark, sf_dir))
    # nation/region are hint-broadcast (fixed 25/5 rows); customer is
    # size-selected by the planner — at test SF it still fits under
    # autoBroadcastJoinThreshold, so all three joins broadcast
    assert plan.count("BroadcastHashJoin") >= 3


def test_no_forced_broadcast_on_scaling_tables():
    """Broadcast hints are only safe on fixed-cardinality relations
    (nation=25, region=5, single-row scalar aggregates). customer/
    supplier/part and per-key aggregates grow with SF — a forced hint
    bypasses the size check and OOMs at 100 TB, so those joins must be
    left to AQE + autoBroadcastJoinThreshold."""
    import re
    from pathlib import Path

    # eq is a thin spine since the r7 registry split — scan the
    # chained section modules where the query bodies actually live.
    spine = Path(eq.__file__)
    sources = [spine] + sorted((spine.parent / "registry").glob("*.py"))
    src = "\n".join(p.read_text() for p in sources)
    bad = re.findall(r"F\.broadcast\((?:cust|supp|part|avg_per_part|heavy)\b", src)
    assert bad == [], f"forced broadcast on SF-scaling relations: {bad}"


def test_dedup_single_exchange(spark, sf_dir):
    import re

    plan = _plan(eq.dedup_first_lineitem(spark, sf_dir))
    # exactly one shuffle (hash-partitioned on the dedup keys); the
    # kept-only path uses the window form (measured faster at lineitem's
    # ~12% dup rate), whose 100 TB shape is a map-side WindowGroupLimit
    # (per-partition rank<=1 pre-filter) BEFORE the single exchange
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 1
    assert "WindowGroupLimit" in plan  # map-side pre-filter before shuffle
    assert plan.index("WindowGroupLimit") < plan.index("Exchange")

    # the agg form (dedupe_keep_only) keeps its map-side partial min_by
    # combine — the right shape for duplicate-heavy inputs
    from universal_importer_duckdb_spark.operators.dedup import dedupe_keep_only

    li = eq._t(spark, sf_dir, "lineitem")
    aplan = _plan(
        dedupe_keep_only(li, ["l_partkey", "l_suppkey"], "first", eq.LINEITEM_COLS)
    )
    aexchanges = re.findall(r"^\(\d+\) Exchange", aplan, flags=re.M)
    assert len(aexchanges) == 1
    assert "partial_min_by" in aplan  # map-side combine before shuffle

    # the duplicates-capturing form stays on the window lineage with a
    # map-side WindowGroupLimit ahead of its single exchange
    wplan = _plan(eq.dedup_duplicates_lineitem(spark, sf_dir))
    wexchanges = re.findall(r"^\(\d+\) Exchange", wplan, flags=re.M)
    assert len(wexchanges) == 1
    assert "Window" in wplan


def test_validate_is_shuffle_free(spark, sf_dir):
    plan = _plan(eq.validate_customer_valid(spark, sf_dir))
    assert "Exchange" not in plan  # narrow map over the scan


def test_semi_and_anti_join_strategies(spark, sf_dir):
    semi = _plan(eq.semi_join_open_order_customers(spark, sf_dir))
    anti = _plan(eq.anti_join_customers_no_orders(spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q3_top_unshipped", "top_customers"]
)
def test_no_cartesian_products_in_join_queries(spark, sf_dir, name):
    fn, _ = eq.REGISTRY[name]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_q6_all_filters_pushed_and_pruned(spark, sf_dir):
    plan = _plan(eq.q6_forecast_revenue(spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    # all five predicates reach the parquet scan
    for frag in [
        "GreaterThanOrEqual(l_shipdate,1996-01-01",
        "LessThan(l_shipdate,1997-01-01",
        "GreaterThanOrEqual(l_discount,0.02)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ]:
        assert frag in pushed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # 4-column scan of a 11-col table
    assert "l_tax" not in read_schema


def test_q9_star_joins_all_broadcast(spark, sf_dir):
    plan = _plan(eq.q9_profit_by_nation_year(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan  # fact table never shuffled for a join


def test_q9_fact_scan_pruned_to_measure_inputs(spark, sf_dir):
    # r15 slim-fact contract: the lineitem scan reads ONLY the six
    # source columns the five pre-join int64s derive from — a wider
    # scan would mean the pre-join projection regressed and the fact
    # stream is dragging raw columns through the join shuffles again
    plan = _plan(eq.q9_profit_by_nation_year(spark, sf_dir))
    li_schema = [
        l for l in plan.splitlines()
        if "ReadSchema" in l and "l_partkey" in l
    ][0]
    for col in ("l_partkey", "l_suppkey", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount"):
        assert col in li_schema
    for col in ("l_orderkey", "l_tax", "l_returnflag", "l_linestatus",
                "l_commitdate", "l_receiptdate"):
        assert col not in li_schema


def test_q4_exists_is_broadcast_semi_join(spark, sf_dir):
    plan = _plan(eq.q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_q18_top_k_avoids_global_sort(spark, sf_dir):
    plan = _plan(eq.q18_large_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # per-partition top-k + merge


def test_q22_scalar_threshold_is_broadcast(spark, sf_dir):
    plan = _plan(eq.q22_idle_rich_customers(spark, sf_dir))
    # 1-row aggregate joined via broadcast nested loop, never cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_q2_two_shuffles_window_after_agg(spark, sf_dir):
    import re

    plan = _plan(eq.q2_min_cost_supplier(spark, sf_dir))
    # one shuffle for the (part, supplier) aggregate, one to
    # repartition the reduced frame for the per-part window min; all
    # dimension joins broadcast
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 2
    assert "SortMergeJoin" not in plan


def test_q20_semi_join_broadcasts_aggregated_side(spark, sf_dir):
    """The heavy-shippers side is a per-supplier aggregate: it scales
    with SF, so it carries NO broadcast hint (static plan may show a
    sort-merge semi join — correct at 100 TB). AQE's runtime size
    check converts it to a broadcast semi join while it fits, which
    is what the executed final plan must show at test SF."""
    df = eq.q20_heavy_shippers(spark, sf_dir)
    static = _plan(df)
    assert "LeftSemi" in static
    df.collect()
    final = _plan(df)
    assert "AdaptiveSparkPlan" in final
    assert "BroadcastHashJoin" in final and "LeftSemi" in final


def test_q21_single_pass_no_self_join_shuffle(spark, sf_dir):
    import re

    plan = _plan(eq.q21_waiting_suppliers(spark, sf_dir))
    # the EXISTS/NOT-EXISTS pair is one per-order aggregate, not two
    # lineitem self-joins: exactly the agg shuffle + final groupBy
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) == 2
    assert "Cartesian" not in plan


def test_vocab_topk_no_global_sort(spark, sf_dir):
    plan = _plan(eq.docs_vocab_topk(spark, sf_dir))
    # per-partition top-k + merge, never a full sort of the vocabulary
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_chunk_documents_is_narrow(spark, sf_dir):
    plan = _plan(eq.docs_chunk_for_training(spark, sf_dir))
    assert "Exchange" not in plan  # pure map + bounded explode over the scan


def test_two_phase_cosine_shape(spark, sf_dir):
    plan = _plan(eq.emb_cosine_topk(spark, sf_dir))
    # phase 1 is a JVM zip_with/aggregate double fold over the scan
    # (round-5: no Python worker, no Arrow transfer of the embedding
    # column); both the candidate selection and the exact re-rank are
    # per-partition top-k merges (TakeOrderedAndProject) — the whole
    # query runs with ZERO exchanges and zero Python evals
    assert "Python" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_pii_scrub_is_narrow(spark, sf_dir):
    plan = _plan(eq.docs_pii_scrub(spark, sf_dir))
    # redaction itself is a pure map; the single Exchange is the
    # deliberate spread_for_compute repartition that fans the
    # single-split local file across cores (absent on wide inputs)
    assert plan.count("Exchange") <= 2  # shuffle write+read of ONE repartition
    assert "regexp_extract_all" in plan and plan.count("regexp_extract_all") == 1


def test_benchmark_contamination_broadcasts_bench_side(spark, sf_dir):
    plan = _plan(eq.docs_benchmark_contamination(spark, sf_dir))
    # the benchmark gram set is tiny vs the corpus: it must broadcast
    # so the corpus side never shuffles for the join
    assert "BroadcastHashJoin" in plan


def test_hash_split_and_mixture_are_narrow(spark, sf_dir):
    # split assignment is a pure map (one agg exchange for the counts
    # is the only shuffle); mixture sampling is a pushed-down filter
    from universal_importer_duckdb_spark.operators.corpus import (
        hash_split,
        source_mixture_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Exchange" not in _plan(hash_split(docs))
    assert "Exchange" not in _plan(
        source_mixture_sample(docs, rates={"web": 0.5})
    )


def test_observed_summary_matches_classic(spark, sf_dir):
    """compute_summary='observe' computes the identical funnel from
    ONE action (Observation metric nodes on the single lineage) as the
    classic multi-action summary."""
    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.plans.pipeline import (
        finalize_observed_summary,
        run_pipeline,
    )

    li = eq._t(spark, sf_dir, "lineitem")
    kw = dict(
        source_df=li, today=eq.TODAY, order_cols=eq.LINEITEM_COLS,
    )
    classic = run_pipeline(
        spark, eq.LINEITEM_ENTITY_CONFIG, "lineitem",
        compute_summary=True, **kw,
    ).summary
    res = run_pipeline(
        spark, eq.LINEITEM_ENTITY_CONFIG, "lineitem",
        compute_summary="observe", **kw,
    )
    assert res.summary is None  # zero jobs so far
    res.stage.write.format("noop").mode("overwrite").save()  # THE action
    obs = finalize_observed_summary(res)
    assert (
        obs.total_records, obs.schema_errors, obs.duplicates_removed,
        obs.custom_validation_errors, obs.valid_records,
    ) == (
        classic.total_records, classic.schema_errors,
        classic.duplicates_removed, classic.custom_validation_errors,
        classic.valid_records,
    )
    assert res.summary is obs


@pytest.mark.parametrize(
    "name",
    [
        "docs_containment_pairs",
        "docs_segment_line_dedup",
        "docs_bloom_incremental_dedup",
        "events_funnel_cohorts",
        "emb_knn_join",
        "docs_textrank_keywords",
    ],
)
def test_round6_ops_have_no_cartesian_products(spark, sf_dir, name):
    fn, _ = eq.REGISTRY[name]
    plan = _plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_line_dedup_broadcasts_dup_set_and_funnel_is_two_exchanges(
    spark, sf_dir
):
    import re

    plan = _plan(eq.REGISTRY["docs_segment_line_dedup"][0](spark, sf_dir))
    assert "BroadcastExchange" in plan  # dup-line set broadcast back

    plan = _plan(eq.REGISTRY["events_funnel_cohorts"][0](spark, sf_dir))
    # r9 fix: the old pattern matched the tree header line, which the
    # formatted explain never prints with the partitioning inline —
    # the assertion was vacuously true. Count the Arguments: lines.
    shuffles = re.findall(r"Arguments: hashpartitioning", plan)
    assert 1 <= len(shuffles) <= 2  # user groupBy + cohort groupBy, no more


def test_bloom_probe_broadcasts_bitmap(spark, sf_dir):
    plan = _plan(eq.REGISTRY["docs_bloom_incremental_dedup"][0](spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_admission_funnel_plan_shape(spark, sf_dir):
    """The three-gate funnel (r8): no cartesian anywhere; the quality
    gate stays a JVM literal-map fold (no Python rows beyond the two
    Arrow-batched centroid assignments and the per-cluster prune);
    scans prune to the columns each gate needs."""
    plan = _plan(
        eq.REGISTRY["docs_multisignal_admission"][0](spark, sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    # formatted explain prints each node twice (tree + detail)
    assert plan.count("MapInPandas") == 4  # arriving + at-rest assign
    assert plan.count("FlatMapGroupsInPandas") == 2  # semdedup prune
    # documents scans read only (doc_id, text); the quantize-side
    # embeddings scan must not read the unused label column
    for line in plan.splitlines():
        if "ReadSchema" in line and "documents" not in line:
            assert "label" not in line or "embedding" not in line


def test_cluster_split_and_softdedup_plan_shapes(spark, sf_dir):
    """The r8 cluster consumers: no cartesian, no row-at-a-time
    Python; the split adds NO shuffle beyond the closure (it is a
    narrow map over the cluster frame), and the weights add only the
    size aggregate + join-back exchanges."""
    split_plan = _plan(
        eq.REGISTRY["docs_cluster_aware_split"][0](spark, sf_dir)
    )
    weights_plan = _plan(
        eq.REGISTRY["docs_softdedup_weights"][0](spark, sf_dir)
    )
    for plan in (split_plan, weights_plan):
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
    # hash_split on cluster_id is a pure projection: exchange count
    # must not exceed the bare closure's
    base_plan = _plan(eq.REGISTRY["docs_neardup_clusters"][0](spark, sf_dir))
    assert split_plan.count("Exchange") <= base_plan.count("Exchange")


def test_corpus_card_plan_shape(spark, sf_dir):
    """The r9 card rewrite: exactly two hash exchanges (the
    (source, fp) pre-agg and the per-source rollup), no
    countDistinct Expand, no range exchange for the n_sources-row
    ordering, and the scan pruned to the three columns the card
    reads."""
    import re

    plan = _plan(eq.REGISTRY["docs_corpus_card"][0](spark, sf_dir))
    assert "Expand" not in plan
    assert "rangepartitioning" not in plan
    # formatted explain prints each Exchange's partitioning on its
    # Arguments: line — count those, not the tree headers
    shuffles = re.findall(r"Arguments: hashpartitioning", plan)
    assert len(shuffles) == 2, plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("text", "source", "n_chars"):
        assert col in read_schema
    assert "doc_id" not in read_schema


def test_selfdup_spans_plan_shape(spark, sf_dir):
    """Exact-substring self-dedup, the r10 skew-hardened shape: the
    earliest-holder verdict is a map-side-combinable
    ``groupBy(gram).agg(min)`` joined back — NEVER a window over the
    gram (a hot gram would become one giant sorted single-task group
    at corpus scale, r9 verdict #4). The positioned stream is
    scoped-cached so tokenize+md5 materializes once for both
    branches (one parquet scan), and the only window specs left are
    the per-document island merge."""
    import re

    df = eq.REGISTRY["docs_selfdup_spans"][0](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # exactly ONE distinct scan node (both branches read the shared
    # InMemoryRelation; the tree header may reference it twice)
    scan_nodes = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scan_nodes) == 1, plan
    assert "InMemoryTableScan" in plan  # shared positioned stream
    assert "partial_min" in plan  # map-side combine on the gram agg
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "gram" not in line, line  # windows are doc-side only
    # r11: the join-back's verdict side carries only CROSS-DOC-SHARED
    # grams (min holder != max holder — a single-holder gram can
    # never mark a span), small enough that AQE converts the
    # join-back to a broadcast at runtime: the positional probe
    # stream is never exchanged
    df.count()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in executed, executed
    assert "SortMergeJoin" not in executed, executed


def test_sign_hamming_plan_stays_jvm_side(spark, sf_dir):
    """Binary-sign ANN: the signature fold and Hamming filter are
    pure column expressions — no Python evaluation of any kind in
    the plan — and the top-candidates select is a takeOrdered, not a
    global sort exchange."""
    plan = _plan(eq.REGISTRY["emb_sign_hamming_topk"][0](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_langid_plan_broadcasts_profile_no_cartesian(spark, sf_dir):
    """Rank-profile language ID: the algebraic absent-trigram penalty
    means NO doc x language cross product; the vocab-bounded profile
    broadcasts to the match join."""
    plan = _plan(eq.REGISTRY["docs_langid_trigram_rank"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan


def test_langid_scoring_is_shuffle_free(spark, sf_dir):
    """r10 scale shape: the per-doc profile is computed map-side
    (sorted-array RLE + top-n, all bound lambdas), so SCORING ships no
    corpus exchange at all — the only hash exchange in the executed
    plan is the registry's spread repartition; the gain aggregate and
    the argmin window both reuse its doc_id partitioning (subset
    clustering), and the argmin lowers to WindowGroupLimit."""
    df = eq.REGISTRY["docs_langid_trigram_rank"][0](spark, sf_dir)
    df.count()  # materialize the profile checkpoint: plan = scoring only
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    hash_exchanges = re.findall(r"Exchange hashpartitioning[^\n]*", plan)
    assert len(hash_exchanges) == 1, hash_exchanges
    assert "REPARTITION" in hash_exchanges[0]
    assert "WindowGroupLimit" in plan
    # the per-row expression tree evaluates each intermediate once:
    # exactly two array_sorts (trigram sort + top-n sort), not the
    # 19 the collapsed-projection form re-ran
    assert plan.count("array_sort") == 2, plan.count("array_sort")


def test_bigram_lm_plan_shape(spark, sf_dir):
    """CCNet-style LM scoring: the held bit table broadcasts (the
    measured BROADCAST_VOCAB_ROWS gate — a checkpointed artifact has
    no catalog stats for AQE), the whole fold stays JVM-side, and the
    corpus pays exactly one hash exchange (spread; the per-doc sum
    reuses the spread partitioning via map-side combine)."""
    import re

    plan = _plan(eq.REGISTRY["docs_bigram_lm_bits"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    scan_nodes = re.findall(r"^\(\d+\) Scan parquet", plan, re.MULTILINE)
    assert len(scan_nodes) == 1, plan  # artifact is checkpointed


def test_ingest_novelty_plan_shape(spark, sf_dir):
    """Novelty scoring keeps the self-dedup family's skew contract:
    the at-rest index is a map-side-combined DISTINCT (partial agg on
    the gram), membership is a join — never a window over the gram
    key — and nothing leaves the JVM."""
    plan = _plan(eq.REGISTRY["docs_ingest_novelty"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "gram" not in line, line


def test_hll_vocab_plan_shape(spark, sf_dir):
    """HLL batch entry: one corpus-scale hash exchange total (the
    map-side-combined distinct of (source, k) feeding both branches
    through the scoped cache) beyond the spread repartition; the
    register fold shows a partial_max (the monoid that makes it
    map-side-combinable), and nothing leaves the JVM."""
    import re

    df = eq.REGISTRY["docs_hll_vocab"][0](spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial_max" in plan
    # both branches read the scoped-cached distinct frame, and the
    # docstring's "one corpus-scale hash exchange total" is asserted
    # on the EXECUTED plan (the r10 advice: the old regex was vacuous
    # given the partial_max assertion above): materialize once, then
    # the only exchanges keyed on the token column k are the cached
    # distinct's own (inside the InMemoryTableScan subtree, counted
    # once however many branches read it) — everything downstream is
    # source-keyed on <= n_sources * 256 register rows.
    df.count()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in executed, executed
    # every token-keyed (k#) exchange must live INSIDE the cached
    # relation's stored plan — i.e. have an InMemoryRelation ancestor
    # in the rendered tree. After the one materialization, the
    # consuming query reads cached blocks and re-executes none of
    # them: the corpus-scale exchange runs once, ever.
    lines = executed.splitlines()

    def depth(line: str) -> int:
        m = re.search(r"[^\s:+*-]", line)
        return m.start() if m else len(line)

    for i, ln in enumerate(lines):
        if "Exchange hashpartitioning" not in ln or not re.search(
            r"hashpartitioning\([^)]*\bk#", ln
        ):
            continue
        d = depth(ln)
        anc = []
        for j in range(i - 1, -1, -1):
            dj = depth(lines[j])
            if dj < d:
                anc.append(lines[j])
                d = dj
        assert any("InMemoryRelation" in a or "InMemoryTableScan" in a
                   for a in anc), ln


def test_source_gram_overlap_plan_shape(spark, sf_dir):
    """Cross-source overlap: the gram-keyed collect_set fold is the
    ONLY corpus-scale exchange (partial_collect_set runs map-side),
    pair expansion happens in expressions (no gram-keyed self-join),
    and the per-source totals join broadcasts."""
    import re

    plan = _plan(eq.REGISTRY["docs_source_gram_overlap"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "partial_collect_set" in plan
    assert "SortMergeJoin" not in plan  # totals joins broadcast
    assert "BroadcastHashJoin" in plan


def test_ingest_drift_plan_shape(spark, sf_dir):
    """Drift monitoring: both sides are Arrow argmin maps against the
    closure-held centroids (exactly two MapInPandas nodes, no
    JVM<->Python row loop) and the per-cluster aggregates
    partial-combine map-side. (The final full-outer join of the two
    k-row aggregates may sort-merge — k rows, irrelevant at any
    scale.)"""
    import re

    plan = _plan(eq.REGISTRY["emb_ingest_drift"][0](spark, sf_dir))
    nodes = re.findall(r"^\(\d+\) MapInPandas", plan, flags=re.M)
    assert len(nodes) == 2, plan
    assert "BatchEvalPython" not in plan
    assert "partial_count" in plan or "partial_sum" in plan
    assert "CartesianProduct" not in plan
