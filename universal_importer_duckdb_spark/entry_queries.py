"""The driver-contract query registry: every operator from SURVEY.md
§2 plus the LLM-data-pipeline extensions, each as a (spark_fn,
oracle_sql) pair. The query/oracle definitions live in the chained
section modules under ``registry/`` (core -> breadth -> advanced;
split r7 for maintainability, no behavior change); this spine
re-exports the full namespace, owns the driver-facing ``queries()``
/ ``oracle_sql()`` API, and holds the window roster that rotates
driver correctness coverage each round. The cross-engine
determinism rules are documented in ``registry/core.py``.
"""

from __future__ import annotations

from universal_importer_duckdb_spark.registry.advanced import *  # noqa: F401,F403


def queries():
    from universal_importer_duckdb_spark.plancache import prepared_registry

    return prepared_registry(
        {name: fn for name, (fn, _) in REGISTRY.items()}
    )


def oracle_sql():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}



# ======================================================================
# Registry finalization: rotate driver-coverage through the window
# ======================================================================
# The driver's correctness gate checks a fixed-size (50) prefix of the
# registry in insertion order. Rounds 1-3 spent that window on the same
# core+bench set, leaving 27 oracle-backed entries locally verified
# (tests/test_oracle_parity.py at sf0.001/sf0.01) but never
# driver-confirmed. Round 4 rotates: the never-driver-checked entries
# sort FIRST, then the previously-green rows fill the remaining slots,
# then rows-only entries. This takes ever-driver-checked coverage to
# 85/85 across rounds without dropping any oracle. Relative order
# within each group is preserved (sorted() is stable).

# oracle-backed entries with no driver-hard check in rounds 1-3
# (VERDICT.md r3 "What's missing" item 3), plus the round-4 additions:
# entries that JUST gained an oracle (portable minhash/simhash, LSH
# ANN hyperplane replay, real-codec multimodal) have never had a hard
# check either, so they take window slots ahead of already-green rows
# Round-5 window roster: the driver hard-checks the FIRST 50 registry
# entries each round, so ordering is the rotation mechanism. After r4
# every entry has been driver-checked at least once; the goal is now
# RECENCY — every entry re-confirmed against freshly regenerated
# testdata within ~2 rounds. This roster = the 42 entries NOT in r4's
# window (r1-r3-era checks + the new streaming near-dup entry) plus
# the 8 r4-checked queries whose implementation changed this round
# (chunking text materialization, fused pii, cache->localCheckpoint in
# minhash/training pipeline, simhash refactor, codec rewrites).
# Roster history: r4 = the 37 never-checked + 13 fillers (recorded in
# VERDICT r4); r5 = this list (docs_token_stats, docs_bpe_token_count
# and projection_alias_orders demoted to r6 with the q6/q18 group —
# r1-r3 green, trivial narrow maps, locally re-verified — and
# rollup_revenue and events_tumbling_hourly (r4-window green,
# unchanged; the latter's streaming twin stays in-window) to make
# room for the late-round-5 entries docs_domain_cap /
# docs_stratified_sample / docs_char_trigram_familiarity, which have
# never been driver-checked).
#
# Round-6 roster: cleared BOTH r5 debts — the 5 entries that
# had never seen a driver hash-check, and the full r6-demoted set
# promised in the r5 comments — plus the round's own changes: the
# new shipped-tokenizer entry, the 3 re-cast oracles (the r5 HUGEINT
# hash-fails), the NOT EXISTS incremental-dedup oracle, and every
# query whose physical plan changed (spread_for_compute scans,
# unique_buckets pair generation, per-vector norm folds).
# Result: 49/50 green; the one red (orders_snapshot_drift) was a
# decimal-vs-float64 hasher-type mismatch, re-cast this round.
#
# Round-7 roster: cleared the never-checked backlog (11 entries), the
# r6-demoted set, every r7-changed entry, the nine r7-born operators,
# and 10 staleness fillers — after r7, all 165 entries had been
# driver-checked at least once (47/50 green; the emb_pq_codes red was
# the array<int> canonicalizer crash, fixed this round).
#
# Round-8 roster (below), honoring the r7 tail comment:
#  1. Every entry whose implementation or oracle changed this round:
#     the PQ/IVF family (integer-k-means rewrite — emb_pq_codes /
#     emb_pq_adc_topk / emb_ivf_topk now carry full value-hash
#     oracles for the first time; their hash-green here retires the
#     rows-only class), the DSIR pair (artifact restructure), and the
#     four decontamination/collocation/fertility perf rewrites.
#  2. The FULL 32-entry r4-era staleness backlog named by the r7
#     comment — the oldest driver certifications on the board.
#  3. 9 r5-era fillers, prioritized by touched-module risk: the
#     multimodal feature pair (decode_media sniff hardened r8), the
#     BPE pair (bpe.py gained vocab_symbol_counts r8),
#     emb_quantize_int8 (similarity.py rewritten r8), plus
#     pipeline_flagship and the MinHash/SimHash/cluster dedup family.
#  4. The four r8-born entries (emb_kmeans_clusters,
#     stream_dsir_scores, docs_fuzzy_benchmark_contamination,
#     docs_corpus_card) take the last slots so the registry keeps
#     zero never-checked entries; to make room, four r5-era entries
#     move to the r9 head: docs_simhash_neardup /
#     docs_neardup_clusters / docs_minhash_lsh_neardup (the MinHash
#     pipeline is nevertheless driver-exercised this round THROUGH
#     docs_fuzzy_benchmark_contamination, which wraps the identical
#     portable pipeline) and pipeline_flagship (e2e-tested locally
#     every session).
#  Late-r8 amendment: the session added a seventh/eighth r8-born
#  entry (events_heavy_hitters_cms / stream_heavy_hitters_cms — the
#  count-min sketch family); to keep zero never-checked entries they
#  take the multimodal feature pair's slots. That pair is SAFE to
#  demote: the r8 decode_media hardening only touches the raw
#  Annex-B/video routing, and the WAV/PNG magic-byte sniffs those
#  two entries exercise run before it — both r7-green and locally
#  parity-green. They join the displaced set at the r9 head.
#  Second late-r8 amendment: a ninth r8-born entry, emb_semdedup
#  (SemDeDup semantic pruning), takes emb_quantize_int8's slot —
#  safe to demote because similarity.py's r8-changed paths
#  (int-kmeans training/assign) are already exercised in-window by
#  the kmeans/IVF/PQ entries, while the int8 quantize path itself is
#  untouched this round and r5-green + locally parity-green. It
#  joins the displaced set at the r9 head.
#  Third late-r8 amendment: the session also added
#  emb_incremental_semdedup and stream_semdedup_ingest (SemDeDup
#  admission control + streaming twin). The r8 window is full and
#  its 32-slot r4-era staleness backlog is the round's explicit
#  gate, so these two are the FIRST intentionally-unchecked births
#  since r4 — they lead the r9 roster (before the displaced set)
#  and are locally parity-green at sf0.001/sf0.01 plus pinned by
#  tests/test_round8_ops.py brute-force + stream-equality checks.
#
#  Fourth late-r8 amendment: docs_multisignal_admission and
#  stream_multisignal_admission (the three-gate admission funnel
#  composing the fingerprint, shipped-quality, and SemDeDup gates,
#  plus its ingest-time twin with the documented index-only exact
#  gate), docs_cluster_aware_split (the leakage-free
#  cluster-inherited split remediating what the audit detects), and
#  docs_softdedup_weights (reciprocal-family soft-dedup loss weights)
#  are the third through SIXTH intentionally-unchecked r8 births,
#  same reasoning and same local evidence class (sf0.001+sf0.01
#  parity green, gate-conjunction / stream-equality /
#  never-straddles / family-weight tests in
#  tests/test_round8_ops.py). They join the two above at the r9 head.
#
#  The remaining r5-era entries (after the SIX unchecked r8 births
#  above and then the seven displaced ones, in that order) fill the
#  r9 roster:
#  emb_incremental_semdedup, stream_semdedup_ingest,
#  docs_multisignal_admission, stream_multisignal_admission,
#  docs_cluster_aware_split, docs_softdedup_weights,
#  docs_simhash_neardup, docs_neardup_clusters,
#  docs_minhash_lsh_neardup, pipeline_flagship,
#  multimodal_audio_features, multimodal_image_features,
#  emb_quantize_int8,
#  docs_bpe_token_counts (displaced by the fifth r8-born entry
#  docs_shuffle_shards; its sibling docs_bpe_learn_merges stays
#  in-window and exercises the same changed module),
#  approx_distinct_customers_monthly, docs_benchmark_contamination,
#  docs_char_trigram_familiarity, docs_chunk_for_training,
#  docs_corpus_assembly_pipeline, docs_domain_cap, docs_hash_split,
#  docs_pii_scrub, docs_priority_sample, docs_repetition_signals,
#  docs_source_mixture, docs_stratified_sample, docs_tokens_udtf,
#  docs_training_pipeline, events_changelog_state,
#  events_merge_upsert_state, events_resample_interpolate,
#  events_retention_cohorts, events_robust_outliers,
#  events_scd2_history, events_transition_matrix,
#  orders_data_profile, orders_grouping_sets,
#  orders_quantile_envelope, orders_zorder_codes, part_fuzzy_matches,
#  stream_click_purchase_join, stream_incremental_upsert_state,
#  stream_session_windows, stream_simhash_neardup_dedup.
# Round-9 roster: delivered as promised — 50/50 green in
# CORRECTNESS_r09 (the six unchecked r8 births certified first, the
# displaced eight, the two r9-changed, the r5-era staleness block,
# and all seven r9 births with day-one driver checks). Full r9
# roster text: git show 928f4c0:universal_importer_duckdb_spark/
# entry_queries.py lines 170-289.
#
# Round-10 roster (below) — exactly what the r9 tail comment and
# VERDICT.md Next-round #5 promised:
#  1. The seven promised leaders: the r8-churned similarity.py four
#     displaced by the late-r9 amendments (emb_hard_negatives — also
#     the standing perf-adjudication watch item, emb_semdedup_clusters,
#     emb_cosine_topk, emb_knn_join) and the three oldest
#     certifications on the board, demoted late-r9 with documented
#     proxies (docs_hash_split, docs_benchmark_contamination,
#     events_merge_upsert_state — all r5).
#  2. The five entries whose kernels changed in r10, so they
#     re-certify (the emb_semdedup precedent: verdicts unchanged,
#     kernel changed):
#     - emb_sign_hamming_topk + emb_matryoshka_recall (ragged-row
#       guards per the r10 advice; verdicts on well-formed corpora
#       unchanged);
#     - docs_selfdup_spans + docs_selfdedup_text +
#       docs_incremental_selfdup_spans (skew-hardened earliest-holder
#       verdict: groupBy+join replaces the gram window; the at-rest
#       gram index is now distinct — order-free verdicts, physical
#       shape changed).
#  3. The r6-era staleness block fills the remaining 38 slots. Two of
#     the 40 r6-era candidates are displaced to make room for the five
#     re-certifications above — dedup_duplicates_lineitem and
#     dedup_last_lineitem, the SAFEST demotions on the board: their
#     siblings dedup_first_lineitem / dedup_exclude_all_lineitem /
#     dedup_cascade_lineitem stay IN-window this round and exercise
#     the identical operators/dedup.py:39,72 window/cascade kernels,
#     and both are bench-exercised every round and locally
#     parity-green this session. They LEAD the r11 roster, ahead of
#     whatever r10 leaves at r7-era staleness.
#  Late-r10 amendment: three births — docs_bigram_lm_bits (CCNet-style
#  bigram-LM bits-per-token quality filter, integer floor-log2
#  surprisal), stream_lm_bits (its stateless ingest twin), and
#  docs_ingest_novelty (unseen-gram fraction of arrivals against the
#  at-rest gram index) — take the slots of three more r6-era fillers
#  so the registry keeps zero never-checked entries. The demotions
#  are SAFE, each with an in-window sibling on the same kernel:
#  docs_quality_filter_ids (docs_quality_scores stays in-window —
#  same heuristic-score module, the filter entry only thresholds it),
#  pipeline_summary_observed_lineitem (pipeline_summary_lineitem
#  stays — same operators/summary.py kernel, observed variant), and
#  stream_sliding_halfhour (stream_tumbling_hourly AND
#  events_tumbling_hourly stay — same streaming windowed-agg kernel,
#  sliding vs tumbling spec). All three are locally parity-green this
#  session and join the two dedup demotions at the r11 head.
#  Second late-r10 amendment: two more births — docs_hll_vocab and
#  stream_hll_vocab (deterministic HyperLogLog per-source vocabulary
#  cardinality, the sketch pair's second half next to the CMS) — and
#  two re-certifications: docs_langid_trigram_rank +
#  stream_langid_scores, whose kernel changed this round (the per-doc
#  profile moved map-side as bound-lambda RLE and langid_profile now
#  counts from per-doc RLE pairs; verdicts unchanged, physical shape
#  changed — the same precedent as the self-dedup trio above). Four
#  more r6-era fillers are displaced, each with an in-window sibling
#  on the same kernel: dedup_exclude_all_lineitem (dedup_first_
#  lineitem and dedup_cascade_lineitem stay — same operators/dedup.py
#  window kernel), rule_age_gte_invalid_orders (rule_age_gte_skip_
#  orders stays — same rules.py age_gte kernel, mode flag apart),
#  docs_keyword_search_topk (docs_hybrid_search_rrf stays and
#  COMPOSES the identical BM25 scorer), and events_tumbling_hourly
#  (stream_tumbling_hourly stays — same tumbling windowed-agg spec,
#  streaming twin of the same GROUP BY). All four are locally
#  parity-green this session and join the r11 head queue.
#  Third late-r10 amendment: docs_source_gram_overlap (cross-source
#  shared-gram / milli-Jaccard duplication forensics) is born after
#  the window amendments settled; rather than churn a fifth demotion
#  it is an intentionally-unchecked birth on the late-r8 precedent —
#  locally parity-green at sf0.001/sf0.01 (bit-exact, non-vacuous:
#  25/23 pairs) and unit-pinned; it leads the r11 roster ahead of the
#  demotion queue. emb_ingest_drift (per-cluster embedding drift at
#  ingest, at-rest-trained) is the same class of late birth — locally
#  parity-green at sf0.001/sf0.01 with the full training replayed in
#  its oracle, planted-shift unit test — and joins it at the r11
#  head, together with its streaming twin stream_ingest_drift
#  (bounded n_clusters-row state; drained == batch, same oracle,
#  locally parity-green at both sfs).
# Round-10 window: delivered 50/50 green in CORRECTNESS_r10. Full
# r10 roster text: git show 14bf145:universal_importer_duckdb_spark/
# entry_queries.py (the _R10_WINDOW tuple).
#
# Round-11 roster (below) — exactly what the r10 tail comments and
# VERDICT.md r10 Next-round #1 promised:
#  1. The three never-driver-certified late-r10 births lead:
#     docs_source_gram_overlap, emb_ingest_drift, stream_ingest_drift
#     (after r11 the board returns to ZERO never-certified entries).
#  2. The full 9-entry r6-era demotion queue the r10 comments
#     committed: dedup_duplicates_lineitem, dedup_last_lineitem,
#     dedup_exclude_all_lineitem, docs_quality_filter_ids,
#     pipeline_summary_observed_lineitem, stream_sliding_halfhour,
#     rule_age_gte_invalid_orders, docs_keyword_search_topk,
#     events_tumbling_hourly — after these, nothing on the board is
#     older than r7.
#  3. The entries whose kernels changed in r11, so they re-certify:
#     docs_incremental_selfdup_spans + docs_ingest_novelty (now probe
#     the HELD at-rest gram index — corpus.py::gram_index(held=True),
#     the r10-verdict like-for-like bench fix; verdicts unchanged,
#     physical shape changed) and docs_bpe_learn_merges (the merge
#     table serves as a JVM VALUES LocalRelation instead of a
#     Python-local frame — identical rows, new serving plan), plus
#     docs_bpe_token_counts as touched-module risk coverage (bpe.py
#     changed; its own vocab path is untouched).
#     Late-r11 amendment: docs_selfdup_spans + docs_selfdedup_text
#     join the changed set — the earliest-holder join-back now builds
#     against only CROSS-DOC-SHARED grams (min != max holder; AQE
#     broadcasts the shrunken verdict side, eliminating the
#     probe-side exchange — verdicts unchanged, physical shape
#     changed, the r10 skew-hardening precedent). They take the slots
#     of two r7-era fillers with the strongest in-window sibling
#     coverage: docs_bpe_token_count (docs_bpe_token_counts — the
#     r11 touched-module re-cert — and docs_shipped_tokenizer_counts
#     r10 pin the same token-count kernels) and events_funnel_cohorts
#     (stream_funnel_cohorts stays IN-window and shares the
#     identical funnel kernel AND oracle SQL). Both displaced entries
#     are locally parity-green every session and join the r12 head
#     queue behind the seven below.
#  4. The r7-era staleness block fills the remaining 34 slots. Seven
#     of the 41 r7-era candidates are displaced to make room and LEAD
#     the r12 roster — each a narrow map or an entry whose kernel
#     stays in-window through a sibling, all locally parity-green
#     every session via tests/test_oracle_parity.py:
#     projection_alias_orders (trivial rename projection, demoted on
#     this rationale before), like_filter_parts (single LIKE filter),
#     sql_passthrough_revenue (SQL passthrough of the q1 kernel —
#     q1_pricing_summary stays in-window), rollup_revenue
#     (cube_revenue r8 + orders_grouping_sets r9 exercise the same
#     grouping-sets kernel), docs_token_stats (docs_shipped_tokenizer_
#     counts r10 + docs_bpe_token_count in-window share the token-
#     counting kernels), q6_forecast_revenue (single filter-agg,
#     bench-exercised at sf0.1 every round), and q4_order_priority
#     (EXISTS semi-join — semi_join_open_order_customers r8 pins the
#     same kernel).
# Round-11 window: delivered 50/50 green in CORRECTNESS_r11 (zero
# never-certified entries remain; nothing older than r7 after it).
# Full r11 roster text: git show 1c9c1b3:universal_importer_duckdb_
# spark/entry_queries.py (the _R11_WINDOW tuple).
#
# Round-12 roster (below) — exactly what the r11 tail comments and
# VERDICT.md r11 Next-round #1 committed, plus the changed-kernel
# re-certs this round produced:
#  1. The 9-entry r12 head queue leads (the seven r7-era fillers the
#     r11 amendments displaced, plus the two late-r11 displacements):
#     projection_alias_orders, like_filter_parts,
#     sql_passthrough_revenue, rollup_revenue, docs_token_stats,
#     q6_forecast_revenue, q4_order_priority, docs_bpe_token_count,
#     events_funnel_cohorts. After these, nothing on the board is
#     older than r8. (docs_bpe_token_count doubles as the
#     touched-module risk cover for the r12 bpe.py input guards,
#     the r11 precedent.)
#  2. Entries whose kernels or schemas changed in r12, so they
#     re-certify (the r11 changed-set norm): docs_hll_vocab +
#     stream_hll_vocab (new hll_corrected_milli column — the
#     LinearCounting small-range correction, literals shared with
#     the extended oracle) and emb_hard_negatives (pre-shuffle
#     spread removed after the r12 decomposition showed it was half
#     the entry; 3 -> 2 jobs, one hash exchange, plan-pinned).
#     docs_dsir_resample also changed (totals branch folded into the
#     scoring pass, 9 -> 6 jobs) but is r8-era and sits in the
#     cohort below.
#  3. The r8-era staleness cohort fills the remaining slots (the
#     largest block, last checked r8 — the r11 verdict's named
#     next-debt; 35 slots after the late-r12 amendment in item 4).
#     Twelve of the 47 r8-era entries are displaced to make room for
#     the head queue arithmetic and the changed-kernel re-certs
#     above; they LEAD the r13 roster — each
#     a narrow map or an entry whose kernel stays in-window through
#     a sibling, all locally parity-green every session via
#     tests/test_oracle_parity.py:
#     validate_customer_valid (validate_customer_errors in-window —
#     same validate pass, complementary split), stream_heavy_hitters_
#     cms (events_heavy_hitters_cms in-window — same CMS kernel AND
#     the same oracle SQL), stream_dsir_scores (docs_dsir_importance
#     + docs_dsir_resample in-window pin the DSIR scoring kernels;
#     its drain loop is unchanged since r8), distinct_segments
#     (trivial DISTINCT projection), in_subquery_sql (single
#     IN-subquery; semi_join_open_order_customers in-window pins the
#     semi-join kernel), union_all_key_space (single UNION ALL;
#     except_customers_without_orders in-window pins the set-op
#     kernel), string_functions_customers (narrow map of string
#     builtins), top_customers (single orderBy+limit —
#     TakeOrderedAndProject pinned in test_plans.py; benched at
#     sf0.1 every round), and rank_customers_by_segment (single
#     window rank; window_analytics_orders in-window pins the window
#     kernel).
#  4. Late-r12 amendment (the r11 "late-amendment" precedent): the
#     scale probe falsified docs_bigram_lm_bits's floor adjudication
#     and found the lambda-capture re-tokenization bug, whose fix
#     touches lm.py, line_dedup.py, textrank.py, and
#     text_analysis.char_trigrams. One changed-kernel re-cert per
#     touched module joins the window — docs_bigram_lm_bits (lm),
#     docs_segment_line_dedup (line_dedup; covers the intradoc +
#     cascade siblings), docs_langid_trigram_rank (char_trigrams) —
#     with docs_top_collocations already in-window covering
#     textrank.py. Three more r8-era entries are displaced to make
#     room and join the r13 head with sibling rationale:
#     cube_revenue (rollup_revenue in-window pins the grouping-sets
#     kernel), q14_promo_revenue (seven q-class siblings in-window),
#     and intersect_multi_status_customers
#     (except_customers_without_orders in-window pins the set-op
#     kernel). All three locally parity-green at both SFs this
#     session.
#  5. Second late-r12 amendment: quality_model.py changed (the
#     InSet-prefiltered weight fold measured 2.3x on x16 data, and
#     the (n_words, raw) pair now evaluates one bound struct instead
#     of tokenizing twice), so docs_corpus_card (the fused-aggregate
#     consumer form, its own per-row stage also rebuilt on the bound
#     bundle) and docs_shipped_quality (the per-doc scorer form; its
#     streaming twin shares the identical kernel) join the window.
#     Displaced with sibling rationale: q19_disjunctive_revenue
#     (eight q-class siblings remain in-window) and fk_orphan_orders
#     (anti_join_customers_no_orders in-window pins the anti-join
#     kernel). Both locally parity-green at both SFs this session.
#     r13 must take these 14 displaced entries first, then start the
#     r9-era cohort (42 entries — the next-largest staleness block).
#  6. Committed r13 OPTIMIZATION queue (deferred r12 with rationale —
#     two roster amendments already displace five r8-era entries, and
#     the staleness burn outranks more churn; each of these is the
#     r12 finding-class applied to a sibling, mechanical, and needs
#     its changed-kernel window slot when taken):
#     (a) port embedding_near_pairs to the shared per-bucket BLAS
#         pre-sift kernel (hard_negative_pairs r12 precedent) —
#         re-cert emb_near_dup_pairs + its cluster consumer;
#     (b) bind the sibling-tokenize expressions in
#         text_analysis.quality_signals and docs_corpus_prep's final
#         aggregate (each references its token array in 3-5 sibling
#         expressions, re-tokenizing per reference; probe rows for
#         docs_corpus_prep record the current exponents 0.46/0.24) —
#         re-cert docs_quality_filter_ids, docs_corpus_prep,
#         docs_training_pipeline.
# Round-13 roster (below) — exactly what the r12 tail comments and
# VERDICT r12 prescriptions 1-3 committed to:
#  1. The 14-entry r8-era head queue leads (the twelve + three-minus-
#     one displaced by the two late-r12 amendments; each was locally
#     parity-green every session with an in-window sibling pinning
#     its kernel — see the r12 item-3/4/5 comments above for the
#     per-entry rationale). After this burn NOTHING on the board is
#     older than r9.
#  2. Changed-kernel re-certs for the r13 work, one per consumer
#     shape:
#     - emb_near_dup_pairs (embedding_near_pairs ported to the
#       shared per-bucket BLAS pre-sift kernel — committed queue
#       item (a); also carries the null-vector/null-label advice
#       fixes shared with hard_negative_pairs),
#     - emb_semdedup_clusters (the ported kernel's cluster consumer),
#     - emb_hard_negatives (shares _bucket_presift_kernel, whose
#       null handling changed),
#     - emb_bucket_audit (NEW birth with a day-one oracle: the "no
#       silent caps" corpus accounting for the LSH bucket cap —
#       VERDICT r12 prescription 5),
#     - docs_quality_filter_ids + docs_corpus_prep (queue item (b):
#       the quality gate is now one lambda-bound predicate and the
#       corpus totals one bound tokenize; plan-pinned in
#       tests/test_lambda_binding.py),
#     - docs_training_pipeline + docs_corpus_assembly_pipeline (the
#       two composed-pipeline consumers of quality_filter — both
#       also r9-era, so they double as staleness burn).
#  3. The r9-era staleness cohort fills the remaining 28 slots (the
#     next-largest block, 41 entries last checked r9). Eleven are
#     displaced by the head-queue arithmetic and LEAD the r14
#     roster, each with an in-window sibling pinning its kernel:
#     docs_minhash_lsh_neardup + docs_neardup_clusters (both kernels
#     replayed verbatim inside in-window docs_training_pipeline, and
#     the clusters machinery again in emb_semdedup_clusters),
#     docs_chunk_for_training (chunk_documents replayed inside
#     docs_training_pipeline), emb_semdedup + emb_incremental_
#     semdedup + stream_semdedup_ingest (the ported near-pairs
#     kernel is in-window via emb_near_dup_pairs/emb_semdedup_
#     clusters; the incremental form is also benched at sf0.1 every
#     round), stream_multisignal_admission (batch twin in-window),
#     stream_simhash_neardup_dedup (batch twin docs_simhash_neardup
#     in-window), multimodal_audio_features (shares the decode_media
#     sniff/codec plumbing with in-window multimodal_image_features),
#     stream_incremental_upsert_state (events_changelog_state
#     in-window pins the changelog-state kernel family), and
#     docs_stratified_sample (the seeded hash-sampling family is
#     in-window via docs_priority_sample + docs_source_mixture).
#     All eleven stay locally parity-green at both SFs via
#     tests/test_oracle_parity.py. r14 must take these first, then
#     the r10-era cohort (41 entries).
# Round-14 roster (below) — exactly what the r13 tail comment and
# VERDICT r13 prescription 2 committed to, with the cohort recount
# the verdict demanded:
#  1. The 11 r9-era displacements LEAD (each was parity-green every
#     session with an in-window r13 sibling pinning its kernel — see
#     the r13 item-3 comment above for the per-entry rationale).
#     After this burn nothing on the board is older than r10.
#  2. Changed-kernel re-certs for the r14 work, one per consumer
#     shape:
#     - q3_top_unshipped (join-order rewrite: pruned dimension side
#       builds first, scaled-revenue-int64 payload pre-join, agg
#       rides the join partitioning — x64 4.07 -> 3.55 s),
#     - q1_pricing_summary + q5_revenue_by_nation + q18_large_orders
#       (the r14 advice fix tightened scaled()'s cheap-path guard to
#       limit-0.5 — every scaled() consumer's plan changed by that
#       constant; the q-class entries are the four hottest consumers
#       and stand for the family),
#     - docs_corpus_assembly_pipeline (benchmark_ngram_overlap now
#       routes through the Arrow gram kernel; its other consumer
#       docs_benchmark_contamination re-certs inside the r10 cohort
#       below).
#  3. The r10-era staleness cohort fills the remaining slots. The
#     r13 comment said 41; the recount from the CORRECTNESS_r01-r13
#     union says **38** (the committed arithmetic is now exact).
#     34 burn here; FOUR are displaced by the head/changed-kernel
#     arithmetic and LEAD the r15 roster, each with an in-window
#     sibling pinning its kernel:
#     dedup_first_lineitem (declared-order dedup kernel replayed by
#     in-window dedup_cascade_lineitem, which composes the same
#     first/exclude paths), events_dedup_first_by_key (same dedup.py
#     window kernel via dedup_cascade_lineitem; the events scan is
#     pinned by in-window events_merge_upsert_state),
#     stream_tumbling_hourly (same streaming event-time agg harness
#     as in-window stream_running_user_stats + stream_dedup_within_
#     watermark), and emb_sign_hamming_topk (sign-plane hashing +
#     top-k machinery pinned by in-window emb_ann_lsh_topk).
#     All four stay locally parity-green at both SFs via
#     tests/test_oracle_parity.py. r15 must take these first, then
#     the r11-era cohort (47 entries by the same recount).
#  Late-r14 amendment: docs_corpus_card's per-row stage moved to the
#  Arrow signal kernel (corpus_card_signals_kernel — the gram-kernel
#  precedent applied to the card's four interpreted HOF passes;
#  2.84 -> 1.74 s median on the full x64 entry, value-identical with
#  kernel==expression pinned in tests/test_round14_ops.py), so it
#  takes a changed-kernel slot. It displaces docs_hash_split, which
#  is SAFE to demote: the seeded md5-28 hash-threshold family it
#  exercises is in-window via docs_temperature_mixture and
#  docs_budget_selection (both read the same _md5_28 salt:id space),
#  the split rule itself is pinned by unit tests, and it stays
#  locally parity-green at both SFs. docs_hash_split joins the four
#  displacements at the r15 head (making five).
# Round-15 roster (below) — exactly what the r14 tail comment and
# VERDICT r14 prescription 2 committed to, with the recount
# VERDICT r14 prescription 7 demands:
#  1. The FIVE committed r10-era displacements LEAD (the four from
#     the r14 cohort arithmetic plus docs_hash_split, displaced by
#     the late-r14 corpus-card kernel amendment; per-entry in-window-
#     sibling rationale in the r14 item-3 comment above). After this
#     burn nothing on the board is older than r11.
#  2. Changed-kernel re-certs for the r15 advice fixes, one per
#     consumer shape:
#     - docs_corpus_card (corpus_card_signals_kernel now emits
#       n_chars as nullable Int64 across the Arrow boundary — the
#       NaN->garbage-int64 hole under convertToArrowArraySafely=
#       false; kernel==expression parity extended with a null-
#       n_chars row in tests/test_round14_ops.py),
#     - lineitem_content_checksum (estimated_splits now strides its
#       stat sample with CEILING division — floor degenerated to the
#       head slice for 65-127-file listings; the checksum's split-
#       aware spread gate at registry/advanced.py:1085 is the direct
#       registry consumer and stands for the spread family).
#  3. The r11-era staleness cohort fills the remaining slots. The
#     r14 comment said 47; that count was taken on the r01-r13
#     union — the four q-class changed-kernel re-certs (q1/q3/q5/
#     q18) were r11-latest and re-certified inside the r14 window,
#     so the recount on the r01-r14 union says **43** (47 - 4; the
#     committed arithmetic is again exact and reconciled, not just
#     restated). All 43 burn here: 5 + 2 + 43 = 50, the full window
#     — no displacements this round, and after r15 nothing on the
#     board is older than r12. r16 takes the r12-era cohort next
#     (48 entries by the same recount).
#  Late-r15 amendment: q5_revenue_by_nation was REWRITTEN this round
#  (fact aggregates below the join tree: per-order direct-int64
#  partial + orders-side custkey join — the second at-scale fact
#  exchange is now impossible by construction; x128 7.32 -> 6.25 s,
#  value-identical at sf0.01), so it takes a changed-kernel slot.
#  It displaces dedup_last_lineitem, which is SAFE to demote: the
#  declared-order dedup window kernel it exercises is in-window
#  three ways (dedup_first_lineitem at the head, plus
#  dedup_duplicates_lineitem and dedup_exclude_all_lineitem in the
#  cohort — all four share operators/dedup.py's one window kernel),
#  and it stays locally parity-green at both SFs via
#  tests/test_oracle_parity.py. dedup_last_lineitem leads the r16
#  roster ahead of the r12-era cohort.
#  Second late-r15 amendment: q9_profit_by_nation_year was REWRITTEN
#  this round (fact slimmed to five int64s BEFORE the join tree —
#  measures/year evaluated at the scan, 40 B shuffle payload when
#  part/supplier stop being broadcastable at scale — and the nation
#  lookup moved dim-side so the fact probes twice, not three times;
#  x64 1.908 -> 1.737 s, x128 4.352 -> 4.137 s interleaved medians,
#  value-identical at both replica scales and at sf0.01; the
#  (l_suppkey, o_year) pre-agg variant measured and rejected at
#  2.94 s — registry/breadth.py docstring). It takes a changed-
#  kernel slot, displacing events_tumbling_hourly, which is SAFE to
#  demote: its hour-bucket windowed-agg kernel is pinned in-window
#  by its streaming twin stream_tumbling_hourly (head slot, same
#  bucket arithmetic over the same events scan), the events scan is
#  additionally in-window via events_asof_last_click/
#  events_json_extract/events_range_join_error_windows/
#  events_top_journeys, and the _msum decimal-agg family via
#  q7_volume_shipping and q12_priority_shipmode in the cohort. It
#  stays locally parity-green at both SFs via
#  tests/test_oracle_parity.py and joins dedup_last_lineitem at the
#  head of the r16 roster. Arithmetic: 5 + 4 + 41 = 50.
#  Third late-r15 amendment: q3_top_unshipped's big join now carries
#  a SHUFFLE_HASH hint on the pruned qual side (skips the fact-side
#  SMJ sort; agg still rides the join's HashPartitioning, now as ONE
#  complete pass — x256 6.02 -> 4.14 s ABBA median, sf0.1 0.475 ->
#  0.354 s, value-identical at sf0.01 and x256; the same hint
#  measured and REJECTED on q5 — build-side OOM at x256, |orders|-
#  proportional build — and on q9 — forces two fact exchanges AQE's
#  broadcasts make unnecessary; registry/core.py docstring). It
#  takes a changed-kernel slot, displacing q17_small_quantity_
#  revenue, which is SAFE to demote: its decimal _msum agg family is
#  in-window via q7_volume_shipping and q12_priority_shipmode, the
#  part scan via q9_profit_by_nation_year and q2_min_cost_supplier,
#  and the per-group-threshold subquery shape via q2's correlated
#  min-cost form — and it stays locally parity-green at both SFs via
#  tests/test_oracle_parity.py. q17 joins dedup_last_lineitem and
#  events_tumbling_hourly at the r16 head (making three), ahead of
#  the r12-era cohort. Final r15 arithmetic: 5 + 5 + 40 = 50.
_R15_WINDOW = (
    # ---- the committed 5 r10-era displacements (staleness burn) ----
    "dedup_first_lineitem",
    "events_dedup_first_by_key",
    "stream_tumbling_hourly",
    "emb_sign_hamming_topk",
    "docs_hash_split",
    # ---- changed in r15: re-verify ----
    "docs_corpus_card",
    "lineitem_content_checksum",
    "q5_revenue_by_nation",
    "q9_profit_by_nation_year",
    "q3_top_unshipped",
    # ---- the r11-era staleness cohort (last checked r11) ----
    "dedup_duplicates_lineitem",
    "dedup_exclude_all_lineitem",
    "docs_bloom_incremental_dedup",
    "docs_bpe_learn_merges",
    "docs_bpe_token_counts",
    "docs_cluster_canonical",
    "docs_dedup_cascade",
    "docs_incremental_dedup",
    "docs_incremental_selfdup_spans",
    "docs_ingest_novelty",
    "docs_intradoc_segment_dedup",
    "docs_keyword_search_topk",
    "docs_language_id",
    "docs_rolling_sketch",
    "docs_selfdedup_text",
    "docs_selfdup_spans",
    "docs_source_gram_overlap",
    "docs_split_leakage_audit",
    "docs_textrank_keywords",
    "emb_ingest_drift",
    "events_asof_last_click",
    "events_json_extract",
    "events_range_join_error_windows",
    "events_top_journeys",
    "multimodal_audio_energy",
    "multimodal_image_tiles",
    "orders_expectation_suite",
    "orders_snapshot_drift",
    "pipeline_summary_observed_lineitem",
    "q12_priority_shipmode",
    "q13_customer_distribution",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "rolling_customer_spend",
    "rule_age_gte_invalid_orders",
    "stream_funnel_cohorts",
    "stream_ingest_drift",
    "stream_shipped_quality",
    "stream_sliding_halfhour",
    "stream_split_leakage",
)

# r14 roster text kept for the audit trail:
_R14_WINDOW = (
    # ---- the committed 11 r9-era displacements (staleness burn) ----
    "docs_minhash_lsh_neardup",
    "docs_neardup_clusters",
    "docs_chunk_for_training",
    "emb_semdedup",
    "emb_incremental_semdedup",
    "stream_semdedup_ingest",
    "stream_multisignal_admission",
    "stream_simhash_neardup_dedup",
    "multimodal_audio_features",
    "stream_incremental_upsert_state",
    "docs_stratified_sample",
    # ---- changed in r14: re-verify ----
    "q3_top_unshipped",
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q18_large_orders",
    "docs_corpus_assembly_pipeline",
    # ---- the r10-era staleness cohort (last checked r10) ----
    "dedup_cascade_lineitem",
    "docs_benchmark_contamination",
    "docs_budget_selection",
    "docs_containment_pairs",
    "docs_cross_doc_ngram_dup",
    "docs_curriculum_stages",
    "docs_fingerprint_exact_dedup",
    "docs_corpus_card",
    "docs_hybrid_search_rrf",
    "docs_ngram_topk_similar",
    "docs_pack_sequences",
    "docs_quality_scores",
    "docs_shipped_tokenizer_counts",
    "docs_source_token_divergence",
    "docs_source_token_stats_udaf",
    "docs_temperature_mixture",
    "emb_ann_lsh_topk",
    "emb_cosine_topk",
    "emb_knn_join",
    "emb_matryoshka_recall",
    "events_merge_upsert_state",
    "events_sessionization",
    "events_user_narratives",
    "lineitem_content_checksum",
    "multimodal_video_features",
    "orders_compaction_plan",
    "pipeline_summary_lineitem",
    "q9_profit_by_nation_year",
    "rule_age_gte_skip_orders",
    "stream_dedup_within_watermark",
    "stream_enriched_segment_counts",
    "stream_langid_scores",
    "stream_lm_bits",
    "stream_running_user_stats",
)

# Full r13 roster text: git show f82252d~1:universal_importer_duckdb_
# spark/entry_queries.py (the _R13_WINDOW tuple).
# Full r12 roster text: git show d6b2293:universal_importer_duckdb_
# spark/entry_queries.py (the _R12_WINDOW tuple).


def _finalize_registry() -> None:
    rank = {n: i for i, n in enumerate(_R15_WINDOW)}

    def key(kv: tuple[str, tuple]) -> int:
        name, _ = kv
        return rank.get(name, len(_R15_WINDOW))

    ordered = dict(sorted(REGISTRY.items(), key=key))
    REGISTRY.clear()
    REGISTRY.update(ordered)


_finalize_registry()
