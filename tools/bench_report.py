"""Regenerate README.md's spark-vs-oracle ratio table from
BENCH_DETAIL_last.json — the r9 verdict's reproducibility fix
(Next-round #7): the README's published ratios are GENERATED from the
recorded bench artifact, never hand-run, so every future perf dispute
is a diff of two committed JSON files.

Usage:  python tools/bench_report.py          # rewrites README section
        python tools/bench_report.py --print  # table to stdout only

r11 stability regime (r10 verdict #5): the artifact records BOTH the
min and the MEDIAN of each side's N runs; the table's ratio and the
adjudication classes are derived from the MEDIAN (min-of-5 on
0.1-0.7 s quantities flapped entries across the 2x bar and the 0.1 s
class boundary between runs of identical code), and the classifier
carries HYSTERESIS (dead bands in tools/benchclass.py:BANDS).
r12 (verdict #4/#5): the classifier moved to tools/benchclass.py so
bench.py's like-for-like aggregate uses the SAME membership rule; the
class memory lives in the artifact's own ``classes`` key (README
parse is only the pre-r12 fallback); and a stickiness bound keeps
hysteresis from parking a trending entry — see benchclass.classify.

Adjudication classes, derived from the RECORDED median oracle time:

- ``scheduling-floor`` (oracle < 0.1 s): the DuckDB twin is a
  sub-scan-floor micro-job; Spark's multi-job scheduling floor
  (~0.1-0.3 s/job) and the single-row-group test parquet (one task
  per scan, adjudicated r3) dominate, constant in data size. Ratios
  in this class measure fixed overhead, not throughput.
- ``comparable`` (0.1 s <= oracle <= 2.0 s): the oracle does real
  data work at bench scale — the like-for-like population; the 2x
  bar is judged here, on recorded numbers.
- ``artifact-replay`` (oracle > 2.0 s): the SQL twin replays FULL
  training (BPE merges, k-means iterations, union-find, DSIR
  estimation) while the Spark side serves from its held artifact
  (the documented prepared-plan contract in bench.py) — the ratio
  overstates Spark, so these rows are excluded from the aggregate.

Entries with a recorded note carry it in the last column (standing
adjudications with their evidence; see README's adjudications prose).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from benchclass import (  # noqa: E402  (path insert above)
    BANDS,
    END,
    START,
    classify,
    prior_classes_from_readme,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DETAIL = os.path.join(ROOT, "BENCH_DETAIL_last.json")
README = os.path.join(ROOT, "README.md")

# Standing per-entry adjudication notes — the argument lives in the
# README prose; the NUMBERS come only from the artifact.
NOTES = {
    "docs_multisignal_admission": "r15 OPTIMIZATION: its semantic gate rides incremental_semdedup, so it inherits the cogrouped float64-BLAS admission GEMM (see emb_incremental_semdedup) — same-host bench A/B 1.238 -> 0.795 s min; probe spark exp 0.55 vs oracle 1.40 (the SQL replay's correlated NOT EXISTS is superlinear: 1206 s @x64 vs Spark's 7-13 s), ratio 0.01 @x64",
    "docs_corpus_card": "r15: the r14 'under-2x by ~x256' projection MEASURED TRUE — x256 cells (documents-only replica) read 1.79-1.81x over three passes (Spark 1.60-2.12 s pass-median vs oracle 0.88-1.17 s; spark exp 0.20 vs oracle 0.36), off the weak list. r14: the four per-row token signals + md5 fingerprint moved to ONE Arrow kernel (corpus_card_signals_kernel — the bound-expression form paid 4 interpreted HOF passes): full x64 entry 2.84 -> 1.74 s median. Previously: single-row-group scan floor (decomposed r10)",
    "pipeline_flagship": "multi-action 7-stage pipeline contract; its oracle replays NO training — a >2 s oracle here is host load, not the replay asymmetry the class name implies",
    "docs_dsir_resample": "r15: crossed below the bar MEASURED at x128 — pass-median cells 4.37 s vs 2.40 s = 1.82x (three passes; spark exp 0.44 vs oracle 0.52, converging), off the weak list without a code change, exactly the 'marginal; re-probe under pass-median before spending effort' call the r14 verdict made. r12: totals branch folded into the scoring pass (include_wordless explode_outer; the 2nd corpus scan + two-aggregate join removed) — 9 -> 6 jobs/run, 0.53 -> 0.46 s (tools/decompose.py)",
    "emb_hard_negatives": "r15: crossover MEASURED, no longer extrapolated — x256 probe cells (embeddings-only replica, 512k vectors) read 1.55-1.65x over three passes (Spark 1.92-1.99 s pass-median vs oracle 1.17-1.28 s; one hot 4.47/3.65 s pass on BOTH sides damped by the median), off the weak list the way the r14 verdict asked. Exponent story confirmed: Spark 0.11 (flat stage/exchange floor) vs oracle 0.29. Previously r14: x64 ratio read 3.9x only because both sides get cheaper at x64 than x16 (cyclic-shift bucket geometry). Decomposed r12 (tools/decompose.py): pair expansion with ZERO arithmetic cost the same as the full entry — exchange/scheduling floor, not compute (an unrolled-codegen dot measured 3x WORSE than the HOF fold)",
    "docs_bpe_learn_merges": "Python-literal serving floor REMOVED r11 (VALUES LocalRelation, 0.30 -> 0.04 s; the old 2.26x was applySchemaToPythonRDD re-serialization, 1 job, zero compute)",
    "docs_selfdup_spans": "decomposed r11 (tools/decompose.py): tokenize+hash map-only 0.16 s, +gram exchange 0.47 — the one exchange dominates; join-back builds on SHARED grams only since r11 (min!=max holder), AQE broadcasts it: no probe-side exchange",
    "docs_selfdedup_text": "excision adds ~0.10 s over the span pipeline, whose scoped cache it shares (decomposed r11); shared-gram join-back since r11",
    "docs_langid_trigram_rank": "scoring shuffle-free since r10 (map-side bound-lambda profile)",
    "q1_pricing_summary": "q-class floor re-adjudicated r13 at x64 (tools/decompose.py): scan+filter 0.23 s + measure map 0.25 s + one exchange 0.17 s over 38M rows; the r13 guarded-hybrid scaled() removed the per-row Double.toString decimal cast (measure map 1.23 -> 0.48 s, entry 5.4x -> 2.9x at x64) — residual is parquet-decode + scheduling vs DuckDB's 0.21 s. r14 knob sweep REJECTED at x64: wholeStage=false 1.88 vs 1.38 s default (codegen is JIT-healthy — no huge-method cliff), columnarReaderBatchSize 16384 1.68, methodSplitThreshold 8192 1.89 — the floor stands final",
    "q5_revenue_by_nation": "r15 REWRITE — fact aggregates below the join tree: lineitem pre-sums per order (direct int64, <=7 rows/order, map-side combine cuts the one fact exchange ~4x) and the custkey join moves to the orders side, so the at-scale second fact exchange (hidden locally by AQE broadcasting customer) is impossible by construction. Measured: x128 7.32 -> 6.25 s interleaved A/B, then 5.38 s stable over 3 fresh probe passes (history reset via --reset-spark, kernel-change etiquette) = 4.06x at x128 with spark exp 0.38 vs oracle 0.52 — converging. Value-identical to the old shape and the oracle at sf0.01 (integer associativity of the exact scaled partials). Previously r13: 9.8x @x16 -> 4.0x @x64 after the scaled() hybrid",
    "q9_profit_by_nation_year": "r15 REWRITE — fact slimmed to five int64s BEFORE the join tree (l_partkey, l_suppkey, o_year, rev k=6, qty k=2: measures and year() evaluated once at the scan, 40 B/row through both dim joins when part/supplier stop being broadcastable at scale) and the nation lookup moved dim-side (supplier >< broadcast nation builds the s_suppkey -> n_name map, so the fact probes TWICE, not three times). Measured: x64 1.908 -> 1.737 s and x128 4.352 -> 4.137 s interleaved A/B medians, then fresh-history probe cells (--reset-spark, kernel-change etiquette) x64 1.99 / x128 3.36 (3 passes) / x256 11.9 (5 passes; saturation-equal to the old kernel's 11.75 — the x256 GC regime, see q18's boundary note) with spark exp 0.52 -> 0.44 vs oracle 0.60 — converging. Value-identical to the old shape at x64+x128 and to the oracle at sf0.01. A (l_suppkey, o_year) pre-agg below the supplier join was measured and REJECTED (2.94 s vs 1.74 at x64): cell domain |supplier| x years makes map-side combine weak (q18's random-key lesson) and the extra hash-agg pass outcosts the slimmer second shuffle. direct=True stays INVALID for the final agg (nation-year groups are row-unbounded at 100 TB). Previously r14: join tree alone 1.09 s of the 1.96 s entry, all three dims broadcast at x64; r13: scaled() hybrid 3.14 -> 1.54 s",
    "q18_large_orders": "FINAL adjudication r14 at x64: the high-cardinality orderkey agg is pure groupBy infrastructure — count-only == sum-of-scaled (1.175 vs 1.185 s at x16), so the arithmetic is free and the cost is partial-hash + 9.3M-row exchange + final-hash (partial agg reduces nothing on a randomly-spread key: 9.6M -> 9.3M). Alternatives measured and rejected: Arrow/numpy grouped-sum kernel (2.44 vs 1.71 s agg-only); codegen fast-map knobs (vectorized map, two-level-final, coalesce-off, 4MB advisory — all within host noise). The r13 'diverging exponent' was the ORACLE's fixed-cost floor: at x16->x64 DuckDB leaves it (0.143 -> 0.591 s, exp ~1.0) while Spark scales in parallel (1.39 -> 5.06 s, exp ~0.93) — a flat engine constant (8.6x ad-hoc / 5.73x canonical probe at x64; shuffle materialization + two-phase UnsafeRow hash agg vs in-process perfect-hash), the per-row price of the partitioned execution that scales out past one node. r15 x256 boundary note (applies to the whole q-class): x256 (154M-row fact) is the single-JVM SATURATION segment — Spark's x128->x256 per-doubling exponent exceeds 1 while the oracle stays ~0.9, and the segment is NOT a plan defect: shuffle.partitions 32->128->256 measured flat, heap 8g->32g measured WORSE with 2-3x run variance under a quiet calibration bracket (GC regime on one 32-thread JVM; GCLocker allocation-retry warnings in-pass). A cluster holds per-executor volume at the x64-x128 operating point and scales the saturated machinery out; the x1-x128 segment carries the named per-row constants",
    "q3_top_unshipped": "same agg class as q18; r14 rewrite: pruned orders><customer (10% qualify) builds first, lineitem carries only (okey, scaled-revenue int64) through ONE exchange, agg rides the join partitioning — x64 4.07 -> 3.55 s median. r15 x128 check: the first x128 pass read 9.8 s (3.9x the x64 cell — a plan-flip suspect), but the EXECUTED PLANS at x64 and x128 are identical (SMJ on orderkey + broadcast customer, verified side by side) and quiet interleaved runs read 4.07-4.83 s (med 4.25); the pass-median settled the cell at 3.7-4.2 s = 5.2x — pass noise, not a flip; the r14 7.0x single-pass cell is superseded",
    "emb_ingest_drift": "r14 drift adjudication: bench-pass medians 1.11-1.66 s vs r13's 0.38 on the jitterier r14 host; a quiet same-session re-run reads 0.69 s / 3 jobs — multi-job artifact serving is host-jitter-sensitive, code untouched this round",
    "emb_incremental_semdedup": "r15 OPTIMIZATION: the admission distance moved from the interpreted zip_with/aggregate per-pair fold (~17 us/pair measured; spark scale exp 0.85 vs oracle 0.52 — the board's only crossing trend) to a cogrouped per-cluster integer GEMM (_admit_against_kept_kernel) routed through bit-exact float64 BLAS (int_gemm_exact; the (0,2^22) quantize contract makes dgemm exact for <=512 dims). Row-set identical at sf0.1/x16, oracle parity green; admission stage x16 1.657 -> 0.726 s ABBA, full entry x16 cell 9.87 -> 1.71 s, spark exp 0.85 -> 0.28, ratio 0.09 @x64. Same-host bench A/B 1.171 -> 0.690 s min. Earlier r15: the r14 0.756 -> 1.007 drift was adjudicated as host jitter by interleaved A/B before the kernel change",
    "emb_ivf_topk": "r14 regression adjudication: the 0.87 s driver-pass median was host noise — interleaved re-runs give med 0.40 s / min 0.32 s (committed 0.30-0.38 band), one 2.47 s outlier in 7 runs",
    "docs_hybrid_search_rrf": "r14 regression adjudication: the 0.63 s driver-pass median was host noise — interleaved re-runs give med 0.31 s / min 0.28 s (committed 0.25 band), one 1.64 s outlier in 7 runs",
    "docs_ingest_novelty": "serves the HELD at-rest gram index since r11 (trained-artifact contract; build ~0.8 s, bench.py note)",
    "docs_incremental_selfdup_spans": "serves the HELD at-rest gram index since r11 (trained-artifact contract; build ~0.8 s, bench.py note)",
    "events_top_journeys": "2-exchange minimum, ~0.1 s/stage scheduling (adjudicated r7, docstring)",
    "events_user_narratives": "single-exchange collect_list serialization; stage floor",
    "docs_bigram_lm_bits": "decomposed r11 (tools/decompose.py): the map-only bigram explode alone is 0.33 s of the 0.35 s entry; broadcast lookup + per-doc agg add ~0.03 s — a map-side floor that parallelizes at scale",
    "docs_source_gram_overlap": "decomposed r11 (tools/decompose.py): map-only tokenize+gram explode 0.25 s > the whole 0.16 s oracle; +set-fold exchange 0.47; pair expansion+totals +0.16 over 6 jobs; cache persists across runs; pair expansion reads shared (multi-source) grams only since r11",
    "docs_segment_line_dedup": "decomposed r11 (tools/decompose.py): segment explode alone 0.22 s of the 0.27 s total — map-side fabricate+explode floor; exchanges add ~0.06 s",
    "lineitem_content_checksum": "Adjudication FINAL r15: x128 and x256 cells recorded (x256 = 154M rows, lineitem-only replica) — Spark 14.5-17.4 s vs oracle 6.2-7.7 s, ratio FLAT at 2.2-2.3x across x1-x256 with EQUAL exponents (0.52 vs 0.50 on the full curve); the r14 'Spark exponent exceeds oracle' read (0.38 vs 0.26) was that host's artifact, falsified by the deeper curve. The constant is named: JVM MessageDigest-per-row vs DuckDB's vectorized md5 — a per-row engine price that scales out across executors (both sides data-proportional, neither floor-bound). No cheaper cross-engine-replayable hash exists (DuckDB exposes md5/sha256, no xxhash64; the md5-28 prefix is forced by portability). The Arrow-kernel alternative was MEASURED AND REJECTED r14 (10.33 vs 4.80 s at x64: Arrow-shipping 38M canonical strings costs ~2x the JVM map). Decomposed r13: the md5 map IS the entry; no exchange on multi-split scans",
    "docs_bpe_token_counts": "decomposed r13: word-stream explode was single-split-pinned (0.55 -> 0.17 s at x16 once openCostInBytes lets the scan split); x16 ratio 2.39x -> 1.57x, off the weak list",
    "docs_tokenizer_fertility": "re-decomposed r14 at x16 (this host): the (source,word) count exchange is 0.40 s med of the 0.79 s entry (the q-class hash-agg/exchange constant family), and the 2-job prefix -> 7-job full entry doubles it — broadcast builds + the chars aggregate + final join are pure ~0.1 s/job scheduling, flat at scale; 2.88x on this host (1.83x on the r13 host) is the host's scheduling jitter, not a plan change. Adjudication FINAL: the residual is the word-count exchange (the q-class hash-agg/exchange constant family) plus ~0.1 s/job scheduling on 7 jobs — no plan shape cuts either without caching the corpus scan",
    "docs_corpus_prep": "r13: the JIT regex cliff (two regexp_replace in one codegen method run interpreter-speed) owned the gate — translate() counters + the bound gate push x16 from 3.37x to 0.87x (probe exp 0.01)",
    "docs_quality_filter_ids": "r13 translate-counter gate: x16 ratio 0.07x (probe exp 0.11 vs oracle 0.97)",
    "docs_benchmark_contamination": "re-decomposed r13 at x16: the gram build alone is 1.28 s of the 1.97 s entry, and it is the per-window INTERPRETED-HOF floor, not md5 (no-hash variant 1.23 s; one-element-access floor 0.24 s). Alternatives measured and rejected: substring-by-offset windows (O(tokens^2) offset build, 75 s), xxhash64 (r12), lead()-window codegen build (adds a full token-stream exchange — the map-only shape is the 100 TB contract). Standing floor; exp 0.32 vs oracle 0.19.",
}


# classify/BANDS/prior-class parsing live in tools/benchclass.py
# since r12 (verdict #4): bench.py derives the like-for-like
# aggregate membership from the SAME classify() this table uses, and
# the class memory lives in the artifact itself (README parse is the
# fallback for pre-r12 artifacts). Re-exported here for callers/tests.
prior_classes = prior_classes_from_readme


def build_table(detail: dict, prior: dict[str, str]) -> str:
    queries = detail.get("queries", {})
    q_med = detail.get("queries_median", {}) or queries
    oracle = detail.get("oracle", {})
    o_med = detail.get("oracle_median", {}) or oracle
    lines = [
        START,
        "",
        f"Source artifact: `BENCH_DETAIL_last.json` "
        f"(sf={detail.get('sf')}, calibration "
        f"{detail.get('calibration_sec')} s). Ratio and class derive "
        "from the MEDIAN of each side's runs (min also recorded; r11 "
        "stability regime). Classes by median oracle: <0.1 s = "
        "scheduling-floor, 0.1-2.0 s = comparable (the like-for-like "
        "population), >2.0 s = artifact-replay (excluded: the SQL "
        "twin replays full training against Spark's held-artifact "
        "re-query). Boundary dead bands ("
        + ", ".join(f"{lo}-{hi} s" for lo, hi in BANDS.values())
        + ") keep the previously recorded class, UNLESS the previous "
        "pass's median already sat on the same side of the boundary "
        "(two consecutive agreeing passes win over the prior — the "
        "r12 stickiness bound). Classes are recorded in the artifact "
        "(`classes` key) by bench.py itself.",
        "",
        "| entry | spark med s | spark min s | oracle med s | "
        "oracle min s | ratio (med) | class | note |",
        "| --- | ---: | ---: | ---: | ---: | ---: | --- | --- |",
    ]
    class_rank = {
        "comparable": 0,
        "scheduling-floor": 1,
        "artifact-replay": 2,
        "no-oracle-timing": 3,
    }
    # Since r12 the artifact records its own classes (bench.py runs
    # the classifier with the full memory — prior class + previous
    # pass's median, the stickiness bound); the table renders the
    # RECORDED class. Pre-r12 artifacts fall back to classifying here
    # from the README-parsed priors.
    recorded = detail.get("classes") or {}
    cls = {
        n: recorded.get(n) or classify(o_med.get(n), prior.get(n))
        for n in queries
    }

    def sort_key(n):
        om = o_med.get(n)
        # `is not None` in BOTH the sort key and the formatter: a
        # 0.0 oracle sorts/prints as a real timing (advice fix)
        ratio = (q_med.get(n, 0.0) / om) if (om is not None and om > 0) else float("-inf")
        return (class_rank[cls[n]], -ratio)

    def fmt(v: float | None) -> str:
        # zero-vs-absent handled one way everywhere: 0.0 is a real
        # recorded timing, only None prints as — (advice fix)
        return f"{v:.3f}" if v is not None else "—"

    for n in sorted(queries, key=sort_key):
        om, omin = o_med.get(n), oracle.get(n)
        r = (
            f"{q_med.get(n, 0.0) / om:.2f}"
            if (om is not None and om > 0)
            else "—"
        )
        lines.append(
            f"| {n} | {fmt(q_med.get(n, queries[n]))} | {fmt(queries[n])} "
            f"| {fmt(om)} | {fmt(omin)} | {r} | {cls[n]} "
            f"| {NOTES.get(n, '')} |"
        )
    comp = detail.get("comparable")
    if comp:
        est = comp.get("estimator", "min")
        lines += [
            "",
            f"**Like-for-like aggregate** ({comp['n']} comparable "
            f"entries, {est}): Spark {comp['spark_sec']} s vs DuckDB "
            f"{comp['oracle_sec']} s = **{comp['ratio']}x**.",
        ]
    # ALL-POPULATION aggregate beside the comparable one (r12 verdict
    # #6): every entry with an oracle timing, same estimator, so a
    # class migration can never silently improve the headline. Read
    # from the artifact when recorded; recomputed from the artifact's
    # own medians for pre-r13 artifacts (same numbers either way —
    # both derive from queries_median/oracle_median).
    allpop = detail.get("all_population")
    if not allpop:
        o_med_all = detail.get("oracle_median") or detail.get("oracle") or {}
        pop = [n for n in queries if o_med_all.get(n) and n in q_med]
        if pop:
            s_all = sum(q_med[n] for n in pop)
            o_all = sum(o_med_all[n] for n in pop)
            allpop = {
                "n": len(pop),
                "spark_sec": round(s_all, 3),
                "oracle_sec": round(o_all, 3),
                "ratio": round(s_all / o_all, 3),
                "estimator": "median",
            }
    if allpop:
        lines += [
            "",
            f"**All-population aggregate** ({allpop['n']} entries with "
            f"an oracle timing, {allpop.get('estimator', 'median')} — "
            "NOT like-for-like: includes the scheduling-floor "
            "micro-oracles and the artifact-replay asymmetry; "
            "published so class migration can't move the headline "
            f"silently): Spark {allpop['spark_sec']} s vs DuckDB "
            f"{allpop['oracle_sec']} s = **{allpop['ratio']}x**.",
        ]
    dropped = detail.get("oracle_budget_dropped")
    if dropped:
        lines += ["", f"Oracle timing budget exhausted for: {', '.join(dropped)}."]
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    with open(DETAIL) as fh:
        detail = json.loads(fh.readline())
    try:
        with open(README) as fh:
            text = fh.read()
    except OSError:
        text = ""
    table = build_table(detail, prior_classes(text))
    if "--print" in sys.argv:
        print(table)
        return 0
    if START in text and END in text:
        pre = text[: text.index(START)]
        post = text[text.index(END) + len(END):]
        text = pre + table + post
    else:
        text = text.rstrip() + "\n\n## Bench ratios (generated)\n\n" + table + "\n"
    with open(README, "w") as fh:
        fh.write(text)
    print("README.md bench table regenerated "
          f"({len(detail.get('queries', {}))} entries)")
    regenerate_weak_list()
    return 0


# ----------------------------------------------------------------------
# Canonical weak list (r14, verdict #3): ONE generated number, one
# stated rule, emitted identically into README.md and SURVEY.md so the
# two documents can never disagree again (r13 published 7 vs 9).
#
# Rule: an entry is WEAK iff its latest recorded scale-probe row has
# ratio_last > 2.0 — Spark median / DuckDB-oracle median at the
# LARGEST measured scale, both sides timed on the same host in the
# same pass (tools/scale_probe.py). No straddler judgment calls: the
# rule reads the latest recorded pass verbatim; an entry near the bar
# enters and leaves as passes are recorded, and the re-probe itself
# is the watch process. Entries without a probe row are covered by
# the bench-scale table above (every bench-comparable entry over 2x
# has a probe row — checked r14).

WEAK_START = "<!-- WEAK-LIST:START (generated by tools/bench_report.py) -->"
WEAK_END = "<!-- WEAK-LIST:END -->"
PROBE = os.path.join(ROOT, "SCALE_PROBE.json")
SURVEY = os.path.join(ROOT, "SURVEY.md")


def weak_block(probe: dict) -> str:
    rows = []
    for n, e in probe["entries"].items():
        if e.get("ratio_last") is None or e["ratio_last"] <= 2.0:
            continue
        # guard: a hand-recorded probe row could carry ratio_last
        # without per-scale cells; skip-and-annotate rather than
        # aborting the whole README/SURVEY regeneration (r14 advice)
        cells = e.get("spark") or {}
        scale = max(cells, key=lambda s: int(s)) if cells else "?"
        npass = len((e.get("spark_passes") or {}).get(str(scale), []) or [None])
        rows.append((n, e["ratio_last"], e.get("spark_exp"),
                     e.get("oracle_exp"), scale, npass))
    rows.sort(key=lambda r: -r[1])
    lines = [
        WEAK_START,
        "",
        f"**Canonical weak count: {len(rows)}** (rule: scale-probe "
        "`ratio_last` > 2.0 — Spark cell median / oracle cell median "
        "at the largest measured scale, where each cell is the "
        "median of its last recorded passes (r15 pass-median regime, "
        "tools/scale_probe.py:merge_passes); regenerate with "
        "`python tools/bench_report.py`).",
        "",
        "| entry | ratio @largest scale | spark exp | oracle exp | passes |",
        "| --- | ---: | ---: | ---: | ---: |",
    ]
    for n, rl, se, oe, sc, np_ in rows:
        lines.append(f"| {n} | {rl:.2f}x @x{sc} | {se} | {oe} | {np_} |")
    lines += ["", WEAK_END]
    return "\n".join(lines)


def _splice(path: str, block: str, anchor: str) -> None:
    try:
        with open(path) as fh:
            text = fh.read()
    except OSError:
        return
    if WEAK_START in text and WEAK_END in text:
        pre = text[: text.index(WEAK_START)]
        post = text[text.index(WEAK_END) + len(WEAK_END):]
        text = pre + block + post
    else:
        text = text.rstrip() + f"\n\n{anchor}\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)


def regenerate_weak_list() -> int:
    with open(PROBE) as fh:
        probe = json.load(fh)
    block = weak_block(probe)
    _splice(README, block, "## Weak list (generated)")
    _splice(SURVEY, block, "## Weak list (generated)")
    n = block.count("x @x")
    print(f"weak list regenerated into README.md + SURVEY.md ({n} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
