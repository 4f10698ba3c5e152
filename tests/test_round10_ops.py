"""Round-10 regressions: the r9 verdict + advice items.

- sign_hamming_topk gained the ragged-row guard matryoshka_recall
  already had (r10 advice #2): a corpus embedding narrower than the
  query dim used to pack a truncated signature (missing dims read as
  sign-0, skewing Hamming) and NULL-fold its cosine at re-rank,
  silently sorting last.
- matryoshka_recall's ragged guard now covers the FULL-DIMENSION
  reference slice (len(query_vec)), not just max(dims) (r10 advice
  #1): with dims=(8, 32) and a 64-wide query, a 48-wide corpus row
  used to pass the max(dims)=32 guard yet NULL-fold in the reference
  top-k.
- the exact-substring self-dedup verdict computation is skew-safe
  (r9 verdict "What's wrong" #4): the earliest-holder per gram is a
  map-side-combinable groupBy + join-back, not a window over the
  gram — a hot gram (boilerplate repeated across millions of docs)
  must not become one giant sorted single-task group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_sign_hamming_rejects_ragged_rows(spark):
    """An embedding narrower than the query dim must raise at
    execution, not silently skew Hamming + sort last with a NULL
    cosine."""
    from universal_importer_duckdb_spark.operators.similarity import (
        sign_hamming_topk,
    )

    qv = [0.5] * 64
    ragged = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 32)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="narrower than the query dim"):
        sign_hamming_topk(ragged, qv, k=2, n_candidates=2).collect()


def test_sign_hamming_full_width_rows_unaffected_by_guard(spark, sf_dir):
    """The guard must be a no-op on a well-formed corpus: same rows
    with and without it (pinned by re-running the registry shape)."""
    from universal_importer_duckdb_spark.operators.similarity import (
        sign_hamming_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]
    rows = sign_hamming_topk(emb, qv, k=5, n_candidates=50).collect()
    assert len(rows) == 5
    assert all(r["cosine"] is not None for r in rows)


def test_matryoshka_guard_covers_full_reference_width(spark):
    """dims=(8, 32) with a 64-wide query: a 48-wide corpus row passes
    a max(dims)=32 guard but NULL-folds in the len(query_vec)=64
    reference tier — the guard must use the widest slice actually
    taken (r10 advice #1)."""
    from universal_importer_duckdb_spark.operators.similarity import (
        matryoshka_recall,
    )

    qv = [0.5] * 64
    ragged = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 48)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="narrower than the widest"):
        matryoshka_recall(ragged, qv, dims=(8, 32), k=2).collect()


# ---------------------------------------------- r10 births: bigram LM
def test_bigram_lm_bits_hand_computed(spark):
    """Target 'a b a b a c': c2={(a,b):2,(b,a):2,(a,c):1},
    c1={a:3,b:2} -> bits(a,b)=len(bin(3//2))=1, bits(b,a)=
    len(bin(2//2))=1, bits(a,c)=len(bin(3//1))=2. Scoring 'a b x'
    against it: (a,b)=1 + (b,x)=OOV 24 -> 25 bits / 2 bigrams =
    12500 milli. The target doc itself: (a,b),(b,a),(a,b),(b,a),
    (a,c) -> 1+1+1+1+2 = 6 bits / 5 = 1200 milli."""
    from universal_importer_duckdb_spark.operators.lm import bigram_lm_bits
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b a b a c", "tgt"), (2, "a b x", "raw")],
        "doc_id bigint, text string, source string",
    )
    rows = {
        r.doc_id: (r.n_bigrams, r.bits_milli)
        for r in bigram_lm_bits(docs, F.col("source") == "tgt").collect()
    }
    assert rows == {1: (5, 1200), 2: (2, 12500)}


def test_bigram_lm_short_docs_report_zero_evidence(spark):
    """Sub-2-token documents (empty, null, one word) report
    (n_bigrams=0, bits_milli=0) — no evidence is not high surprisal,
    and they must still APPEAR in the output (explode_outer)."""
    from universal_importer_duckdb_spark.operators.lm import bigram_lm_bits
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b", "tgt"), (2, "", "raw"), (3, None, "raw"), (4, "only", "raw")],
        "doc_id bigint, text string, source string",
    )
    rows = {
        r.doc_id: (r.n_bigrams, r.bits_milli)
        for r in bigram_lm_bits(docs, F.col("source") == "tgt").collect()
    }
    assert rows[2] == (0, 0) and rows[3] == (0, 0) and rows[4] == (0, 0)
    assert rows[1] == (1, 1000)  # (a,b): c1=c2=1 -> 1 bit


def test_streaming_lm_bits_equals_batch(spark, sf_dir):
    """The drained ingest scorer equals the batch scorer row-for-row
    on the same corpus and artifact (stateless stream-static plan)."""
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.lm import (
        bigram_lm_artifact,
        lm_bits_with_artifact,
    )
    from universal_importer_duckdb_spark.streaming import events as se
    from universal_importer_duckdb_spark.streaming.docs import (
        stream_documents,
        streaming_lm_bits,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    artifact = bigram_lm_artifact(docs, F.col("source") == "src0")
    batch = sorted(
        map(tuple, lm_bits_with_artifact(docs, artifact).collect())
    )
    drained = se.run_available_now(
        streaming_lm_bits(stream_documents(spark, sf_dir), artifact),
        "t_stream_lm_bits",
        output_mode="update",
    )
    got = sorted(
        map(
            tuple,
            drained.groupBy("doc_id")
            .agg(
                F.max("n_bigrams").alias("n_bigrams"),
                F.max("bits_milli").alias("bits_milli"),
            )
            .collect(),
        )
    )
    assert got == batch and len(batch) > 0


# ---------------------------------------------- r10 births: novelty
def test_ingest_novelty_semantics(spark):
    """A doc whose only 8-gram window exists at rest scores 0 novel;
    a fully novel doc scores 1000; a doc mixing one seen and one
    unseen window scores 500; a too-short doc reports (0, 0)."""
    from universal_importer_duckdb_spark.operators.corpus import (
        ingest_novelty,
    )

    seen = " ".join(f"s{j}" for j in range(8))
    at_rest = spark.createDataFrame(
        [(100, f"pre1 pre2 {seen} post1")],
        "doc_id bigint, text string",
    )
    arriving = spark.createDataFrame(
        [
            (1, seen),                                  # 1 window, seen
            (2, " ".join(f"n{j}" for j in range(8))),   # 1 window, novel
            (3, f"{seen} zz"),  # 2 windows: seen + novel -> 500
            (4, "too short"),                           # no window
        ],
        "doc_id bigint, text string",
    )
    rows = {
        r.doc_id: (r.n_windows, r.novel_milli)
        for r in ingest_novelty(at_rest, arriving, n=8).collect()
    }
    assert rows == {1: (1, 0), 2: (1, 1000), 3: (2, 500), 4: (0, 0)}


# ---------------------------------------------- r10 births: HLL
def test_hll_estimate_within_typical_error(spark):
    """The raw HLL estimate lands within 3 standard errors
    (1.04/sqrt(256) ~ 6.5% each) of the exact distinct count on a
    40k-key domain — the sketch is certified on data, not asserted."""
    from pyspark.sql import functions as F
    from universal_importer_duckdb_spark.operators.sketches import (
        hll_registers,
        hll_report,
    )

    n = 40_000
    df = spark.range(n).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("k")
    )
    row = hll_report(hll_registers(df, "k")).collect()[0]
    est = row.hll_est_milli / 1000.0
    assert abs(est - n) / n < 0.20, est


def test_hll_register_merge_is_union(spark):
    """max-merging the register tables of two disjoint halves equals
    the register table of their union — the monoid property that makes
    the sketch map-side-combinable in batch and bounded-state in
    streaming (same fold as finalize_hll_registers)."""
    from pyspark.sql import functions as F
    from universal_importer_duckdb_spark.operators.sketches import (
        finalize_hll_registers,
        hll_registers,
    )

    base = spark.range(10_000).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("k")
    )
    a = hll_registers(base.filter(F.col("id") % 2 == 0), "k")
    b = hll_registers(base.filter(F.col("id") % 2 == 1), "k")
    merged = sorted(
        tuple(r) for r in finalize_hll_registers(a.unionAll(b)).collect()
    )
    whole = sorted(tuple(r) for r in hll_registers(base, "k").collect())
    assert merged == whole


def test_hll_duplicates_are_absorbed(spark):
    """Re-inserting every key 5x leaves the register table unchanged —
    the idempotence that lets the streaming twin skip watermark-scoped
    dedup entirely."""
    from pyspark.sql import functions as F
    from universal_importer_duckdb_spark.operators.sketches import (
        hll_registers,
    )

    base = spark.range(5_000).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("k")
    )
    rep = base.crossJoin(spark.range(5).select(F.lit(1).alias("__x"))).select(
        "source", "k"
    )
    once = sorted(tuple(r) for r in hll_registers(base, "k").collect())
    five = sorted(tuple(r) for r in hll_registers(rep, "k").collect())
    assert once == five


# ------------------------------------------- r10: RLE trigram kernel
def test_trigram_rle_counts_matches_counter_property(spark):
    """Property: the bound-lambda sorted-array RLE (the langid
    scoring kernel) produces exactly collections.Counter's trigram
    counts on adversarial strings — repeated chars, full-string
    repeats, unicode, under-3-char edge cases."""
    from collections import Counter

    from hypothesis import given, settings, strategies as st
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.text_analysis import (
        trigram_rle_counts,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.sampled_from("abc "), min_size=0, max_size=40
            ),
            min_size=1,
            max_size=6,
        )
    )
    def check(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        got = {
            (r.doc_id, r.e.tg): r.e.c
            for r in df.select(
                "doc_id", F.explode(trigram_rle_counts("text")).alias("e")
            ).collect()
        }
        want = {}
        for i, t in enumerate(texts):
            low = t.lower()
            for tg, c in Counter(
                low[j : j + 3] for j in range(max(len(low) - 2, 0))
            ).items():
                want[(i, tg)] = c
        assert got == want

    check()


# ------------------------------------- r10: cross-source forensics
def test_source_gram_overlap_semantics(spark):
    """Hand-built corpus: sources A and B share exactly one 8-gram
    (via one copied sentence), C shares nothing; jaccard is exact
    integer milli over distinct gram sets; pairs with zero shared
    grams are absent."""
    from universal_importer_duckdb_spark.operators.corpus import (
        source_gram_overlap,
    )

    shared = " ".join(f"w{j}" for j in range(8))          # 1 gram
    rows = [
        (1, "A", f"{shared} a1 a2"),   # grams: shared + 2 more = 3
        (2, "B", f"b0 {shared}"),      # grams: 1 new + shared = 2
        (3, "C", " ".join(f"c{j}" for j in range(9))),    # 2 grams
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    got = {
        (r.source_a, r.source_b): (r.shared_grams, r.jaccard_milli)
        for r in source_gram_overlap(docs, n=8).collect()
    }
    # |A|=3, |B|=3 (b0.. shifts: 'b0 w0..w6', 'w0..w7' -> 2 grams? No:
    # 10 tokens -> 3 windows: [b0..w6],[w0..w7],[w1..w7+]... compute:
    # B text = b0 + 8 shared tokens = 9 tokens -> 2 windows; one is
    # the shared gram. So |B|=2, shared=1, union=3+2-1=4 -> 250.
    assert got == {("A", "B"): (1, 250)}


# --------------------------------------------- r10: ingest drift
def test_embedding_ingest_drift_planted_shift(spark):
    """Arriving vectors planted FAR from the at-rest cloud must show
    up as a high mean_d2_arriving in their cluster; training uses
    at-rest only, so the at-rest columns are identical whatever the
    arriving batch is (the incremental-family contract)."""
    import random

    from universal_importer_duckdb_spark.operators.similarity import (
        embedding_ingest_drift,
    )

    rng = random.Random(7)
    dim = 8
    at_rest = spark.createDataFrame(
        [(i, [rng.uniform(-0.1, 0.1) for _ in range(dim)]) for i in range(200)],
        "vec_id bigint, embedding array<float>",
    )
    near = spark.createDataFrame(
        [(1000 + i, [rng.uniform(-0.1, 0.1) for _ in range(dim)]) for i in range(20)],
        "vec_id bigint, embedding array<float>",
    )
    # 1.5 per coordinate: far from the +-0.1 at-rest cloud but
    # inside int_kmeans' quantization contract (|x| < ~2.1)
    far = spark.createDataFrame(
        [(2000 + i, [1.5 + rng.uniform(-0.1, 0.1) for _ in range(dim)]) for i in range(20)],
        "vec_id bigint, embedding array<float>",
    )
    d_near = embedding_ingest_drift(at_rest, near, n_clusters=4, sample_size=64)
    d_far = embedding_ingest_drift(at_rest, far, n_clusters=4, sample_size=64)
    rows_near = {r.cluster: r for r in d_near.collect()}
    rows_far = {r.cluster: r for r in d_far.collect()}
    # at-rest geometry identical across arriving batches
    assert {
        c: (r.n_at_rest, r.mean_d2_at_rest) for c, r in rows_near.items() if r.n_at_rest
    } == {
        c: (r.n_at_rest, r.mean_d2_at_rest) for c, r in rows_far.items() if r.n_at_rest
    }
    # the far batch lands with a mean_d2 far above anything at rest
    worst_far = max(r.mean_d2_arriving for r in rows_far.values() if r.n_arriving)
    worst_rest = max(r.mean_d2_at_rest for r in rows_far.values() if r.n_at_rest)
    assert worst_far > 100 * max(worst_rest, 1)
    # the near batch does not
    worst_near = max(r.mean_d2_arriving for r in rows_near.values() if r.n_arriving)
    assert worst_near < 100 * max(worst_rest, 1)


# ------------------------------------- r12: HLL small-range correction
def test_hll_small_range_correction_beats_raw(spark):
    """On a small domain (true n=100 << 2.5m=640) the raw estimator
    overestimates (the documented r10 bias) and the r12
    LinearCounting-corrected column lands within LinearCounting's
    typical error — the correction closes the bias instead of just
    documenting it."""
    from pyspark.sql import functions as F
    from universal_importer_duckdb_spark.operators.sketches import (
        hll_registers,
        hll_report,
    )

    n = 100
    df = spark.range(n).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("k")
    )
    row = hll_report(hll_registers(df, "k")).collect()[0]
    raw = row.hll_est_milli / 1000.0
    corr = row.hll_corrected_milli / 1000.0
    assert row.n_zero_registers > 0
    assert abs(corr - n) <= abs(raw - n)
    assert abs(corr - n) / n < 0.15, (raw, corr)


def test_hll_correction_is_identity_in_large_range(spark):
    """Above the 2.5m gate the corrected column IS the raw estimate —
    the correction only ever fires in the small-range regime."""
    from pyspark.sql import functions as F
    from universal_importer_duckdb_spark.operators.sketches import (
        hll_registers,
        hll_report,
    )

    df = spark.range(40_000).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("k")
    )
    row = hll_report(hll_registers(df, "k")).collect()[0]
    assert row.hll_est_milli > 640_000  # raw estimate above the gate
    assert row.hll_corrected_milli == row.hll_est_milli


def test_hll_lc_table_is_exact_integer_literals():
    """The LinearCounting table is importable, m-sized, strictly
    decreasing, and pins a few hand-computed values — the ln() is
    evaluated once at import, never per engine."""
    import math

    from universal_importer_duckdb_spark.operators.sketches import (
        HLL_LC_MILLI,
        HLL_M,
    )

    assert len(HLL_LC_MILLI) == HLL_M
    assert all(isinstance(v, int) for v in HLL_LC_MILLI)
    assert list(HLL_LC_MILLI) == sorted(HLL_LC_MILLI, reverse=True)
    assert HLL_LC_MILLI[-1] == 0  # nz = m: empty group, cardinality 0
    assert HLL_LC_MILLI[0] == int(
        math.floor(HLL_M * math.log(HLL_M / 1) * 1000)
    )


def test_hard_negatives_has_single_exchange_before_topk(spark, sf_dir):
    """r12 (verdict #2 decomposition): the pre-shuffle spread was half
    the entry's cost — a second full exchange buying nothing, since
    the per-row map work is linear (scan-stage) and the quadratic
    pair work distributes through the bucket groupBy's own shuffle.
    Pin the shape: exactly ONE shuffle exchange in the physical plan
    (the bucket groupBy; top-k is TakeOrderedAndProject, not a
    sort exchange)."""
    from universal_importer_duckdb_spark.operators.similarity import (
        hard_negative_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df = hard_negative_pairs(emb, cosine_floor=0.3, k=20, n_planes=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "TakeOrderedAndProject" in plan
    # r12 kernel form: the pre-sift is one Arrow-batched per-bucket
    # BLAS pass fed by that single exchange (the 100 TB mining shape);
    # the JVM exact re-score runs on survivors only
    assert "FlatMapGroupsInPandas" in plan


def test_hard_negatives_kernel_drops_cross_length_pairs(spark):
    """r12 kernel contract: the old HOF pre-sift silently dropped
    pairs of unequal-length vectors (zip_with null-pads, nulling the
    fold), and the per-bucket BLAS kernel must reproduce that — it
    groups each bucket by vector length and scores within groups
    only. Three same-direction vectors (same LSH bucket), one ragged:
    only the full-width different-label pair comes back, no crash."""
    from universal_importer_duckdb_spark.operators.similarity import (
        hard_negative_pairs,
    )

    rows = [
        (1, 0, [1.0] * 64),
        (2, 1, [1.0] * 64),
        (3, 0, [1.0] * 32),  # ragged: must pair with nobody
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    out = hard_negative_pairs(df, cosine_floor=0.3, k=10, n_planes=6)
    res = out.collect()
    assert len(res) == 1
    r = res[0]
    assert (r.id_a, r.id_b, r.label_a, r.label_b) == (1, 2, 0, 1)
    assert abs(r.cosine - 1.0) < 1e-12
