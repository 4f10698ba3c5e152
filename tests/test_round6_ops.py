"""Round-6 operators: Bloom-prefiltered dedup, line-level dedup,
containment dedup, ordered funnel, curriculum staging."""

from __future__ import annotations

from pyspark.sql import functions as F


# --------------------------------------------------------------- bloom
def test_bloom_no_false_negatives(spark):
    from universal_importer_duckdb_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.range(500).selectExpr("concat('k', id) AS k")
    words = bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    flagged = bloom_might_contain(keys, "k", words, 1 << 12, 4)
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_bloom_tiny_filter_still_exact_after_verify(spark):
    """A deliberately undersized bitmap (massive false-positive rate)
    must not change the dedup result — false positives only route
    more keys through the exact verify join."""
    from universal_importer_duckdb_spark.operators.bloom import (
        bloom_incremental_dedup,
    )
    from universal_importer_duckdb_spark.operators.dedup_text import (
        incremental_exact_dedup,
    )

    docs = spark.range(300).selectExpr(
        "id AS doc_id", "concat('text ', id % 120) AS text"
    )
    batch = docs.filter("doc_id % 3 = 0")
    index = docs.filter("doc_id % 3 <> 0")
    got = bloom_incremental_dedup(
        batch, index, num_bits=64, num_hashes=2
    )  # 64-bit bloom for 80 keys: nearly everything collides
    want = incremental_exact_dedup(batch, index)
    assert sorted(got.collect()) == sorted(want.collect())


def test_bloom_rejects_most_new_keys(spark):
    """Sanity on the scale claim: with a correctly sized bitmap, keys
    NOT in the index are mostly filtered out before the verify join."""
    from universal_importer_duckdb_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    idx = spark.range(1000).selectExpr("concat('old', id) AS k")
    probe = spark.range(1000).selectExpr("concat('new', id) AS k")
    words = bloom_build(idx, "k", num_bits=1 << 16, num_hashes=5)
    fp = (
        bloom_might_contain(probe, "k", words, 1 << 16, 5)
        .filter("might_contain")
        .count()
    )
    assert fp < 50  # ~0.6% expected at these parameters


# ---------------------------------------------------------- line dedup
def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_dedup_removes_boilerplate_keeps_order(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        line_level_dedup,
    )

    docs = _mkdocs(
        spark,
        [
            (1, "unique alpha\ncookie banner\nunique beta"),
            (2, "cookie banner\nother text"),
            (3, "zeta\nonly here"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in line_level_dedup(docs, min_dup_docs=2, joiner="\n").collect()
    }
    assert out[1]["clean_text"] == "unique alpha\nunique beta"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 3
    assert out[2]["clean_text"] == "other text"
    assert out[3]["clean_text"] == "zeta\nonly here"
    assert out[3]["n_removed"] == 0


def test_line_dedup_fully_boilerplate_doc_and_null_text(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        line_level_dedup,
    )

    docs = _mkdocs(
        spark,
        [(1, "dup line"), (2, "dup line"), (3, None), (4, "")],
    )
    out = {
        r["doc_id"]: r for r in line_level_dedup(docs, min_dup_docs=2).collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 1
    assert out[3]["n_lines"] == 0 and out[3]["clean_text"] == ""
    assert out[4]["n_lines"] == 0  # empty lines never counted


def test_word_segments_splitter_widths(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        word_segments,
    )

    df = spark.createDataFrame(
        [("a b c d e f g",)], "text string"
    ).select(word_segments(F.col("text"), 3).alias("s"))
    assert df.collect()[0]["s"] == ["a b c", "d e f", "g"]


# --------------------------------------------------------- containment
def test_containment_pairs_brute_force_equivalence(spark):
    from universal_importer_duckdb_spark.operators.containment import (
        containment_dedup_pairs,
    )

    rows = [
        (1, "one two three four five six seven"),
        (2, "zzz one two three four five six seven yyy"),  # contains 1 aligned
        (3, "xone two three four five six sevenx"),  # char-wise, unaligned
        (4, "one two three four five six seven"),  # equal text to 1
        (5, "short text below the floor"),  # < 7 tokens: excluded
        (6, "a short text below the floor b c d"),  # contains 5; 5 excluded
    ]
    docs = _mkdocs(spark, rows)
    got = {
        (r["contained_id"], r["container_id"])
        for r in containment_dedup_pairs(docs).collect()
    }
    want = set()
    for a, ta in rows:
        if len(ta.split(" ")) < 7:
            continue
        for b, tb in rows:
            if a != b and ta in tb and (
                len(ta) < len(tb) or (len(ta) == len(tb) and a > b)
            ):
                want.add((a, b))
    assert got == want
    assert (1, 2) in got and (1, 3) in got  # incl. the unaligned case
    assert (4, 1) in got and (1, 4) not in got  # equal-text tiebreak
    assert not any(c == 5 for c, _ in got)


# -------------------------------------------------------------- funnel
def test_funnel_ignores_out_of_order_stages(spark):
    from universal_importer_duckdb_spark.operators.funnel import (
        funnel_by_cohort,
    )

    day = 86_400_000_000_000  # ns
    rows = [
        # user 1: full ordered funnel on day 0
        (1, 1 * 10**9, "view"),
        (1, 2 * 10**9, "click"),
        (1, 3 * 10**9, "purchase"),
        # user 2: purchase BEFORE view -> stage3 must not count
        (2, 1 * 10**9 + day, "purchase"),
        (2, 2 * 10**9 + day, "view"),
        (2, 3 * 10**9 + day, "click"),
        # user 3: view only
        (3, 5 * 10**9, "view"),
        # user 4: never viewed -> not in funnel at all
        (4, 5 * 10**9, "click"),
    ]
    events = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_type string"
    )
    out = {r["cohort_day"]: r for r in funnel_by_cohort(events).collect()}
    d0, d1 = out[0], out[1]
    assert (d0["n_stage1"], d0["n_stage2"], d0["n_stage3"]) == (2, 1, 1)
    assert d0["total_conversion_micros"] == 2 * 10**6
    assert (d1["n_stage1"], d1["n_stage2"], d1["n_stage3"]) == (1, 1, 0)
    assert 4 not in {u for r in out.values() for u in []}  # doc intent


# ---------------------------------------------------------- curriculum
def test_curriculum_ansi_ntile_and_monotonicity(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        curriculum_stages,
    )

    df = spark.createDataFrame(
        [(i, (i * 7) % 10) for i in range(10)], "doc_id bigint, s bigint"
    )
    out = curriculum_stages(df, "s", n_stages=4).collect()
    sizes = {}
    for r in out:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}  # ANSI: first n%k get +1
    by_stage = sorted(out, key=lambda r: (r["stage"], r["score"]))
    scores = [r["score"] for r in by_stage]
    assert scores == sorted(scores)  # stages are contiguous score ranges


# ---------------------------------------------------------- textrank
def test_textrank_matches_pure_python_replay(spark):
    from universal_importer_duckdb_spark.operators.textrank import (
        SCALE,
        textrank_keywords,
    )

    corpus = [
        (1, "spark shuffles data across executors"),
        (2, "spark caches data in memory"),
        (3, "executors spill data to disk"),
        (4, "memory pressure causes spill"),
        (5, "solo"),  # 1 token: contributes no edges
    ]
    docs = _mkdocs(spark, corpus)
    got = {
        r["word"]: r["rank"]
        for r in textrank_keywords(docs, iterations=5, top_k=50).collect()
    }

    # pure-python replay of the identical integer recursion
    from collections import defaultdict

    und = defaultdict(int)
    for _, text in corpus:
        t = text.split(" ")
        for a, b in zip(t, t[1:]):
            if a != b:
                und[(a, b)] += 1
    edges = defaultdict(int)
    for (a, b), w in und.items():
        edges[(a, b)] += w
        edges[(b, a)] += w
    wout = defaultdict(int)
    for (s, _), w in edges.items():
        wout[s] += w
    nodes = sorted(wout)
    n = len(nodes)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(5):
        contrib = defaultdict(int)
        for (s, d), w in edges.items():
            contrib[d] += (rank[s] * w) // wout[s]
        rank = {
            v: (15 * SCALE) // (100 * n) + (85 * contrib[v]) // 100
            for v in nodes
        }
    assert got == rank
    assert "data" in got and got["data"] == max(got.values())  # hub word


def test_textrank_single_token_docs_yield_empty_graph(spark):
    from universal_importer_duckdb_spark.operators.textrank import (
        textrank_keywords,
    )

    docs = _mkdocs(spark, [(1, "alone"), (2, "also")])
    assert textrank_keywords(docs).count() == 0


# ------------------------------------------------- temperature mixture
def test_temperature_resample_flattens_and_is_deterministic(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        temperature_resample,
    )

    rows = [(i, "big" if i < 6400 else "small") for i in range(6500)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    kept = temperature_resample(docs, "source", "doc_id", 2, 10)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected ~ 10*sqrt(n_s): big ~800/6400 (12.5%), small ~100/100 (all)
    assert counts["small"] == 100  # thr=10*10 >= n_s keeps everything
    assert 500 < counts["big"] < 1100  # hash-thresholded ~800
    again = temperature_resample(docs, "source", "doc_id", 2, 10)
    assert sorted(kept.collect()) == sorted(again.collect())  # no RNG


# ------------------------------------------------------ narratives
def test_user_narratives_ordering_and_rendering(spark):
    from universal_importer_duckdb_spark.operators.narrative import (
        user_event_narratives,
    )

    rows = [
        (7, 2_000_000_000, 11, "click", 1.5),
        (7, 1_000_000_000, 10, "view", None),
        (7, 2_000_000_000, 12, "purchase", 10.0),  # ts tie -> event_id order
    ]
    events = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint, "
              "event_type string, value double"
    )
    out = user_event_narratives(events).collect()[0]
    assert out["n_events"] == 3
    assert out["narrative"] == (
        "t=1000000 view v=null | t=2000000 click v=150 | "
        "t=2000000 purchase v=1000"
    )


# ------------------------------------------------- streaming funnel
def test_streaming_funnel_converges_across_batches(spark, tmp_path):
    """Late-arriving earlier view: user 1's click lands in batch 1,
    the view that makes it count arrives in batch 2. State must
    re-resolve and match the batch funnel over the union."""
    import os

    from universal_importer_duckdb_spark.operators.funnel import (
        funnel_by_cohort,
    )
    from universal_importer_duckdb_spark.streaming.funnel import (
        finalize_funnel_cohorts,
        streaming_funnel_stages,
    )

    rows1 = [(11, 1, 5_000_000_000, "click", 1.0, "{}")]
    rows2 = [
        (12, 1, 2_000_000_000, "view", 1.0, "{}"),
        (13, 1, 9_000_000_000, "purchase", 2.0, "{}"),
        (14, 2, 1_000_000_000, "view", 1.0, "{}"),
    ]
    schema = (
        "event_id bigint, user_id bigint, ts bigint, event_type string, "
        "value double, props string"
    )
    d = tmp_path / "stream_src"
    os.makedirs(d)
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )

    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(str(d) + "/*/")
    )
    q = (
        streaming_funnel_stages(stream)
        .writeStream.format("memory")
        .queryName("t_stream_funnel_conv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("t_stream_funnel_conv")
    assert drained.count() >= 2  # at least one update row per batch
    got = sorted(
        tuple(r) for r in finalize_funnel_cohorts(drained).collect()
    )

    batch_events = spark.createDataFrame(rows1 + rows2, schema).select(
        "user_id", "ts", "event_type"
    )
    want = sorted(tuple(r) for r in funnel_by_cohort(batch_events).collect())
    assert got == want
    # and the chain really resolved: user 1 fully converted
    assert any(r[3] == 1 for r in got)  # n_stage3 == 1 somewhere


# ------------------------------------------------------- knn join
def test_knn_join_small_n_and_duplicate_vectors(spark):
    from universal_importer_duckdb_spark.operators.similarity import (
        knn_join_exact,
    )

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),  # exact duplicate of 1
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {
        (r["vec_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join_exact(df, k=5).collect()  # k > n-1
    }
    # every vector gets exactly n-1 = 2 neighbors; duplicates rank
    # first with cosine 1.0, ties by neighbor id
    assert out[(1, 1)] == 2 and out[(2, 1)] == 1
    assert out[(3, 1)] in (1, 2) and out[(3, 2)] in (1, 2)
    assert len(out) == 6


# ------------------------------------------------- expectation suite
def test_expectation_suite_detects_planted_violations(spark):
    from universal_importer_duckdb_spark.operators.expectations import (
        Expectation,
        orphan_count,
        run_expectations,
    )

    df = spark.createDataFrame(
        [(1, "A", None), (1, "B", 5), (2, "Z", 200)],
        "k bigint, status string, v int",
    )
    out = {
        r["check_name"]: (r["passed"], r["observed_num"], r["observed_den"])
        for r in run_expectations(
            df,
            [
                Expectation("rows", "row_count_between", lo=1, hi=2),
                Expectation("k_unique", "unique", column="k"),
                Expectation("v_nulls", "null_fraction_at_most",
                            column="v", num=1, den=4),
                Expectation("v_max", "max_at_most", column="v", hi=100),
                Expectation("status_dom", "values_in",
                            column="status", values=("A", "B")),
            ],
        ).collect()
    }
    assert out["rows"] == (False, 3, 1)        # 3 not in [1,2]
    assert out["k_unique"] == (False, 1, 1)    # one duplicate k
    assert out["v_nulls"] == (False, 1, 3)     # 1/3 > 1/4
    assert out["v_max"] == (False, 200, 1)
    assert out["status_dom"] == (False, 1, 1)  # 'Z'

    parent = spark.createDataFrame([(1,)], "k bigint")
    fk = orphan_count(df, parent, "k", "k").collect()[0]
    assert fk["passed"] is False and fk["observed_num"] == 1  # k=2 orphan


# ------------------------------------------------------------- PQ
def test_pq_reconstruction_determinism_and_adc_recall(spark, sf_dir):
    import numpy as np

    from universal_importer_duckdb_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebook,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = train_pq_codebook(emb, m=8, k=16)
    assert cb.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    enc = pq_encode(emb, cb)
    rows = enc.collect()
    n = emb.count()
    assert len(rows) == n
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r["codes"])

    # determinism: training + encoding replay identically
    cb2 = train_pq_codebook(emb, m=8, k=16)
    assert np.array_equal(cb, cb2)
    rows2 = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cb2).collect()}
    assert {r["vec_id"]: r["codes"] for r in rows} == rows2

    # reconstruction budget: quantized vectors stay close to unit-ish
    # norm originals (random 64-dim embeddings have |x| ~ 1). recon_d2
    # is the integer squared distance in the 10^-6-quantized space;
    # sqrt/QSCALE converts back to float-equivalent L2.
    errs = np.array([np.sqrt(r["recon_d2"]) / 1e6 for r in rows])
    assert errs.mean() < 1.0  # far below the ~1.4 of a zero codebook

    # ADC top-10 must substantially agree with the exact L2 top-10
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    q_id = min(vecs)
    q = vecs[q_id]
    adc = [
        r["vec_id"]
        for r in pq_adc_topk(enc, cb, list(q), topk=10).collect()
    ]
    exact = sorted(vecs, key=lambda i: ((vecs[i] - q) ** 2).sum())[:10]
    assert q_id in adc[:3]  # the query itself quantizes nearest
    # random embeddings have near-uniform pairwise distances — the
    # hardest case for PQ — so pin "far above chance" rather than a
    # production recall: random 10-of-500 overlap expects ~0.2 hits
    assert len(set(adc) & set(exact)) >= 2


def test_pq_adc_entry_audit_column(spark):
    from universal_importer_duckdb_spark.entry_queries import (
        REGISTRY,
    )

    rows = REGISTRY["emb_pq_adc_topk"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    hits = sum(r["in_exact_topk"] for r in rows)
    assert hits >= 2  # above-chance agreement with the true L2 top-10
    dists = [r["adc_d2"] for r in rows]
    assert dists == sorted(dists)


# --------------------------------------- near-dup recall audit
def test_minhash_recall_vs_exact_jaccard_bruteforce(spark, sf_dir):
    """End-to-end quality audit of the approximate dedup path: every
    pair the exact O(n^2) Jaccard scan finds above threshold should
    be recovered by MinHash-LSH at high rate (banding theory), and
    every emitted pair must genuinely clear the threshold (the exact
    verify guarantees precision = 1)."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, num_perm=32, bands=8, shingle_n=5,
            jaccard_threshold=0.4, sample_mod=4,
        ).collect()
    }

    # brute-force exact Jaccard on the same shingle definition
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]

    def shingles(t):
        toks = [w for w in t.split(" ") if w]
        return {
            " ".join(toks[i : i + 5]) for i in range(max(len(toks) - 4, 0))
        }

    sets = {i: shingles(t) for i, t in rows if t}
    truth = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        a = ids[x]
        for y in range(x + 1, len(ids)):
            b = ids[y]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= 0.4:
                truth.add((a, b))

    assert got <= truth  # precision 1.0: exact verify never lies
    if truth:
        recall = len(got & truth) / len(truth)
        assert recall >= 0.8  # 8 bands x 4 rows at j>=0.4


# ------------------------------------------- contamination spans
def test_contamination_spans_merge_overlapping_windows(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        contamination_spans,
    )

    bench = _mkdocs(spark, [(100, "b1 b2 b3 b4")])
    docs = _mkdocs(
        spark,
        [
            # one contaminated 4-gram window -> one span
            (1, "x1 x2 b1 b2 b3 b4 b2 z1 z2"),
            # two DISJOINT windows -> two spans
            (2, "y1 b1 b2 b3 b4 y2 y3 b1 b2 b3 b4 y4"),
            (3, "clean doc with no benchmark text at all"),
        ],
    )
    out = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_grams"]
        for r in contamination_spans(docs, bench, n=4).collect()
    }
    # doc 1: single window "b1 b2 b3 b4" at position 3 -> span 3..6
    assert out[(1, 3, 6)] == 1
    # doc 2: two disjoint windows -> two spans
    assert out[(2, 2, 5)] == 1 and out[(2, 8, 11)] == 1
    assert not any(d == 3 for d, _, _ in out)


def test_contamination_spans_overlap_merge(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        contamination_spans,
    )

    # benchmark contains a 5-token run, so a doc containing the same
    # run yields TWO overlapping 4-gram hits that must merge into one
    bench = _mkdocs(spark, [(100, "b1 b2 b3 b4 b5")])
    docs = _mkdocs(spark, [(1, "x b1 b2 b3 b4 b5 y")])
    rows = contamination_spans(docs, bench, n=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["span_start"], r["span_end"], r["n_grams"]) == (2, 6, 2)


def test_excise_spans_surgical_removal(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        contamination_spans,
        excise_spans,
    )

    bench = _mkdocs(spark, [(100, "b1 b2 b3 b4")])
    docs = _mkdocs(
        spark,
        [
            (1, "keep1 b1 b2 b3 b4 keep2"),
            (2, "all clean tokens here ok"),
            (3, "b1 b2 b3 b4"),  # fully contaminated
        ],
    )
    out = {
        r["doc_id"]: (r["n_tokens_removed"], r["clean_text"])
        for r in excise_spans(
            docs, contamination_spans(docs, bench, n=4)
        ).collect()
    }
    assert out[1] == (4, "keep1 keep2")
    assert out[2] == (0, "all clean tokens here ok")
    assert out[3] == (4, "")


# ------------------------------------------------- audio energy windows
def test_audio_energy_windows_exact_partial_tail(spark):
    from pyspark.sql import functions as F2

    from universal_importer_duckdb_spark.operators.multimodal import (
        attach_media_column,
        encode_wav_pcm16,
        extract_audio_energy_windows,
    )

    samples = [3] * 10 + [-4] * 7  # 17 samples, window 8 -> 8+8+1
    wav = encode_wav_pcm16(8000, 1, samples)
    df = spark.createDataFrame([(1, bytearray(wav))], "item_id bigint, payload binary")
    media = attach_media_column(df, "payload", "audio/wav", "item_id")
    out = {
        r["window_idx"]: (r["n_in_window"], r["sum_sq"])
        for r in extract_audio_energy_windows(media, 8).collect()
    }
    assert out[0] == (8, 8 * 9)
    assert out[1] == (8, 2 * 9 + 6 * 16)
    assert out[2] == (1, 16)  # partial tail window kept


# ------------------------------------------------- image tiling
def test_image_tiles_partial_edges_and_exact_sums(spark):
    from universal_importer_duckdb_spark.operators.multimodal import (
        attach_media_column,
        encode_png_gray,
        extract_image_tiles,
    )

    # 10x5 image, tile 4 -> grid 3x2 with partial right/bottom tiles
    w, h = 10, 5
    rows = [[(r * w + x) % 256 for x in range(w)] for r in range(h)]
    png = encode_png_gray(w, h, rows)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "item_id bigint, payload binary"
    )
    media = attach_media_column(df, "payload", "image/png", "item_id")
    out = {
        (r["tile_y"], r["tile_x"]): (r["n_px"], r["luma_sum"])
        for r in extract_image_tiles(media, 4).collect()
    }
    assert len(out) == 6  # 2 tile rows x 3 tile cols
    for (ty, tx), (npx, s) in out.items():
        want_px = [
            rows[r][x]
            for r in range(ty * 4, min(ty * 4 + 4, h))
            for x in range(tx * 4, min(tx * 4 + 4, w))
        ]
        assert (npx, s) == (len(want_px), sum(want_px))


# ------------------------------------------------------ image resize
def test_resize_images_roundtrip_exact(spark):
    from universal_importer_duckdb_spark.operators.multimodal import (
        attach_media_column,
        decode_png,
        encode_png_gray,
        resize_images,
    )

    w, h = 9, 6  # factor 2 -> 5x3 with a partial right column
    rows = [[(r * w + x) * 4 % 256 for x in range(w)] for r in range(h)]
    png = encode_png_gray(w, h, rows)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "item_id bigint, payload binary"
    )
    media = attach_media_column(df, "payload", "image/png", "item_id")
    out = resize_images(media, factor=2).collect()[0]
    assert (out["out_width"], out["out_height"]) == (5, 3)

    # the emitted bytes are a VALID png decoding to the exact
    # floor-average blocks
    d = decode_png(bytes(out["png"]))
    got = d["pixels"][:, :, 0]
    for by in range(3):
        for bx in range(5):
            block = [
                rows[r][x]
                for r in range(by * 2, min(by * 2 + 2, h))
                for x in range(bx * 2, min(bx * 2 + 2, w))
            ]
            assert got[by][bx] == sum(block) // len(block)

    # determinism: byte-identical re-run
    again = resize_images(media, factor=2).collect()[0]
    assert bytes(again["png"]) == bytes(out["png"])
