"""Round-7 regressions: the r6 verdict/advice items.

- testing._check_oracle_dtypes must red-flag decimal-emitting entries
  (the orders_snapshot_drift driver red — hasher sees Python Decimal
  vs the oracle's pandas float64).
- line_level_dedup / top_collocations: the AQE size gate replaces the
  unconditional broadcasts; broadcast and shuffle paths must emit
  identical rows.
- funnel stage-1: pre-1970 events must count (the old `us >= 0` floor
  silently dropped them only on the Spark side).
- bloom_might_contain: duplicate probe rows must survive the k-fold
  explode/fold-back.
- train_pq_codebook: the bounded sample is ordered, so the codebook
  is invariant to partition layout.
- decode_media: H.264/MP4/Matroska route through the optional-av
  swap-point (install-hint error absent the lib, fake-av wiring +
  frame sampling when present).
- round-7 additions: intra-doc segment dedup, split-leakage audit
  (batch + streaming convergence), DSIR importance/resample, cluster
  canonical selection, shipped-weights quality model, and the 3-stage
  dedup cascade — brute-force pins and plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------- dtype-guard hardening
def test_dtype_guard_rejects_spark_decimal(spark, sf_dir):
    """The r6 orders_snapshot_drift pattern (Spark DECIMAL output) must
    fail fast in the local harness even when values match."""
    from universal_importer_duckdb_spark.testing import (
        _check_oracle_dtypes,
        duckdb_connection,
    )

    con = duckdb_connection(sf_dir)
    old_shape = spark.range(3).select(
        F.col("id").cast("decimal(18,2)").alias("rev_a")
    )
    with pytest.raises(AssertionError, match="decimal"):
        _check_oracle_dtypes(
            old_shape,
            con,
            "SELECT CAST(1.0 AS DECIMAL(18,2)) AS rev_a",
            "old_snapshot_drift_shape",
        )
    con.close()


def test_dtype_guard_rejects_float_oracle_for_integral_spark(spark, sf_dir):
    from universal_importer_duckdb_spark.testing import (
        _check_oracle_dtypes,
        duckdb_connection,
    )

    con = duckdb_connection(sf_dir)
    df = spark.range(3).select(F.col("id").cast("bigint").alias("n"))
    with pytest.raises(AssertionError, match="float64"):
        _check_oracle_dtypes(
            df, con, "SELECT 1.5::DOUBLE AS n", "int_vs_double"
        )
    con.close()


def test_snapshot_drift_emits_doubles(spark, sf_dir):
    from universal_importer_duckdb_spark import entry_queries as eq

    df = eq.REGISTRY["orders_snapshot_drift"][0](spark, sf_dir)
    types = dict(df.dtypes)
    for c in ("rev_a", "rev_b", "rev_delta"):
        assert types[c] == "double", f"{c} must be double, got {types[c]}"


# ------------------------------------- broadcast-vs-shuffle size gates
def _with_thresholds(spark, fn):
    """Run fn() under the default autoBroadcastJoinThreshold and again
    with broadcasts disabled (-1 forces shuffle joins); return both."""
    default = fn().collect()
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced = fn().collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    return default, forced


def test_line_dedup_identical_broadcast_or_shuffle(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        line_level_dedup,
        word_segments,
    )

    boiler = "cookie banner accept all terms apply now click here ok"
    rows = [
        (i, f"{boiler} unique body {i} " + " ".join(f"w{i}_{j}" for j in range(12)))
        for i in range(40)
    ] + [(100 + i, " ".join(f"solo{i}_{j}" for j in range(25))) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        return line_level_dedup(
            docs, splitter=lambda c: word_segments(c, 10)
        ).orderBy("doc_id")

    a, b = _with_thresholds(spark, run)
    assert a == b
    got = {r["doc_id"]: r for r in a}
    assert got[0]["n_removed"] > 0  # boilerplate segment removed
    assert got[100]["n_removed"] == 0
    assert "solo0_0" in got[100]["clean_text"]


def test_line_dedup_order_and_counts_match_bruteforce(spark):
    """Pin the rewritten reassembly (filter + array_join) against a
    per-row python brute force: order preserved, every occurrence of a
    duplicated segment removed, n_removed counts occurrences."""
    from universal_importer_duckdb_spark.operators.line_dedup import (
        line_level_dedup,
        word_segments,
    )

    w = 3
    rows = [
        (1, "a b c x y z a b c"),   # 'a b c' appears twice in doc 1
        (2, "a b c q r s"),         # and in doc 2 -> duplicated
        (3, "q r s t u v"),         # 'q r s' also duplicated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in line_level_dedup(
            docs, splitter=lambda c: word_segments(c, w)
        ).collect()
    }

    def segs(t):
        toks = t.split(" ")
        return [
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        ]

    from collections import defaultdict

    docs_per_seg = defaultdict(set)
    for did, t in rows:
        for s in segs(t):
            docs_per_seg[s].add(did)
    dup = {s for s, ids in docs_per_seg.items() if len(ids) >= 2}
    for did, t in rows:
        ss = segs(t)
        keep = [s for s in ss if s not in dup]
        assert out[did]["n_lines"] == len(ss)
        assert out[did]["n_removed"] == len(ss) - len(keep)
        assert out[did]["clean_text"] == " ".join(keep)


def test_collocations_identical_broadcast_or_shuffle(spark):
    from universal_importer_duckdb_spark.operators.textrank import (
        top_collocations,
    )

    rows = [
        (i, "new york is a big city and new york never sleeps at night")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def run():
        return top_collocations(docs, top_k=10, min_count=5)

    a, b = _with_thresholds(spark, run)
    assert a == b
    assert a[0]["a"] is not None and len(a) > 0


# --------------------------------------------------- funnel stage-1
def test_funnel_counts_pre_1970_events(spark):
    from universal_importer_duckdb_spark.operators.funnel import (
        funnel_by_cohort,
    )

    # epoch-nanos BIGINT ts (the repo-normalized shape); user 1's view
    # is BEFORE 1970 (negative), click/purchase after.
    day_ns = 86_400_000_000_000
    rows = [
        (1, -3 * day_ns, "view"),
        (1, 1 * day_ns, "click"),
        (1, 2 * day_ns, "purchase"),
        (2, 1 * day_ns, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r["cohort_day"]: r for r in funnel_by_cohort(ev).collect()
    }
    assert -3 in got, f"pre-1970 stage-1 event dropped: {got}"
    assert got[-3]["n_stage1"] == 1
    assert got[-3]["n_stage3"] == 1


# ------------------------------------------------------- bloom probes
def test_bloom_probe_preserves_duplicate_rows(spark):
    from universal_importer_duckdb_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    idx = spark.range(100).selectExpr("concat('k', id) AS k")
    words = bloom_build(idx, "k", num_bits=1 << 12, num_hashes=4)
    # probe contains the SAME key three times: the fold must return 3
    # rows, not collapse them.
    probe = spark.createDataFrame(
        [("k1",), ("k1",), ("k1",), ("absent",)], "k string"
    )
    out = bloom_might_contain(probe, "k", words, 1 << 12, 4)
    rows = out.collect()
    assert len(rows) == 4
    assert sum(1 for r in rows if r["k"] == "k1") == 3
    assert all(r["might_contain"] for r in rows if r["k"] == "k1")


# ------------------------------------------------- pq sample ordering
def test_pq_codebook_invariant_to_partition_layout(spark, sf_dir):
    import numpy as np

    from universal_importer_duckdb_spark.operators.pq import (
        train_pq_codebook,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb1 = train_pq_codebook(emb, m=8, k=16, sample_cap=64)
    # scramble the physical layout: different partitioning, reversed
    # within-partition order
    scrambled = emb.repartition(7, F.col("vec_id") % 7).sortWithinPartitions(
        F.desc("vec_id")
    )
    cb2 = train_pq_codebook(scrambled, m=8, k=16, sample_cap=64)
    assert np.array_equal(cb1, cb2)


# --------------------------------------------- textrank overflow guard
def test_textrank_overflow_guard_fires(spark):
    from universal_importer_duckdb_spark.operators import textrank as tr

    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    old_scale = tr.SCALE
    try:
        tr.SCALE = 2**62  # any real edge weight now exceeds the cap
        with pytest.raises(ValueError, match="BIGINT-safe cap"):
            tr.textrank_keywords(docs, iterations=1, top_k=5)
    finally:
        tr.SCALE = old_scale


def test_video_swap_point_without_av_raises_documented():
    """The H.264/MP4/Matroska branch must raise the documented
    install hint when av is absent (this container has no av), for
    every recognized compressed-video container signature."""
    from universal_importer_duckdb_spark.operators.multimodal import (
        decode_media,
    )

    payloads = (
        b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16,   # MP4 ftyp box
        b"\x1a\x45\xdf\xa3" + b"\x00" * 16,           # Matroska EBML
        b"\x00\x00\x00\x01\x67" + b"\x00" * 16,       # Annex-B 4-byte
        b"\x00\x00\x01\x67" + b"\x00" * 16,           # Annex-B 3-byte
    )
    for payload in payloads:
        with pytest.raises(NotImplementedError, match="av"):
            decode_media(payload, "video/mp4")


def test_video_swap_point_uses_av_when_present(monkeypatch):
    """Wiring test with a deterministic fake av: decode_media must
    route MP4 payloads through av.open -> decode(video=0) and emit
    the same feature keys as the pure-Python Y4M decoder."""
    import sys
    import types

    import numpy as np

    class _FakeFrame:
        def __init__(self, fill):
            self._fill = fill

        def to_ndarray(self, format):
            assert format == "gray"
            return np.full((2, 4), self._fill, dtype=np.uint8)

    class _FakeContainer:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            assert video == 0
            return iter([_FakeFrame(3), _FakeFrame(5), _FakeFrame(7)])

    fake_av = types.ModuleType("av")
    fake_av.open = lambda buf: _FakeContainer()
    monkeypatch.setitem(sys.modules, "av", fake_av)

    from universal_importer_duckdb_spark.operators.multimodal import (
        decode_media,
    )

    out = decode_media(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16)
    assert out == {
        "kind": "video",
        "width": 4,
        "height": 2,
        "n_frames": 3,
        "n_sampled": 3,
        "luma_sum": (3 + 5 + 7) * 8,
    }


def test_video_swap_point_frame_sampling(monkeypatch):
    """sample_every skips decode work on skipped frames but still
    counts them, matching decode_y4m's sampling contract."""
    import sys
    import types

    import numpy as np

    decoded = []

    class _FakeFrame:
        def __init__(self, fill):
            self._fill = fill

        def to_ndarray(self, format):
            decoded.append(self._fill)
            return np.full((2, 2), self._fill, dtype=np.uint8)

    class _FakeContainer:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video):
            return iter([_FakeFrame(v) for v in (1, 2, 3, 4, 5)])

    fake_av = types.ModuleType("av")
    fake_av.open = lambda buf: _FakeContainer()
    monkeypatch.setitem(sys.modules, "av", fake_av)

    from universal_importer_duckdb_spark.operators.multimodal import (
        _decode_video_av,
    )

    out = _decode_video_av(b"\x1a\x45\xdf\xa3" + b"\x00" * 8, sample_every=2)
    assert out["n_frames"] == 5
    assert out["n_sampled"] == 3
    assert decoded == [1, 3, 5]
    assert out["luma_sum"] == (1 + 3 + 5) * 4


# ------------------------------ round-7 additions: brute-force pins
def test_intradoc_segment_dedup_matches_bruteforce(spark):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        intradoc_segment_dedup,
        word_segments,
    )

    w = 3
    rows = [
        (1, "a b c x y z a b c x y z q r"),  # 'a b c' + 'x y z' repeat
        (2, "m n o p q r"),                   # nothing repeats
        (3, "k k k k k k k k k"),             # one segment repeated 3x
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in intradoc_segment_dedup(
            docs, splitter=lambda c: word_segments(c, w)
        ).collect()
    }

    for did, t in rows:
        toks = t.split(" ")
        ss = [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]
        seen, keep = set(), []
        for s in ss:
            if s not in seen:
                seen.add(s)
                keep.append(s)
        assert out[did]["n_lines"] == len(ss)
        assert out[did]["n_removed"] == len(ss) - len(keep)
        assert out[did]["clean_text"] == " ".join(keep)


def _py_split(doc_id: int) -> str:
    import hashlib

    hv = int(
        hashlib.md5(f"split-v1:{doc_id}".encode()).hexdigest()[:7], 16
    )
    b1 = int((1 << 28) * 0.98)
    b2 = int((1 << 28) * 0.99)
    return "train" if hv < b1 else ("val" if hv < b2 else "test")


def test_split_leakage_audit_matches_bruteforce(spark):
    """Planted exact duplicates spread over enough ids that at least
    one group straddles train/val|test; compare the full stratum
    table against a python replay of the md5 split + fingerprint."""
    import hashlib
    from collections import defaultdict

    from universal_importer_duckdb_spark.operators.corpus import (
        split_leakage_audit,
    )

    # find ids landing in different splits so the straddle is certain
    ids = list(range(1, 4000))
    by_split = defaultdict(list)
    for i in ids:
        by_split[_py_split(i)].append(i)
    assert by_split["val"] and by_split["test"]
    dup_ids = (
        by_split["train"][:2] + by_split["val"][:1] + by_split["test"][:1]
    )
    uniq_ids = [i for i in by_split["train"][2:12]]
    rows = [(i, "Shared Boilerplate Text") for i in dup_ids] + [
        (i, f"unique text {i}") for i in uniq_ids
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["n_splits"]: (r["n_groups"], r["n_docs"])
        for r in split_leakage_audit(docs).collect()
    }

    groups = defaultdict(set)
    counts = defaultdict(int)
    for did, t in rows:
        f = hashlib.md5(t.lower().encode()).hexdigest()
        groups[f].add(_py_split(did))
        counts[f] += 1
    expect = defaultdict(lambda: [0, 0])
    for f, splits in groups.items():
        expect[len(splits)][0] += 1
        expect[len(splits)][1] += counts[f]
    assert got == {k: tuple(v) for k, v in expect.items()}
    assert 3 in got  # the planted group straddles all three splits


def test_dsir_importance_matches_bruteforce(spark):
    import hashlib
    from collections import Counter, defaultdict

    from universal_importer_duckdb_spark.operators.dsir import (
        SCALE,
        dsir_importance,
    )

    target_vocab = "alpha beta gamma delta".split()
    noise_vocab = "zzz yyy xxx www vvv".split()
    rows = []
    for i in range(10):  # target docs: pure target vocab
        rows.append((i, "tgt", " ".join(target_vocab * 3)))
    for i in range(10, 20):  # mixed docs, increasingly off-target
        k = i - 10
        body = target_vocab * (10 - k) + noise_vocab * k
        rows.append((i, "raw", " ".join(body)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = dsir_importance(
        docs, is_target=F.col("source") == "tgt", n_buckets=64, top_k=20
    ).collect()

    # python replay
    def bucket(wd):
        return int(
            hashlib.md5(f"dsir-v1:{wd}".encode()).hexdigest()[:7], 16
        ) % 64

    per_doc = {}
    c_raw, c_t = Counter(), Counter()
    for did, src, t in rows:
        cnts = Counter(bucket(w) for w in t.lower().split(" ") if w)
        per_doc[did] = cnts
        for b, c in cnts.items():
            c_raw[b] += c
            if src == "tgt":
                c_t[b] += c
    expect = []
    for did, cnts in per_doc.items():
        n = sum(cnts.values())
        s = sum(
            c * (((c_t[b] + 1) * SCALE) // (c_raw[b] + 1))
            for b, c in cnts.items()
        )
        expect.append((did, n, s // n))
    expect.sort(key=lambda r: (-r[2], r[0]))
    assert [(r["doc_id"], r["n_words"], r["score"]) for r in got] == expect
    # ranking sanity: pure-target docs outrank the noisiest mixes
    top10 = {r["doc_id"] for r in got[:10]}
    assert 19 not in top10  # the most off-target doc is not on top


# ------------------------------------------- plan shapes (100 TB story)
def _fmt_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_intradoc_dedup_is_shuffle_free(spark):
    """The operator itself is a pure narrow map: no Exchange in the
    plan (the registry entry adds a spread repartition only to
    parallelize the single-row-group test parquet)."""
    import re

    from universal_importer_duckdb_spark.operators.line_dedup import (
        intradoc_segment_dedup,
        word_segments,
    )

    docs = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    plan = _fmt_plan(
        intradoc_segment_dedup(docs, splitter=lambda c: word_segments(c, 3))
    )
    assert not re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)


def test_dsir_stats_join_broadcasts_at_test_scale(spark, sf_dir):
    """The vocab-bounded (2^14-row) stats table rides under AQE's
    broadcast gate at test SF; the corpus side never re-shuffles for
    the join."""
    from universal_importer_duckdb_spark import entry_queries as eq

    df = eq.REGISTRY["docs_dsir_importance"][0](spark, sf_dir)
    # AQE converts to broadcast at runtime; force materialization then
    # check the final adaptive plan
    df.collect()
    plan = _fmt_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan


def test_split_leakage_audit_has_no_joins(spark, sf_dir):
    from universal_importer_duckdb_spark import entry_queries as eq

    plan = _fmt_plan(eq.REGISTRY["docs_split_leakage_audit"][0](spark, sf_dir))
    assert "Join" not in plan


# -------------------- round-7 phase 2: canonical / streaming / resample
def test_cluster_canonical_matches_bruteforce(spark):
    from universal_importer_duckdb_spark.operators.dedup_text import (
        cluster_canonical,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],
        "doc_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        # doc 2 and 3 tie on length -> canonical must be min id (2)
        [(1, 5), (2, 9), (3, 9), (4, 7), (5, 3)],
        "doc_id long, n_chars long",
    )
    got = {
        r["cluster_id"]: (
            r["n_members"],
            r["canonical_doc_id"],
            r["canonical_n_chars"],
            r["n_chars_dropped"],
        )
        for r in cluster_canonical(clusters, docs).collect()
    }
    assert got == {
        1: (3, 2, 9, 14),  # members 1,2,3; longest tie 2 vs 3 -> 2
        4: (1, 4, 7, 0),
        5: (1, 5, 3, 0),
    }


def test_stream_split_leakage_converges_across_batches(spark, tmp_path):
    """Duplicate fingerprints split across micro-batches: the
    streaming state must merge them and match the batch audit over
    the union."""
    import os

    from universal_importer_duckdb_spark.operators.corpus import (
        split_leakage_audit,
    )
    from universal_importer_duckdb_spark.streaming.docs import (
        DOCS_RAW_SCHEMA,
        finalize_fingerprint_splits,
        stream_documents,
        streaming_fingerprint_splits,
    )

    # ids chosen to land in different splits (see _py_split): build a
    # cross-split duplicate whose copies arrive in DIFFERENT batches
    from collections import defaultdict

    by_split = defaultdict(list)
    for i in range(1, 4000):
        by_split[_py_split(i)].append(i)
    a, b = by_split["train"][0], by_split["val"][0]
    rows1 = [(a, "dup text", "en", "s", 8), (7, "only one", "en", "s", 8)]
    rows2 = [(b, "dup text", "en", "s", 8), (8, "another", "en", "s", 7)]
    d = tmp_path / "docs_stream"
    os.makedirs(d)
    spark.createDataFrame(rows1, DOCS_RAW_SCHEMA).coalesce(1).write.parquet(
        str(d / "b1.parquet")
    )
    spark.createDataFrame(rows2, DOCS_RAW_SCHEMA).coalesce(1).write.parquet(
        str(d / "b2.parquet")
    )

    stream = stream_documents(
        spark, str(d) + "/*", glob="*.parquet", max_files_per_trigger=1
    )
    q = (
        streaming_fingerprint_splits(stream)
        .writeStream.format("memory")
        .queryName("t_stream_leakage_conv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("t_stream_leakage_conv")
    got = sorted(
        tuple(r) for r in finalize_fingerprint_splits(drained).collect()
    )
    batch = spark.createDataFrame(rows1 + rows2, DOCS_RAW_SCHEMA)
    want = sorted(tuple(r) for r in split_leakage_audit(batch).collect())
    assert got == want
    # the cross-batch duplicate really straddles two splits
    assert any(r[0] == 2 for r in got)


def test_dsir_resample_keep_rates_follow_scores(spark):
    """Target-vocab docs (max score) are always kept; off-target docs
    are kept at roughly score/max rate; counts certify per source."""
    from universal_importer_duckdb_spark.operators.dsir import (
        dsir_resample,
        dsir_scores,
    )

    rows = []
    for i in range(40):
        rows.append((i, "tgt", "alpha beta gamma delta " * 5))
    for i in range(40, 120):
        rows.append((i, "raw", "zzz yyy xxx www " * 5))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    tgt = F.col("source") == "tgt"
    out = {r["source"]: r for r in dsir_resample(docs, tgt).collect()}
    assert out["tgt"]["n_docs"] == 40
    # every max-score doc is kept: hv * mx < mx * 2^28 always
    assert out["tgt"]["n_kept"] == 40
    # off-target docs have strictly lower scores -> some are dropped
    assert 0 <= out["raw"]["n_kept"] < out["raw"]["n_docs"]
    # tokens_kept consistent with the kept docs' n_words
    scores = dsir_scores(docs, tgt)
    assert out["tgt"]["tokens_kept"] == (
        scores.filter(F.col("doc_id") < 40)
        .agg(F.sum("n_words"))
        .first()[0]
    )


def test_dsir_resample_counts_wordless_docs(spark):
    """Empty/null-text docs have no score row but must still appear
    in n_docs (never kept)."""
    from universal_importer_duckdb_spark.operators.dsir import (
        dsir_resample,
    )

    rows = [(1, "s0", "alpha beta"), (2, "s1", ""), (3, "s1", None),
            (4, "s1", "alpha zzz")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           dsir_resample(docs, F.col("source") == "s0").collect()}
    assert out["s1"]["n_docs"] == 3
    assert out["s1"]["n_kept"] <= 1  # the wordless docs are never kept


# ------------------------------------- shipped linear quality model
def test_quality_weights_loader_validates(tmp_path):
    import pytest as _pytest

    from universal_importer_duckdb_spark.operators.quality_model import (
        load_quality_weights,
    )

    ok = tmp_path / "w.tsv"
    ok.write_text("#hdr\nthe\t10\nspam\t-20\n")
    assert load_quality_weights(str(ok)) == {"the": 10, "spam": -20}

    dup = tmp_path / "dup.tsv"
    dup.write_text("the\t10\nthe\t20\n")
    with _pytest.raises(ValueError, match="duplicate"):
        load_quality_weights(str(dup))

    bad = tmp_path / "bad.tsv"
    bad.write_text("The\t10\n")
    with _pytest.raises(ValueError, match="not normalized"):
        load_quality_weights(str(bad))

    malformed = tmp_path / "m.tsv"
    malformed.write_text("the 10\n")
    with _pytest.raises(ValueError, match="token<TAB>weight"):
        load_quality_weights(str(malformed))


def test_quality_model_scores_match_bruteforce(spark):
    from universal_importer_duckdb_spark.operators.quality_model import (
        quality_model_scores,
    )

    w = {"good": 100, "bad": -300}
    rows = [
        (1, "good good neutral"),    # raw 200, n 3, logit 66
        (2, "bad good"),             # raw -200, n 2, logit -100
        (3, ""),                     # wordless: all zeros
        (4, None),
        (5, "BAD Good"),             # lowercased: raw -200
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["raw_milli"], r["logit_milli"], r["is_quality"]
        )
        for r in quality_model_scores(docs, w).collect()
    }
    assert got == {
        1: (3, 200, 66, True),
        2: (2, -200, -100, False),
        3: (0, 0, 0, True),
        4: (0, 0, 0, True),
        5: (2, -200, -100, False),
    }


def test_quality_model_is_shuffle_free(spark):
    import re

    from universal_importer_duckdb_spark.operators.quality_model import (
        quality_model_scores,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = _fmt_plan(quality_model_scores(docs, {"a": 1}))
    assert not re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)


def test_dedup_cascade_stage_accounting(spark, sf_dir):
    """Stage totals are monotone non-increasing, stage 0 matches the
    raw corpus, and stage 3's doc count equals the number of distinct
    stage-2 fingerprints."""
    from universal_importer_duckdb_spark import entry_queries as eq
    from universal_importer_duckdb_spark.operators.line_dedup import (
        intradoc_segment_dedup,
        line_level_dedup,
        word_segments,
    )

    out = {r["stage"]: r for r in
           eq.REGISTRY["docs_dedup_cascade"][0](spark, sf_dir).collect()}
    assert set(out) == {0, 1, 2, 3}
    chars = [out[s]["total_chars"] for s in (0, 1, 2, 3)]
    assert chars == sorted(chars, reverse=True)
    docs = eq._t(spark, sf_dir, "documents")
    n = docs.count()
    raw_chars = docs.selectExpr(
        "sum(length(coalesce(text, ''))) v").first()["v"]
    assert out[0]["n_docs"] == n and out[0]["total_chars"] == raw_chars
    assert out[1]["n_docs"] == n and out[2]["n_docs"] == n

    split = lambda c: word_segments(c, 10)  # noqa: E731
    s1 = intradoc_segment_dedup(docs, splitter=split).select(
        "doc_id", F.col("clean_text").alias("text"))
    s2 = line_level_dedup(s1, min_dup_docs=2, splitter=split).select(
        F.md5(F.lower(F.col("clean_text"))).alias("fp"))
    assert out[3]["n_docs"] == s2.distinct().count()


def test_stream_shipped_quality_matches_batch(spark, sf_dir):
    """Stateless streaming map: the drained append output is
    row-identical to the batch quality entry."""
    from universal_importer_duckdb_spark import entry_queries as eq

    got = sorted(
        tuple(r)
        for r in eq.REGISTRY["stream_shipped_quality"][0](
            spark, sf_dir
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in eq.REGISTRY["docs_shipped_quality"][0](
            spark, sf_dir
        ).collect()
    )
    assert got == want
