"""Unit/property tests for the corpus-assembly operators (split,
mixing, decontamination, sequence packing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"tok{i % 7} " * (5 + i % 20) + f"doc {i} body text here",
         "web" if i % 3 == 0 else ("synthetic" if i % 3 == 1 else "books"))
        for i in range(1, 301)
    ]
    return spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id bigint, text string, source string",
    )


def test_hash_split_deterministic_and_complete(docs):
    from universal_importer_duckdb_spark.operators.corpus import hash_split

    a = {r.doc_id: r.split for r in hash_split(docs).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == 300
    # 98/1/1 weights: train must dominate
    n_train = sum(1 for v in a.values() if v == "train")
    assert n_train > 280


def test_hash_split_salt_changes_assignment(docs):
    from universal_importer_duckdb_spark.operators.corpus import hash_split

    a = {r.doc_id: r.split for r in
         hash_split(docs, weights=(("x", 0.5), ("y", 0.5))).collect()}
    b = {r.doc_id: r.split for r in
         hash_split(docs, weights=(("x", 0.5), ("y", 0.5)), salt="other").collect()}
    assert a != b
    # roughly balanced at 50/50
    nx = sum(1 for v in a.values() if v == "x")
    assert 100 < nx < 200


def test_source_mixture_rates_and_subset(docs):
    from universal_importer_duckdb_spark.operators.corpus import (
        source_mixture_sample,
    )

    kept = source_mixture_sample(docs, rates={"web": 0.5, "synthetic": 0.0})
    got = {r.source: r.n for r in
           kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "synthetic" not in got          # rate 0 drops everything
    assert got["books"] == 100             # default rate 1 keeps all
    assert 25 <= got.get("web", 0) <= 75   # ~50% of 100
    # kept is a strict subset decided per row: re-run is identical
    again = source_mixture_sample(docs, rates={"web": 0.5, "synthetic": 0.0})
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_benchmark_overlap_planted_and_short_docs(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        benchmark_ngram_overlap,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, bench_text),                          # the benchmark doc itself
        (2, "prefix " + bench_text + " suffix"),  # contains bench 8-grams
        (3, "totally unrelated words " * 5),      # clean
        (4, "short doc only"),                    # < 8 tokens: zero grams
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    bench = docs.filter("doc_id = 1")
    got = {r.doc_id: (r.n_overlap_ngrams, r.contaminated)
           for r in benchmark_ngram_overlap(docs, bench, n=8).collect()}
    assert got[1][1] and got[1][0] == 3   # 10 tokens -> 3 distinct 8-grams
    assert got[2][1] and got[2][0] == 3   # all bench grams present
    assert got[3] == (0, False)
    assert got[4] == (0, False)


def test_pack_sequences_matches_single_window_any_bucket_width(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        pack_token_sequences,
    )

    rows = [(d, c, 10 + (d * 7 + c) % 23)
            for d in range(1, 40) for c in range((d % 4) + 1)]
    chunks = spark.createDataFrame(
        rows, "doc_id bigint, chunk_idx bigint, chunk_tokens bigint"
    )
    # reference: the textbook one-level global cumsum
    ordered = sorted(rows)
    acc, ref = 0, {}
    for d, c, t in ordered:
        ref[(d, c)] = acc
        acc += t
    for bw in (1, 3, 1000):
        got = {(r.doc_id, r.chunk_idx): (r.tokens_before, r.seq_id, r.seq_offset)
               for r in pack_token_sequences(
                   chunks, seq_len=64, bucket_width=bw).collect()}
        assert len(got) == len(rows)
        for k, before in ref.items():
            b, sid, soff = got[k]
            assert b == before
            assert sid == before // 64 and soff == before % 64


def test_pack_sequences_big_window_is_partitioned(spark):
    """The corpus-sized cumsum must NOT be a global single-partition
    window — only the tiny bucket-totals level may be. Guard the plan
    shape: at least one Window node partitions by the bucket key."""
    from universal_importer_duckdb_spark.operators.corpus import (
        pack_token_sequences,
    )

    chunks = spark.createDataFrame(
        [(d, 0, 5) for d in range(200)],
        "doc_id bigint, chunk_idx bigint, chunk_tokens bigint",
    )
    plan = pack_token_sequences(chunks, seq_len=64, bucket_width=16)
    physical = plan._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    ).lower().replace(" ", "")
    # the row-level cumsum Window must be PARTITIONED by the bucket —
    # weaker checks ("__bucket somewhere", "hashpartitioning(__bucket",
    # or even "windowspecdefinition(__bucket#...ASC") would also hold
    # for a regressed global window via the bucket-TOTALS level, so
    # match the partitioned spec exactly: partition key __bucket
    # followed immediately by the doc_id ordering (the totals window
    # spec instead reads "__bucket#N ASC"). (toString() truncates long
    # field lists; the formatted explain does not.)
    import re

    assert re.search(r"windowspecdefinition\(__bucket#\d+l,doc_id#", physical)


def test_scoped_cache_release(spark):
    from universal_importer_duckdb_spark.caching import (
        release_scoped,
        scoped_cache,
    )

    df = scoped_cache(spark.range(1000))
    df.count()
    assert df.storageLevel.useMemory
    n = release_scoped(spark)
    assert n >= 1
    # ledger drained: releasing again is a no-op
    assert release_scoped(spark) == 0


def test_repetition_signals_flags_spam_not_short(spark):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        repetition_signals,
    )

    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "a normal varied sentence here"),   # short: frac high but guarded
        (3, " ".join(f"w{i}" for i in range(30))),  # long, zero repetition
        (4, "go go " + " ".join(f"t{i}" for i in range(20))),  # one adjacent
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert got[1].repetitive and got[1].top_bigram_frac == 1.0
    assert not got[2].repetitive          # min_bigrams guard
    assert not got[3].repetitive and got[3].n_adjacent_repeats == 0
    assert got[4].n_adjacent_repeats == 1 and not got[4].repetitive


def test_cross_doc_ngram_dup_exact_copy_scores_one(spark):
    from universal_importer_duckdb_spark.operators.corpus import (
        cross_doc_ngram_dup,
    )

    long = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, long),               # copy A
        (2, long),               # copy B -> both score 1.0
        (3, " ".join(f"u{i}" for i in range(20))),  # unique -> 0.0
        (4, "short doc"),        # <13 tokens -> zero grams
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in cross_doc_ngram_dup(docs, n=13).collect()}
    assert got[1].dup_gram_frac == 1.0 and got[2].dup_gram_frac == 1.0
    assert got[1].n_grams == 8    # 20 tokens -> 8 distinct 13-grams
    assert got[3].dup_gram_frac == 0.0 and got[3].n_dup_grams == 0
    assert got[4].n_grams == 0 and got[4].dup_gram_frac == 0.0


def test_cap_per_key_two_stage_equals_one_stage(docs):
    from universal_importer_duckdb_spark.operators.corpus import cap_per_key

    one = cap_per_key(docs, "source", 7, ["doc_id"], presift_salts=0)
    two = cap_per_key(docs, "source", 7, ["doc_id"], presift_salts=8)
    a = sorted((r.source, r.doc_id, r.rn) for r in one.collect())
    b = sorted((r.source, r.doc_id, r.rn) for r in two.collect())
    assert a == b  # salting never changes the kept set
    per_key = {}
    for s, _, rn in a:
        per_key[s] = max(per_key.get(s, 0), rn)
    assert all(v <= 7 for v in per_key.values())
    # the kept rows are the k SMALLEST doc_ids per key
    smallest_web = sorted(
        r.doc_id for r in docs.filter("source = 'web'").collect()
    )[:7]
    assert sorted(d for s, d, _ in a if s == "web") == smallest_web


def test_stratified_hash_sample_stable_under_growth(docs):
    from universal_importer_duckdb_spark.operators.corpus import (
        stratified_hash_sample,
    )

    full = stratified_hash_sample(docs, "source", 5)
    ids_full = {r.doc_id for r in full.collect()}
    assert full.count() == 15  # 3 strata x 5
    # dropping unrelated rows never changes members that remain ranked:
    # the sample from a 2/3 subset shares most members with the full one
    sub = stratified_hash_sample(docs.filter("doc_id % 3 != 0"), "source", 5)
    ids_sub = {r.doc_id for r in sub.collect()}
    assert ids_sub  # sanity
    # every full-sample member still present in the subset stays sampled
    # unless displaced by nothing (subset can only REMOVE competitors)
    surviving = {i for i in ids_full if i % 3 != 0}
    assert surviving <= ids_sub


def test_char_trigram_familiarity_bounds_and_edges(spark):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        char_ngram_familiarity,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),   # exact dup: same grams
            (3, "zq"),                        # too short: no trigrams
            (4, "xqzj vwkp qzxv"),            # gibberish: unique grams
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in char_ngram_familiarity(df).collect()}
    assert out[3].n_distinct_grams == 0 and out[3].familiarity == 0.0
    # duplicated prose scores strictly higher than one-off gibberish
    assert out[1].familiarity > out[4].familiarity
    for r in out.values():
        assert 0.0 <= r.familiarity <= 1.0
    assert out[1].familiarity == out[2].familiarity


def test_casefold_contract_boundary(spark):
    """Pin the ASCII-only casefold contract the Arrow gram/fingerprint
    kernels rely on (operators/corpus.py, operators/quality_model.py:
    Python str.lower() must agree with Spark's lower() AND the
    DuckDB oracle's lower(), or the md5 gram spaces silently diverge).

    The contract holds on ASCII — asserted exhaustively here. It is
    KNOWN to break outside ASCII: U+0130 ('İ') lowers to 'i̇' (i +
    combining dot, full SpecialCasing) in Python and the JVM but to
    plain 'i' (simple casemap) in DuckDB — so the boundary is pinned
    by asserting the divergence EXISTS, the xfail-style marker the
    r14 advice asked for. Non-ASCII corpora need an explicit shared
    fold before the kernels' hashes can be compared cross-engine.
    """
    import duckdb

    ascii_cps = [chr(c) for c in range(0x20, 0x7F)]
    probe = ascii_cps + ["İ", "ß", "Σ", "µ"]
    sdf = spark.createDataFrame([(s,) for s in probe], "s string")
    spark_low = {
        r["s"]: r["low"]
        for r in sdf.select("s", F.lower("s").alias("low")).collect()
    }
    con = duckdb.connect()
    duck_low = {
        s: con.execute("SELECT lower(?)", [s]).fetchone()[0] for s in probe
    }
    # 1) ASCII: all three engines agree exhaustively
    for s in ascii_cps:
        assert spark_low[s] == duck_low[s] == s.lower(), hex(ord(s))
    # 2) the boundary is real: U+0130 diverges Python/JVM vs DuckDB
    assert "İ".lower() == "i̇"
    assert duck_low["İ"] == "i", "DuckDB changed its İ casemap — " \
        "re-evaluate the ASCII-only contract in the Arrow kernels"
    assert spark_low["İ"] != duck_low["İ"]
