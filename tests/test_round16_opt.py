"""Round-16 optimization invariants: the simhash pair-expansion Arrow
kernel and the batch-dedup fingerprint kernel must be bit-identical to
the expression forms they replace (the admission-kernel playbook —
every kernel swap ships with a live differential oracle on real data),
and the q9 flat-broadcast revision must keep its exact fixed-point
semantics (covered by tests/test_oracle_parity.py; the plan-shape
claim lives in plans/r16)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def test_simhash_pair_kernel_matches_expr_on_real_data(spark, sf_dir):
    """Full row-set equality (ids, hamming, multiplicity) between the
    Arrow pair kernel and the interpreted HOF expansion on the real
    certification corpus."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_near_pairs_portable,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kern = _pairs(simhash_near_pairs_portable(docs, max_hamming=8))
    expr = _pairs(
        simhash_near_pairs_portable(docs, max_hamming=8, pair_impl="expr")
    )
    assert kern == expr and len(kern) > 0


def test_simhash_pair_kernel_hamming_boundary(spark):
    """Pairs at exactly max_hamming survive; max_hamming+1 is cut —
    in BOTH implementations. Fingerprints are forced through the real
    text pipeline by crafting doc pairs with identical token sets
    except a controlled difference."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_near_pairs_portable,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    rows = [
        (1, base),
        (2, base),                       # hamming 0 twin
        (3, base + " omega omega"),      # small perturbation
        (4, "totally different words " * 16),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    for h in (0, 8):
        kern = _pairs(simhash_near_pairs_portable(docs, max_hamming=h))
        expr = _pairs(
            simhash_near_pairs_portable(docs, max_hamming=h, pair_impl="expr")
        )
        assert kern == expr
        assert all(r[2] <= h for r in kern)
    assert (1, 2, 0) in _pairs(simhash_near_pairs_portable(docs, max_hamming=0))


def test_simhash_pair_kernel_null_text_and_dup_fps(spark):
    """NULL text fingerprints like '' (the kernel's None -> "" rule);
    many identical fingerprints in one bucket expand to all C(m,2)
    pairs in both forms."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_near_pairs_portable,
    )

    same = "one two three four five six seven eight"
    rows = [(i, same) for i in range(1, 6)] + [(6, None), (7, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    kern = _pairs(simhash_near_pairs_portable(docs, max_hamming=8))
    expr = _pairs(
        simhash_near_pairs_portable(docs, max_hamming=8, pair_impl="expr")
    )
    assert kern == expr
    # the 5 identical docs yield all 10 pairs at hamming 0
    assert sum(1 for a, b, h in kern if a <= 5 and b <= 5 and h == 0) == 10
    # the two null-text docs pair with each other
    assert (6, 7, 0) in kern


def test_simhash_pair_kernel_non_integral_id_falls_back(spark):
    """String ids cannot enter the numpy kernel; the operator must
    route them through the expr path and still produce pairs."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_near_pairs_portable,
    )

    same = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [("a", same), ("b", same)], "doc_id string, text string"
    )
    out = simhash_near_pairs_portable(docs, max_hamming=8)
    rows = {tuple(r) for r in out.collect()}
    assert rows == {("a", "b", 0)}


def test_simhash_fp_kernel_token_dedup_edge_cases(spark):
    """The batch-dedup fingerprint kernel vs the expression path on
    adversarial token shapes: empty string, single token repeated,
    consecutive spaces (empty tokens), null text."""
    from universal_importer_duckdb_spark.operators.dedup_text import (
        simhash_32x2_portable,
    )

    rows = [
        (1, ""),
        (2, None),
        (3, "x"),
        (4, "x x x x"),
        (5, "a  b"),          # consecutive spaces: '' is a token
        (6, "unique tokens only here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = {r.doc_id: (r.fp_lo, r.fp_hi)
         for r in simhash_32x2_portable(docs, impl="pandas").collect()}
    b = {r.doc_id: (r.fp_lo, r.fp_hi)
         for r in simhash_32x2_portable(docs, impl="expr").collect()}
    assert a == b and len(a) == 6
    # null text and empty text share the [''] token list -> same fp
    assert a[1] == a[2]


def test_containment_hashed_blocking_still_lossless(spark):
    """r16 hashed-gram blocking (xxhash64 at the map): planted
    containment pairs must still be found exactly — the rare pick may
    change, the verified output may not. Exercises >=7-token
    containees, a too-short containee (excluded by contract), and
    mutual containment (one removable side)."""
    from universal_importer_duckdb_spark.operators.containment import (
        containment_dedup_pairs,
    )

    inner = "one two three four five six seven eight nine"
    rows = [
        (1, inner),
        (2, f"prefix words {inner} suffix words"),        # contains 1
        (3, f"{inner} trailing"),                          # contains 1
        (4, "tiny doc"),                                   # too short
        (5, inner),                                        # equal text to 1
        (6, "unrelated content that matches nothing at all here ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {tuple(r) for r in containment_dedup_pairs(docs).collect()}
    assert (1, 2) in got and (1, 3) in got
    assert (5, 2) in got and (5, 3) in got
    # equal-text mutual containment keeps exactly the larger-id side
    assert (5, 1) in got and (1, 5) not in got
    assert not any(a == 4 or b == 4 for a, b in got)
    assert not any(a == 6 or b == 6 for a, b in got)


def test_popcnt16_lut_is_exact():
    import numpy as np

    from universal_importer_duckdb_spark.operators.dedup_text import (
        _POPCNT16,
    )

    vals = np.array([0, 1, 0xFFFF, 0x8000, 0x5555, 0x1234], dtype=np.int64)
    want = [bin(int(v)).count("1") for v in vals]
    assert list(_POPCNT16[vals]) == want
    assert len(_POPCNT16) == 1 << 16
