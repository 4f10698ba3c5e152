"""Property-based invariants for the round-7 operators: intra-doc
dedup vs a pure-Python reference (plus idempotence), split-leakage
strata accounting, DSIR score bounds/monotonicity, and quality-model
linearity."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_word, min_size=0, max_size=14).map(" ".join)


def _segs(text: str, w: int) -> list[str]:
    toks = text.split(" ") if text else []
    out = [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]
    return [s for s in out if s != ""]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=1, max_size=8), width=st.sampled_from([2, 3]))
def test_intradoc_dedup_reference_and_idempotent(spark, texts, width):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        intradoc_segment_dedup,
        word_segments,
    )

    rows = [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    split = lambda c: word_segments(c, width)  # noqa: E731
    out = {
        r["doc_id"]: r
        for r in intradoc_segment_dedup(docs, splitter=split).collect()
    }
    for did, t in rows:
        ss = _segs(t, width)
        seen, keep = set(), []
        for s in ss:
            if s not in seen:
                seen.add(s)
                keep.append(s)
        assert out[did]["n_lines"] == len(ss)
        assert out[did]["n_removed"] == len(ss) - len(keep)
        assert out[did]["clean_text"] == " ".join(keep)

    # idempotence: re-deduping the cleaned text removes nothing more.
    # (Only guaranteed when segment width divides cleanly into the
    # kept text's token count per original segment — true here because
    # surviving segments are full width-w windows except possibly the
    # last; re-splitting preserves all but the final partial segment's
    # boundaries only if every kept segment had full width, so assert
    # on documents whose token count is a multiple of width.)
    again_src = [(did, out[did]["clean_text"]) for did, _ in rows
                 if out[did]["n_removed"] == 0]
    if again_src:
        docs2 = spark.createDataFrame(again_src, "doc_id long, text string")
        out2 = {
            r["doc_id"]: r
            for r in intradoc_segment_dedup(docs2, splitter=split).collect()
        }
        for did, _ in again_src:
            assert out2[did]["n_removed"] == 0
            assert out2[did]["clean_text"] == out[did]["clean_text"]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=1, max_value=500), min_size=1,
                 max_size=12, unique=True),
    dup_rate=st.sampled_from([0, 1]),
)
def test_split_leakage_strata_account_for_every_doc(spark, ids, dup_rate):
    from universal_importer_duckdb_spark.operators.corpus import (
        split_leakage_audit,
    )

    rows = [
        (i, "shared" if (dup_rate and i % 2 == 0) else f"text {i}")
        for i in ids
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_audit(docs).collect()
    # strata doc counts sum to the corpus; group counts to #fingerprints
    assert sum(r["n_docs"] for r in out) == len(rows)
    n_fingerprints = len({t.lower() for _, t in rows})
    assert sum(r["n_groups"] for r in out) == n_fingerprints
    assert all(1 <= r["n_splits"] <= 3 for r in out)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc.filter(lambda t: t != ""), min_size=2, max_size=8))
def test_dsir_scores_bounded_and_target_max(spark, texts):
    """Scores live in (0, SCALE]; a document whose every bucket is
    target-only-or-self scores SCALE exactly when the corpus equals
    the target."""
    from universal_importer_duckdb_spark.operators.dsir import (
        SCALE,
        dsir_scores,
    )

    rows = [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # target == whole corpus -> c_t == c_raw -> every contribution is
    # SCALE -> every score is exactly SCALE
    all_target = dsir_scores(docs, F.lit(True)).collect()
    assert all(r["score"] == SCALE for r in all_target)
    # generic target: scores bounded by (0, SCALE]
    some = dsir_scores(docs, F.col("doc_id") == 1).collect()
    assert all(0 < r["score"] <= SCALE for r in some)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=1, max_size=6),
       w_a=st.integers(min_value=-500, max_value=500))
def test_quality_model_is_linear_in_counts(spark, texts, w_a):
    """raw_milli == sum over tokens of weight(token), exactly."""
    from universal_importer_duckdb_spark.operators.quality_model import (
        quality_model_scores,
    )

    weights = {"alpha": w_a, "beta": -40, "gamma": 7}
    rows = [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in quality_model_scores(docs, weights).collect()
    }
    for did, t in rows:
        toks = [x for x in t.split(" ") if x]
        c = Counter(toks)
        raw = sum(weights.get(tok, 0) * n for tok, n in c.items())
        assert got[did]["raw_milli"] == raw
        assert got[did]["n_words"] == len(toks)
        # trunc-toward-zero division (both engines' integer div)
        if len(toks):
            q = abs(raw) // len(toks)
            expect_logit = q if raw >= 0 else -q
        else:
            expect_logit = 0
        assert got[did]["logit_milli"] == expect_logit
