"""Round-9 property tests: the new kernels against independent
python reference implementations (not the SQL oracles — these pin
the ALGEBRA, the oracles pin cross-engine replay).

- sign_bits: the Spark fold == integer bit math for arbitrary
  vectors (zeros, negatives, subnormals).
- merge_token_spans: the gaps-and-islands window merge == a plain
  python interval sweep.
- trigram_rank_langid: the algebraic absent-trigram penalty
  (dist = n*m - matched gain) == the naive out-of-place distance
  computed over the FULL doc x language cross product.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

VEC = st.lists(
    st.floats(
        min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=63,
)


@settings(max_examples=20, deadline=None)
@given(VEC)
def test_sign_bits_matches_python_bit_math(spark, vec):
    from pyspark.sql import functions as F

    from universal_importer_duckdb_spark.operators.similarity import (
        sign_bits,
    )

    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.select(sign_bits("v", 1, len(vec)).alias("s")).collect()[0].s
    want = sum(1 << i for i, x in enumerate(vec) if x > 0)
    assert got == want


INTERVALS = st.lists(
    st.tuples(st.integers(1, 40), st.integers(0, 7)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda iv: iv[0],
)


def _merge_ref(ivs):
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e), out[-1][2] + 1)
        else:
            out.append((s, e, 1))
    return [(s, e, n) for s, e, n in out]


@settings(max_examples=15, deadline=None)
@given(INTERVALS)
def test_merge_token_spans_matches_interval_sweep(spark, ivs):
    """NOTE the merge rule: windows of width n overlap-or-ADJOIN when
    s2 <= e1 (the gaps-and-islands predicate is s > max(prev e)), so
    the reference merges on s <= prev_e exactly, not s <= prev_e+1."""
    from universal_importer_duckdb_spark.operators.corpus import (
        merge_token_spans,
    )

    df = spark.createDataFrame(
        [(1, s, e) for s, e in ivs], "doc_id bigint, s bigint, e bigint"
    )
    got = sorted(
        (r.span_start, r.span_end, r.n_grams)
        for r in merge_token_spans(df).collect()
    )
    assert got == _merge_ref(ivs)


LANG_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["aa", "bb", "cc"]),
        st.text(alphabet="abcdef ", min_size=3, max_size=30),
    ),
    min_size=2,
    max_size=8,
)


def _langid_ref(rows, m, n):
    """Naive Cavnar-Trenkle with the FULL doc x lang cross product and
    the explicit per-term absent penalty m."""
    from collections import Counter

    lang_counts: dict[str, Counter] = {}
    for _, lang, text in rows:
        lang_counts.setdefault(lang, Counter()).update(
            text.lower()[i : i + 3] for i in range(len(text) - 2)
        )
    profiles = {}
    for lang, c in lang_counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
        profiles[lang] = {tg: r for r, (tg, _) in enumerate(top, start=1)}
    out = {}
    for doc_id, lang, text in rows:
        t = text.lower()
        if len(t) < 3:
            continue
        c = Counter(t[i : i + 3] for i in range(len(t) - 2))
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        dists = {}
        for plang, prof in profiles.items():
            d = 0
            for drank, (tg, _) in enumerate(top, start=1):
                d += abs(drank - prof[tg]) if tg in prof else m
            dists[plang] = d
        matched = {
            pl: d
            for pl, d in dists.items()
            if any(tg in profiles[pl] for tg, _ in top)
        }
        if matched:
            pred, dist = min(matched.items(), key=lambda kv: (kv[1], kv[0]))
        else:
            pred, dist = "und", len(top) * m
        out[doc_id] = (lang, pred, dist)
    return out


@settings(max_examples=10, deadline=None)
@given(LANG_DOCS)
def test_langid_algebraic_penalty_equals_naive_cross_product(spark, docs):
    from universal_importer_duckdb_spark.operators.text_analysis import (
        trigram_rank_langid,
    )

    rows = [(i, lang, text) for i, (lang, text) in enumerate(docs)]
    m, n = 7, 4
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        r.doc_id: (r.lang, r.pred_lang, r.dist)
        for r in trigram_rank_langid(df, m=m, n=n).collect()
    }
    want = _langid_ref(rows, m, n)
    assert got == want
