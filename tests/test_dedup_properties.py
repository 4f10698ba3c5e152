"""Property-based dedup invariants (SURVEY.md §5 test plan item 4):
kept ∪ removed = input; kept has no key collisions; exclude_all keeps
only singleton groups; first/last pick min/max ordinal per group."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # k1: few values → collisions
        st.integers(min_value=0, max_value=2),   # k2
        st.integers(min_value=-100, max_value=100),  # payload
    ),
    min_size=0,
    max_size=25,
)


def _df_from(spark, rows):
    data = [(k1, k2, val, i + 1) for i, (k1, k2, val) in enumerate(rows)]
    return spark.createDataFrame(
        data, "k1 int, k2 int, val int, _ingest_ord int"
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_dedup_invariants_all_resolutions(spark, rows):
    from universal_importer_duckdb_spark.operators.dedup import dedupe

    df = _df_from(spark, rows)
    n = len(rows)
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (k1, k2, _val) in enumerate(rows):
        groups.setdefault((k1, k2), []).append(i + 1)

    for resolution in ("first", "last", "exclude_all"):
        kept, dups = dedupe(df, ["k1", "k2"], resolution)
        kept_rows = kept.collect()
        n_kept, n_dups = len(kept_rows), dups.count()
        assert n_kept + n_dups == n
        seen = {(r.k1, r.k2) for r in kept_rows}
        assert len(seen) == n_kept  # no collisions in kept
        if resolution == "exclude_all":
            assert all(len(groups[k]) == 1 for k in seen)
        else:
            picker = min if resolution == "first" else max
            expected = {k: picker(ords) for k, ords in groups.items()}
            got = {(r.k1, r.k2): r._ingest_ord for r in kept_rows}
            assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # key: few values → hot keys
            st.integers(min_value=-50, max_value=50),  # payload
        ),
        min_size=0,
        max_size=30,
    ),
    k=st.integers(min_value=1, max_value=5),
    salts=st.sampled_from([1, 2, 8]),
)
def test_cap_per_key_salting_never_changes_result(spark, rows, k, salts):
    """Two-stage (salted pre-sift) top-k must equal the textbook
    one-stage window for ANY salt count — the invariant the domain-cap
    oracle relies on. order col (unique ordinal) induces a total
    order, the documented requirement."""
    from universal_importer_duckdb_spark.operators.corpus import cap_per_key

    data = [(key, val, i + 1) for i, (key, val) in enumerate(rows)]
    df = spark.createDataFrame(data, "key int, val int, ord int")
    base = sorted(
        (r.key, r.ord, r.rn)
        for r in cap_per_key(df, "key", k, ["ord"], presift_salts=0).collect()
    )
    salted = sorted(
        (r.key, r.ord, r.rn)
        for r in cap_per_key(df, "key", k, ["ord"], presift_salts=salts).collect()
    )
    assert base == salted
    # reference model: k smallest ordinals per key
    groups: dict[int, list[int]] = {}
    for key, _val, o in data:
        groups.setdefault(key, []).append(o)
    expect = sorted(
        (key, o, i + 1)
        for key, ords in groups.items()
        for i, o in enumerate(sorted(ords)[:k])
    )
    assert base == expect
