"""Property-based invariants for the round-6 operators: containment
pairs vs a quadratic brute force, line dedup vs a pure-Python
reference, funnel vs an in-memory replay."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocab -> shared n-grams and genuine containments happen
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(_doc, min_size=1, max_size=10))
def test_containment_equals_quadratic_bruteforce(spark, texts):
    from universal_importer_duckdb_spark.operators.containment import (
        containment_dedup_pairs,
    )

    rows = [(i + 1, t) for i, t in enumerate(texts)]
    # plant one guaranteed containment when any doc clears the floor
    for i, t in list(rows):
        if len(t.split(" ")) >= 7:
            rows.append((len(rows) + 1, "zz " + t + " qq"))
            break
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["contained_id"], r["container_id"])
        for r in containment_dedup_pairs(docs).collect()
    }
    want = {
        (a, b)
        for a, ta in rows
        if len(ta.split(" ")) >= 7
        for b, tb in rows
        if a != b
        and ta in tb
        and (len(ta) < len(tb) or (len(ta) == len(tb) and a > b))
    }
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs_lines=st.lists(
        st.lists(
            st.sampled_from(["nav bar", "footer", "body one", "body two", ""]),
            min_size=0,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_line_dedup_equals_python_reference(spark, docs_lines):
    from universal_importer_duckdb_spark.operators.line_dedup import (
        line_level_dedup,
    )

    rows = [(i + 1, "\n".join(ls)) for i, ls in enumerate(docs_lines)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in line_level_dedup(docs, min_dup_docs=2, joiner="\n").collect()
    }

    # python reference
    owners: dict[str, set[int]] = {}
    for did, ls in [(i + 1, ls) for i, ls in enumerate(docs_lines)]:
        for line in ls:
            if line:
                owners.setdefault(line, set()).add(did)
    dup = {line for line, os in owners.items() if len(os) >= 2}
    want = {}
    for did, ls in [(i + 1, ls) for i, ls in enumerate(docs_lines)]:
        nonempty = [x for x in ls if x]
        kept = [x for x in nonempty if x not in dup]
        want[did] = (
            len(nonempty),
            len(nonempty) - len(kept),
            "\n".join(kept),
        )
    assert got == want


_etype = st.sampled_from(["view", "click", "purchase", "other"])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=200),  # seconds
            _etype,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_equals_python_replay(spark, events):
    from universal_importer_duckdb_spark.operators.funnel import (
        funnel_by_cohort,
    )

    rows = [(u, s * 10**9, t) for u, s, t in events]  # ns
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_type string")
    got = {
        r["cohort_day"]: (
            r["n_stage1"],
            r["n_stage2"],
            r["n_stage3"],
            r["total_conversion_micros"],
        )
        for r in funnel_by_cohort(df).collect()
    }

    # python replay in micros
    byu: dict[int, list[tuple[int, str]]] = {}
    for u, s, t in events:
        if t in ("view", "click", "purchase"):
            byu.setdefault(u, []).append((s * 10**6, t))
    agg: dict[int, list[int]] = {}
    for u, evs in byu.items():
        t1 = min((us for us, t in evs if t == "view"), default=None)
        if t1 is None:
            continue
        t2 = min((us for us, t in evs if t == "click" and us >= t1), default=None)
        t3 = (
            min((us for us, t in evs if t == "purchase" and us >= t2), default=None)
            if t2 is not None
            else None
        )
        day = t1 // 86_400_000_000
        a = agg.setdefault(day, [0, 0, 0, 0])
        a[0] += 1
        a[1] += t2 is not None
        a[2] += t3 is not None
        if t3 is not None:
            a[3] += t3 - t1
    assert got == {d: tuple(v) for d, v in agg.items()}
