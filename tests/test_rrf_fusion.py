"""Unit tests for reciprocal-rank fusion (operators/search.py::
rrf_fuse). The full hybrid query's oracle parity runs in
test_oracle_parity.py; these pin the fusion arithmetic and
missing-entry semantics on hand-computable lists."""

from __future__ import annotations

import pytest

from universal_importer_duckdb_spark.operators.search import rrf_fuse


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, rank bigint")


def test_rrf_fuse_combines_and_ranks(spark):
    kw = _ranked(spark, [(1, 1), (2, 2), (3, 3)])
    vec = _ranked(spark, [(3, 1), (4, 2), (1, 3)])
    out = rrf_fuse([kw, vec], k_rrf=60, k=10).collect()
    scores = {r.doc_id: r.rrf_score for r in out}
    assert scores[1] == pytest.approx(1 / 61 + 1 / 63, abs=0)
    assert scores[3] == pytest.approx(1 / 63 + 1 / 61, abs=0)
    # doc 2 only in kw, doc 4 only in vec — missing list contributes 0
    assert scores[2] == pytest.approx(1 / 62, abs=0)
    assert scores[4] == pytest.approx(1 / 62, abs=0)
    # docs 1 and 3 tie exactly (symmetric ranks) — id breaks the tie;
    # 2 and 4 tie at 1/62 — id again
    assert [r.doc_id for r in out] == [1, 3, 2, 4]


def test_rrf_fuse_single_list_and_empty_args(spark):
    kw = _ranked(spark, [(1, 1), (2, 2)])
    out = rrf_fuse([kw], k=1).collect()
    assert [r.doc_id for r in out] == [1]
    with pytest.raises(ValueError):
        rrf_fuse([])
