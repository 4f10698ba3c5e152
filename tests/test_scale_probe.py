"""Unit tests for tools/scale_probe.py's pure parts: the exponent
fit, the per-table replication SQL, and the artifact merge. The probe
itself (Spark + DuckDB at x4/x16) runs out-of-band — these pin the
arithmetic the README's scale adjudications cite."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools"),
)

from scale_probe import (  # noqa: E402
    DEFAULT_ENTRIES,
    DOMAINS,
    KEY_SHIFTS,
    TABLES,
    _copy_expr,
    _fit_exponent,
)


def test_fit_exponent_linear():
    # t = c * s  ->  slope 1 in log-log
    assert abs(_fit_exponent([1, 4, 16], [0.2, 0.8, 3.2]) - 1.0) < 1e-9


def test_fit_exponent_flat():
    assert abs(_fit_exponent([1, 4, 16], [0.5, 0.5, 0.5])) < 1e-9


def test_fit_exponent_quadratic():
    assert abs(_fit_exponent([1, 2, 4], [1.0, 4.0, 16.0]) - 2.0) < 1e-9


def test_fit_exponent_single_point_is_nan():
    assert math.isnan(_fit_exponent([4], [1.0]))


def test_every_table_has_key_shifts():
    assert set(KEY_SHIFTS) == set(TABLES)
    for table, shifts in KEY_SHIFTS.items():
        for col, dom in shifts:
            assert dom in DOMAINS, (table, col, dom)


def test_copy_expr_shifts_keys_and_transforms_payloads():
    offs = {d: 1000 for d in DOMAINS}
    doc = _copy_expr("documents", offs)
    assert "doc_id + c * 1000 AS doc_id" in doc
    assert "translate(text" in doc  # gram-disjoint copies
    emb = _copy_expr("embeddings", offs)
    assert "vec_id + c * 1000 AS vec_id" in emb
    assert "embedding[" in emb  # cyclic shift
    li = _copy_expr("lineitem", offs)
    # FK columns shift by the REFERENCED domain's offset
    assert "l_orderkey + c * 1000 AS l_orderkey" in li
    assert "l_partkey + c * 1000 AS l_partkey" in li


def test_copy_expr_identity_at_copy_zero_documents():
    """Copy 0 must reproduce the base table exactly: rotation by
    c%26=0 is the identity translate and key shift adds 0."""
    import duckdb

    offs = {d: 7 for d in DOMAINS}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT 5::BIGINT AS doc_id, "
                "'hello world'::VARCHAR AS text, 'en' AS lang")
    row = con.execute(
        _copy_expr("documents", offs)
        + " FROM documents CROSS JOIN (SELECT 0::BIGINT AS c)"
    ).fetchone()
    # the copy-index column c must NOT leak into the output
    assert row == (5, "hello world", "en")
    # copy 1 rotates letters and shifts the key
    row1 = con.execute(
        _copy_expr("documents", offs)
        + " FROM documents CROSS JOIN (SELECT 1::BIGINT AS c)"
    ).fetchone()
    assert row1[0] == 12 and row1[1] == "ifmmp xpsme"


def test_default_entries_are_registered():
    from universal_importer_duckdb_spark.entry_queries import REGISTRY

    for name in DEFAULT_ENTRIES:
        assert name in REGISTRY, name
