"""Property-based cross-engine pins for the r8 integer k-means.

The fixed-SF parity suite proves the PQ/IVF/cluster entries replay on
the synthetic embeddings; these properties prove the CONTRACT — numpy
int_lloyds == the unrolled DuckDB CTE replay — on arbitrary inputs,
including adversarial shapes hypothesis likes (duplicate points, tiny
n, coordinates at quantization boundaries).
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from universal_importer_duckdb_spark.operators.int_kmeans import (
    init_indices,
    int_argmin_dists,
    int_lloyds,
    kmeans_ctes,
    quantize_np,
    sql_qdim,
)

DIM = 4
K = 3
ITERS = 3


def _duck_replay(vectors: list[list[float]]):
    """Run quantize + init + Lloyd's + final assignment in DuckDB from
    raw doubles, via the same SQL builders the oracles use."""
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, {list(map(float, v))!r})".replace("'", "")
        for i, v in enumerate(vectors)
    )
    con.execute(
        f"CREATE TABLE emb AS SELECT * FROM (VALUES {rows}) t(vec_id, embedding)"
    )
    dims = ", ".join(
        f"{sql_qdim('embedding', i)} AS d{i}" for i in range(1, DIM + 1)
    )
    dist = " + ".join(
        f"(p.d{i}-c.d{i})*(p.d{i}-c.d{i})" for i in range(1, DIM + 1)
    )
    dsel = ", ".join(f"d{i}" for i in range(1, DIM + 1))
    sql = f"""
WITH pts AS MATERIALIZED (SELECT vec_id AS pid, {dims} FROM emb),
{kmeans_ctes('pts', DIM, K, ITERS, 'cents')}
SELECT cid, {dsel} FROM cents ORDER BY cid
"""
    cents = con.execute(sql).fetchall()
    asg_sql = f"""
WITH pts AS MATERIALIZED (SELECT vec_id AS pid, {dims} FROM emb),
{kmeans_ctes('pts', DIM, K, ITERS, 'cents')}
SELECT pid, cid, dd FROM (
  SELECT p.pid, c.cid, {dist} AS dd,
         row_number() OVER (PARTITION BY p.pid
                            ORDER BY {dist}, c.cid) AS rn
  FROM pts p JOIN cents c ON TRUE) WHERE rn = 1 ORDER BY pid
"""
    assigns = con.execute(asg_sql).fetchall()
    con.close()
    return cents, assigns


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.9,
                max_value=1.9,
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ),
            min_size=DIM,
            max_size=DIM,
        ),
        min_size=K,
        max_size=40,
    )
)
def test_int_lloyds_matches_duckdb_replay(vectors):
    ids = list(range(len(vectors)))
    xq = quantize_np(np.asarray(vectors, dtype=np.float64))
    cent = int_lloyds(xq, K, ITERS, init_indices(ids, K))
    duck_cents, duck_assigns = _duck_replay(vectors)
    assert len(duck_cents) == len(cent)
    for cid, *dims in duck_cents:
        assert list(cent[cid]) == list(dims), (cid, dims, cent[cid])
    a, dd = int_argmin_dists(xq, cent)
    for pid, cid, d2 in duck_assigns:
        assert (int(a[pid]), int(dd[pid])) == (int(cid), int(d2))
