"""DuckDB-as-oracle differential harness (SURVEY.md §5 test plan).

Emulates the driver's t2 check: run a Spark query and its oracle SQL
on the same parquet tables, then compare row count + column names/
order-insensitive sorted values. Comparison is EXACT (no tolerance):
queries are designed for bit-identical floats via exact decimal
aggregation (see functions/numeric.py), so any drift is a bug.
"""

from __future__ import annotations

import math
from typing import Any

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    projected = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(projected, key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))


_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}


def _check_oracle_dtypes(spark_df, con, sql: str, name: str) -> None:
    """Driver-hasher emulation: the driver materializes the oracle via
    pandas (``.df()``) and the Spark result via ``.collect()``, then
    hashes the cell *representations*. Two bug classes are invisible to
    this module's value comparison (``_norm_cell`` coerces both sides
    to float) but red in the driver:

    - DuckDB HUGEINT/UHUGEINT becomes float64 in pandas and hashes
      differently from Spark's int64 even when values are equal (the
      r5 red rows). The oracle SQL needs a ``CAST(... AS BIGINT)``.
    - A Spark DECIMAL column materializes as Python ``Decimal`` objects
      while the DuckDB oracle's DECIMAL materializes as float64 (the
      r6 ``orders_snapshot_drift`` red row). Money results must follow
      the module-docstring idiom: exact decimal sum → round(…, 2) →
      ``cast("double")`` on BOTH engines.
    - Any other integral-vs-float split across engines (e.g. DuckDB
      DOUBLE/DECIMAL where Spark emits bigint).
    - A container-typed (array/map/struct) Spark output column: the
      driver's pandas canonicalizer ``sort_values`` raises
      ``TypeError: unhashable type`` on list cells, killing even the
      rows-only gate (the r7 ``emb_pq_codes`` red row). Entries must
      emit scalars only.
    """
    spark_types = dict(spark_df.dtypes)
    for col, st in spark_types.items():
        if st.startswith(("array", "map", "struct")):
            raise AssertionError(
                f"[{name}] Spark column {col!r} is {st}: the driver "
                f"canonicalizer sorts the result frame in pandas, and "
                f"sort_values on a container-typed column raises "
                f"TypeError: unhashable type (the r7 emb_pq_codes red "
                f"row) — flatten it first (concat_ws for arrays, "
                f"posexplode to scalar rows, or project struct fields)"
            )
        if st.startswith("decimal"):
            raise AssertionError(
                f"[{name}] Spark column {col!r} is {st}: the driver "
                f"hasher sees Python Decimal objects while the DuckDB "
                f"oracle materializes decimals as float64 — emit DOUBLE "
                f"via the decimal-sum/round/cast idiom instead"
            )
    # DESCRIBE plans without executing — free even on expensive oracles.
    described = con.execute(f"DESCRIBE {sql}").fetchall()
    for row in described:
        col, duck_type = row[0], row[1]
        st = spark_types.get(col)
        if st in _INTEGRAL_SPARK and (
            duck_type in ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT")
            or duck_type.startswith("DECIMAL")
        ):
            raise AssertionError(
                f"[{name}] oracle column {col!r} is DuckDB {duck_type} "
                f"(materializes as float64 in the driver's pandas hasher) "
                f"but Spark types it {st}; CAST it to BIGINT in the oracle "
                f"SQL or the driver hash will mismatch"
            )


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    """Raise AssertionError with a diff preview on any mismatch."""
    _check_oracle_dtypes(spark_df, con, sql, name)
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]
    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted = _sorted_rows(s_cols, s_rows)
    d_sorted = _sorted_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, (
            f"[{name}] first differing row #{i}:\n  spark : {a}\n  duckdb: {b}"
        )
