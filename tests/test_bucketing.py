"""Bucketed join: same-bucketed tables must join with no Exchange."""

from __future__ import annotations

import contextlib
import io
import re


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from universal_importer_duckdb_spark.sources.bucketing import (
        read_table,
        write_bucketed_table,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], num_buckets=4, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"]
    )
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = _plan(joined)
        exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
        assert len(exchanges) == 0, plan
        # and it still computes the right thing
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
