"""fixed_point_agg must be bit-identical to the decimal-sum oracle,
including negative values and exact .5 rounding boundaries."""

import duckdb
import pytest
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.functions.fixed_point import (
    FixedSum,
    fixed_point_agg,
    scaled,
)


@pytest.fixture(scope="module")
def mixed_df(spark):
    # values engineered to hit: negatives, exact .5 halves at the
    # round boundary, and magnitudes near the scaled-int64 comfort zone
    rows = [
        ("a", 1.005, 0.04),
        ("a", -1.005, 0.04),
        ("a", 2.345, 0.10),
        ("b", -99999.99, 0.00),
        ("b", 99999.98, 0.05),
        ("b", 0.125, 0.08),
        ("c", -0.125, 0.02),
        ("c", 1234567.89, 0.07),
    ]
    return spark.createDataFrame(rows, "g string, price double, disc double")


def _oracle(rows, sql):
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["g", "price", "disc"]))
    return con.execute(sql).fetchall()


def test_fixed_point_matches_decimal_oracle(spark, mixed_df):
    p2 = scaled("price", 2)
    disc_f4 = F.lit(10**4).cast("bigint") - scaled("disc", 4, 5)
    out = fixed_point_agg(
        mixed_df,
        ["g"],
        sums=[
            FixedSum("s_price", p2, 2),
            FixedSum("s_disc", p2 * disc_f4, 6),
        ],
        avgs=[("avg_price", "s_price")],
        count_alias="n",
    )
    got = {r["g"]: r.asDict() for r in out.collect()}

    rows = [tuple(r) for r in mixed_df.collect()]
    want = _oracle(
        rows,
        """
        SELECT g,
          CAST(round(SUM(price::DECIMAL(12,2)), 2) AS DOUBLE) AS s_price,
          CAST(round(SUM(price::DECIMAL(12,2) * (1::DECIMAL(5,4) - disc::DECIMAL(5,4))), 2) AS DOUBLE) AS s_disc,
          CAST(SUM(price::DECIMAL(12,2)) AS DOUBLE)/COUNT(*) AS avg_price,
          COUNT(*) AS n
        FROM t GROUP BY g
        """,
    )
    assert len(want) == len(got)
    for g, s_price, s_disc, avg_price, n in want:
        row = got[g]
        assert row["s_price"] == s_price, (g, row["s_price"], s_price)
        assert row["s_disc"] == s_disc, (g, row["s_disc"], s_disc)
        assert row["avg_price"] == avg_price
        assert row["n"] == n


def test_fixed_point_single_exchange(spark, mixed_df):
    out = fixed_point_agg(
        mixed_df, ["g"], sums=[FixedSum("s", scaled("price", 2), 2)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_fixed_point_extra_aggs_passthrough(spark, mixed_df):
    out = fixed_point_agg(
        mixed_df,
        ["g"],
        sums=[FixedSum("s", scaled("price", 2), 2)],
        extra_aggs=[F.max("disc").alias("max_disc")],
    )
    assert set(out.columns) == {"g", "s", "max_disc"}
    got = {r["g"]: r["max_disc"] for r in out.collect()}
    assert got["a"] == 0.10


def test_direct_sum_matches_chunked(spark, mixed_df):
    """r13: direct=True (plain bigint sum, no DECIMAL(38)
    reconstruction) must produce the identical rounded output as the
    chunked default wherever its per-group bound holds."""
    p2 = scaled("price", 2)
    a = fixed_point_agg(
        mixed_df, ["g"], sums=[FixedSum("s", p2, 2)],
    ).orderBy("g").collect()
    b = fixed_point_agg(
        mixed_df, ["g"], sums=[FixedSum("s", p2, 2, direct=True)],
    ).orderBy("g").collect()
    assert [(r.g, r.s) for r in a] == [(r.g, r.s) for r in b]


def test_scaled_boundary_overflow_routes_to_exact(spark):
    """r14 (r13 advice): an input within half an ulp-of-the-scale
    below 10^int_digits rounds UP to exactly 10^int_digits — the
    cheap double path would return it silently where the decimal cast
    raises ANSI overflow. The guard band must route such rows to the
    exact branch so the loud failure mode is preserved."""
    df = spark.createDataFrame([(9.99996,)], "x double")
    with pytest.raises(Exception) as ei:
        df.select(scaled("x", 4, 5).alias("s")).collect()
    assert "DECIMAL" in str(ei.value).upper() or "OVERFLOW" in str(ei.value).upper()
    # and the value just BELOW the band still takes a path that
    # agrees with the decimal cast
    ok = spark.createDataFrame([(9.99994,)], "x double")
    got = ok.select(scaled("x", 4, 5).alias("s")).collect()[0]["s"]
    assert got == 99999
