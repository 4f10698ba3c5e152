"""Count-min sketch: fixed-size frequency summaries, portably hashed.

The missing sketch class next to Bloom (membership, operators/bloom.py),
HLL (cardinality), and MinHash/SimHash (similarity): approximate
COUNTS over an unbounded key domain. A (depth x width) integer grid;
every key increments one cell per row via an independent hash; the
estimate is the MIN over its cells. Error is one-sided and bounded:
``exact <= est <= exact + (e/width) * N`` with probability
``1 - e^-depth`` (Cormode & Muthukrishnan 2005).

Scale contract (100 TB): the sketch is an additive integer monoid on
(j, bucket) — map-side partial aggregation compresses every partition
to <= depth*width cells before the shuffle, so building it over a
100 TB log shuffles O(n_partitions * depth * width) rows and the
finished sketch (<= depth*width rows, ~2k for the defaults) BROADCASTS
for estimation. The same additivity bounds the streaming twin: the
state store holds <= depth*width rows forever, vs O(distinct keys)
for an exact streaming count — the reason a CMS is deployed at all.
``cms_sketch`` also takes a pre-aggregated ``weight_col`` so callers
that already hold exact per-key counts (the batch heavy-hitter audit)
build the identical sketch from the counts frame without re-scanning
or re-exploding the raw log.

Determinism: ``bucket = md5_28(salt:j:key) % width`` (the portable
28-bit md5 prefix, corpus._md5_28), replayed bit-exactly in DuckDB as
``('0x'||substr(md5(s),1,7))::BIGINT % width``; counts are exact
BIGINTs and MIN is order-free, so the whole estimate table is
value-hash reproducible cross-engine.

Reference scope: the reference's summary tier reports exact group
counts (/root/reference/main.py:441-470 COUNT(*) summaries); this is
the sketch-bounded variant of that report for key domains too large
to hold exactly, plus the heavy-hitter audit joining estimate to
exact to certify the one-sided error on real data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.operators.corpus import _md5_28

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_SALT = "cms-v1"


def _bucket(j: Column, k: Column, width: int, salt: str) -> Column:
    return _md5_28(
        F.concat(F.lit(salt + ":"), j.cast("string"), F.lit(":"), k)
    ) % F.lit(width)


def _keyed(df: DataFrame, key) -> DataFrame:
    k = F.col(key) if isinstance(key, str) else key
    return df.select(k.cast("string").alias("k"))


def cms_sketch(
    df: DataFrame,
    key,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Build the (depth x width) sketch: one row per non-empty cell,
    ``(j, bucket, cnt)``. Without ``weight_col`` every input row
    counts 1 (the raw-log form — the explode is a narrow 4x map and
    the groupBy's map-side combine collapses each partition to
    <= depth*width cells). With ``weight_col`` the input is a
    pre-aggregated (key, count) frame and cells sum the weights —
    bit-identical to the raw form by additivity."""
    if weight_col is None:
        base = _keyed(df, key).withColumn("__w", F.lit(1).cast("bigint"))
    else:
        k = F.col(key) if isinstance(key, str) else key
        base = df.select(
            k.cast("string").alias("k"),
            F.col(weight_col).cast("bigint").alias("__w"),
        )
    rows = base.select(
        "k",
        "__w",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    return (
        rows.select(
            "j",
            _bucket(F.col("j"), F.col("k"), width, salt).alias("bucket"),
            "__w",
        )
        .groupBy("j", "bucket")
        .agg(F.sum("__w").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "k",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` (one string
    column ``key_col``, assumed distinct): ``(k, cms_est)`` with
    ``cms_est = MIN over j`` of the key's cells. The sketch side is
    <= depth*width rows and is explicitly broadcast — estimation never
    shuffles the keys frame. Keys absent from the stream estimate 0
    (left join + coalesce), so external candidate lists are safe."""
    rows = _keyed(keys, key_col).select(
        "k", F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    )
    cells = rows.withColumn(
        "bucket", _bucket(F.col("j"), F.col("k"), width, salt)
    )
    joined = cells.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy("k").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est")
    )


def exact_key_counts(df: DataFrame, key) -> DataFrame:
    """Exact per-key counts ``(k, exact_cnt)`` — the audit's ground
    truth and (by additivity) a valid weighted input to
    ``cms_sketch``."""
    return _keyed(df, key).groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )


def heavy_hitter_report(
    exact: DataFrame,
    sketch: DataFrame,
    top_k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """The heavy-hitter audit table: top ``top_k`` keys by sketch
    estimate, each carrying its exact count and the (always >= 0)
    overcount — certifying the sketch's one-sided error on real data.
    ``exact_cnt`` rides along the probe rows (it is constant per key)
    so the estimate needs no join back onto ``exact`` — the counts
    frame is consumed once here. Ties at the boundary break by key,
    so the top-k set is deterministic."""
    probes = exact.select(
        "k",
        "exact_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).withColumn("bucket", _bucket(F.col("j"), F.col("k"), width, salt))
    joined = probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return (
        joined.groupBy("k")
        .agg(
            F.max("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est"),
        )
        .select(
            "k",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.col("cms_est").desc(), "k")
        .limit(top_k)
    )


# A sketch folds into the plan as a literal map below this cell
# count — the quality model's model-as-literal/model-as-table
# switchover (quality_model.py), applied to the sketch: the estimate
# becomes a zero-join narrow expression over the counts frame (one
# scan, one shuffle). Above the gate the sketch stays a table and the
# estimate is the broadcast join of ``cms_estimate``. The gate is on
# depth*width — a bound fixed at sketch CONSTRUCTION, not data size,
# so the branch is deterministic for a given configuration.
CMS_LITERAL_CELLS_MAX = 1024


def _sketch_literal_estimate(
    sketch: DataFrame, depth: int, width: int, salt: str
) -> Column:
    """MIN-over-rows estimate for column ``k`` as a pure expression:
    the (<= depth*width cell) sketch collects into one literal map
    keyed 'j:bucket' — a bounded artifact collect, same class as the
    1-row stats and shipped-model folds."""
    cells = {f"{r['j']}:{r['bucket']}": r["cnt"] for r in sketch.collect()}
    pairs: list[Column] = []
    for jb, cnt in sorted(cells.items()):
        pairs += [F.lit(jb), F.lit(cnt)]
    m = F.create_map(*pairs)
    lookups = [
        F.coalesce(
            F.element_at(
                m,
                F.concat(
                    F.lit(f"{j}:"),
                    _bucket(F.lit(j), F.col("k"), width, salt).cast("string"),
                ),
            ),
            F.lit(0),
        )
        for j in range(depth)
    ]
    return F.least(*lookups).cast("bigint")


def cms_heavy_hitters(
    df: DataFrame,
    key,
    top_k: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """Batch heavy-hitter audit: an exact groupBy over ``df``, the
    sketch built FROM the counts frame by additivity, and the
    estimate folded back over it. Below the literal gate
    (depth*width <= CMS_LITERAL_CELLS_MAX) the sketch becomes a
    literal-map expression, so the whole audit is ONE scan + ONE
    shuffle + TakeOrdered; above it, the broadcast-join form of
    ``heavy_hitter_report``. The audit needs exact ground truth by
    definition — the PRODUCTION path at 100 TB is sketch-only:
    ``cms_sketch`` (one scan, map-side-combined to depth*width cells
    per partition) + ``cms_estimate`` over candidate keys."""
    exact = exact_key_counts(df, key)
    sketch = cms_sketch(
        exact, "k", weight_col="exact_cnt", depth=depth, width=width, salt=salt
    )
    if depth * width <= CMS_LITERAL_CELLS_MAX:
        est = _sketch_literal_estimate(sketch, depth, width, salt)
        return (
            exact.select(
                "k",
                "exact_cnt",
                est.alias("cms_est"),
            )
            .withColumn(
                "overcount",
                (F.col("cms_est") - F.col("exact_cnt")).cast("bigint"),
            )
            .orderBy(F.col("cms_est").desc(), "k")
            .limit(top_k)
        )
    return heavy_hitter_report(
        exact, sketch, top_k=top_k, depth=depth, width=width, salt=salt
    )


def streaming_cms_sketch(
    stream: DataFrame,
    key,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    salt: str = CMS_SALT,
) -> DataFrame:
    """The sketch maintained as streaming state (update mode): the raw
    explode+groupBy shape of ``cms_sketch`` on an unbounded source.
    The state store is capped at depth*width rows NO MATTER how long
    the stream runs or how many distinct keys arrive — the property
    that makes a CMS the production answer where an exact streaming
    count's per-key state grows without bound."""
    return cms_sketch(stream, key, depth=depth, width=width, salt=salt)


def finalize_cms_sketch(drained: DataFrame) -> DataFrame:
    """Fold update-mode emissions (one row per cell per micro-batch
    that touched it) to the final sketch: cell counts only ever grow,
    so MAX per cell is the last state — the same idiom as
    streaming/docs.py::finalize_fingerprint_splits."""
    return drained.groupBy("j", "bucket").agg(
        F.max("cnt").cast("bigint").alias("cnt")
    )


# ======================================================================
# HyperLogLog: cardinality, the sketch class the module docstring
# names next to CMS (counts) and Bloom (membership)
# ======================================================================

HLL_M = 256           # 2^8 registers
HLL_RHO_MAX = 41      # 40-bit rank slice; w == 0 reports 41
HLL_SALT = "hll-v1"
# alpha_m * m^2 * 1000, precomputed so BOTH engines parse the same
# decimal literal (alpha = 0.7213 / (1 + 1.079/m), Flajolet et al.
# 2007 for m >= 128); dividing this exact-parsed double by the
# exact register sum is a single IEEE op, so the milli estimate is
# bit-identical cross-engine with no transcendental in sight.
HLL_ALPHA_M2_1000 = 47072712.671202235

# LinearCounting milli-estimates m * ln(m / nz) * 1000, floored, for
# nz = 1..m — the small-range correction table (Flajolet et al. 2007
# §4; below ~2.5m distinct keys the raw estimator overestimates, and
# LinearCounting on the zero-register count is the prescribed fix).
# ln() is transcendental and NOT correctly rounded across libms, so
# it is evaluated exactly ONCE, here, at import — both engines then
# read the SAME integer literals (the HLL_ALPHA_M2_1000 discipline)
# and the corrected column replays bit-exactly like everything else
# in this module. nz = m (all registers zero: an empty group) floors
# to 0, which is also the true cardinality of an empty group.
HLL_LC_MILLI = tuple(
    int(math.floor(HLL_M * math.log(HLL_M / nz) * 1000.0))
    for nz in range(1, HLL_M + 1)
)
# the standard small-range gate: apply LinearCounting when the raw
# estimate is at or below 2.5*m (and at least one register is zero)
HLL_LC_GATE_MILLI = int(2.5 * HLL_M * 1000)


def hll_registers(df: DataFrame, key, group_cols=("source",)) -> DataFrame:
    """HyperLogLog register table per group: ``(group..., bucket, r)``
    with ``r = max rho`` over the group's keys — rho is the 1-based
    position of the first set bit in a 40-bit hash slice (Flajolet
    et al. 2007). Deterministic and portably hashed: bucket is the
    28-bit md5 prefix mod m (the corpus._md5_28 discipline) and the
    rank slice is hex chars 8-17 of the SAME md5 — independent bits,
    one hash per key — with rho = 41 - bitlength(w) via base-2 string
    conversion (Spark ``conv(x,10,2)`` == DuckDB ``bin(x)``, the
    lm.py idiom), so the whole table replays bit-exactly in SQL.

    Scale contract: max is an idempotent, commutative monoid on
    (group, bucket) — map-side partial aggregation compresses every
    partition to <= m rows per group before the one exchange, and the
    SAME property caps the streaming twin's state store at m rows per
    group forever (``streaming_hll_registers``). Duplicate keys need
    no pre-distinct: re-inserting a key re-proposes the same rho and
    max absorbs it — the reason HLL streams where COUNT(DISTINCT)
    cannot."""
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    hexd = F.md5(
        F.concat(F.lit(HLL_SALT + ":"), k).cast("binary")
    )
    bucket = (
        F.conv(F.substring(hexd, 1, 7), 16, 10).cast("bigint")
        % F.lit(HLL_M)
    )
    w = F.conv(F.substring(hexd, 8, 10), 16, 10).cast("bigint")
    rho = F.when(w == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("r"))
    )


def hll_report(registers: DataFrame, group_cols=("source",)) -> DataFrame:
    """Fold a register table to the cardinality report:
    ``(group..., hll_est_milli, hll_corrected_milli,
    n_zero_registers)``. The raw HLL estimate
    ``alpha * m^2 / sum(2^-r)`` (empty registers contribute 2^0 = 1)
    is emitted in milli units as a BIGINT; ``hll_corrected_milli``
    applies the Flajolet small-range correction — LinearCounting
    ``m * ln(m / n_zero)`` whenever the raw estimate is <= 2.5m and
    at least one register is zero, otherwise the raw estimate — which
    is the number a consumer should actually read (the raw column
    stays published so the correction's effect is auditable next to
    the exact count in ``docs_hll_vocab``).

    Bit-exact across engines BY CONSTRUCTION, not by luck: each
    ``2^-r`` is ``1.0 / (1 << r)`` — an exact dyadic double (never
    ``pow``, which may route through exp/ln and differ in the last
    ulp per libm) — and with r <= 41 and m = 256 the summands'
    exponent spread stays under the 53-bit mantissa, so every partial
    sum is EXACT and therefore order-independent; the final multiply/
    divide/floor are single correctly-rounded IEEE ops. The
    correction needs ln(), which is NOT correctly rounded — so it is
    never evaluated by either engine: ``HLL_LC_MILLI`` precomputes
    all m possible values at import and ships them as INTEGER
    LITERALS into both plans (the HLL_ALPHA_M2_1000 discipline); the
    runtime correction is a gate compare plus an array index, exact
    by construction (r12, closing the documented r10/r11 small-range
    bias)."""
    inv = F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), r) AS DOUBLE)")
    raw = F.floor(
        F.lit(HLL_ALPHA_M2_1000)
        / (F.col("__nz").cast("double") + F.col("__sp"))
    ).cast("bigint")
    lc_table = F.array(*[F.lit(v) for v in HLL_LC_MILLI])
    corrected = F.when(
        (F.col("__nz") > 0) & (raw <= F.lit(HLL_LC_GATE_MILLI)),
        F.element_at(lc_table, F.col("__nz").cast("int")),
    ).otherwise(raw)
    return (
        registers.groupBy(*group_cols)
        .agg(
            (F.lit(HLL_M) - F.count(F.lit(1))).alias("__nz"),
            F.sum(inv).alias("__sp"),
        )
        .select(
            *group_cols,
            raw.alias("hll_est_milli"),
            corrected.cast("bigint").alias("hll_corrected_milli"),
            F.col("__nz").cast("bigint").alias("n_zero_registers"),
        )
    )


def streaming_hll_registers(stream: DataFrame, key, group_cols=("source",)) -> DataFrame:
    """The register table as streaming state (update mode): max per
    (group, bucket) — idempotent and monotone, so the state store is
    capped at m rows per group no matter how long the stream runs,
    and replayed keys are absorbed for free (no watermark-scoped
    dedup needed, unlike an exact distinct count)."""
    return hll_registers(stream, key, group_cols)


def finalize_hll_registers(drained: DataFrame, group_cols=("source",)) -> DataFrame:
    """Fold update-mode emissions (one row per register per
    micro-batch that raised it) to the final table: register values
    only ever grow, so MAX is the last state — the
    finalize_cms_sketch idiom."""
    return drained.groupBy(*group_cols, "bucket").agg(
        F.max("r").cast("int").alias("r")
    )
