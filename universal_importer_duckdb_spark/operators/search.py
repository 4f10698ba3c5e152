"""Corpus keyword search: BM25-family relevance scoring as pure
column expressions — the retrieval side of a training-data pipeline
(mining domain-relevant documents from a 100 TB corpus by keyword,
the lexical complement of the embedding ANN path in similarity.py).

Cross-engine determinism: the classic BM25 idf is ln((N-df+0.5)/
(df+0.5)+1); ln() is a libm call whose last-ulp behavior differs
between the JVM and DuckDB, so the oracle-checked scorer uses the
RATIONAL idf (N-df+0.5)/(df+0.5) — the same odds ratio without the
log. The log is monotone, so per-term orderings are identical; with
multiple terms the weighting between rare and common terms shifts
(rare terms count relatively more than in log-idf BM25), which is
acceptable for corpus mining and makes every arithmetic step an IEEE
operation both engines execute identically (each division/multiply
has exactly-representable or identically-parsed operands, and the
term sum folds in fixed written order).

Scale shape: one narrow map computes per-doc term frequencies and
length, one tiny all-up aggregate (n_docs, total length, per-term
document frequencies) broadcasts back as a one-row frame, and the
top-k is TakeOrderedAndProject — no global sort, no shuffle of the
corpus. The per-term tf comes from a single tokenization shared by
all terms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["keyword_search_topk"]


def keyword_search_topk(
    df: DataFrame,
    terms: Sequence[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: str = "broadcast",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25 with
    rational idf (see module docstring). Emits the per-term term
    frequencies (``tf_<term>``) and the summed ``score``; ties break
    on ``id_col`` so the cut at rank k is deterministic.

    ``stats`` picks how the one-row corpus statistics (n_docs, Σlen,
    per-term df — all BIGINT, so every form is value-identical) reach
    the scoring expression:

    - ``"broadcast"`` (default, the 100 TB shape): tiny all-up agg
      broadcast back; fully lazy, corpus never single-partitioned —
      but the broadcast exchange is its own job and the tokenization
      runs twice (stats pass + scoring pass).
    - ``"window"``: unbounded-window sums over the tokenized frame —
      ONE tokenization, ONE exchange, no broadcast job, and the stage
      overlaps other branches of the same action. The exchange moves
      the whole (skinny) per-doc frame to one partition, so this is
      for corpora known small (gate on a parquet-footer row count),
      interactive/hybrid latency-bound plans.
    - ``"collect"``: eager 1-row collect over a scoped-cached
      tokenization, stats inlined as literals. Bounded at one row at
      any scale, but the collect job serializes ahead of the main
      action; useful when the caller reuses the cached frame anyway.

    ``1 - b`` must be exactly representable for the bit-exact oracle
    replay, which holds for the default b=0.75 (0.25); other values
    still rank correctly but the SQL literal must be written as the
    same double."""
    if not terms:
        raise ValueError("need at least one query term")
    if any("`" in t for t in terms):
        raise ValueError("query terms must not contain backticks")

    # per-term columns are named tf_{term}/df_{term}; terms are
    # arbitrary tokens ("node.js", "v1.2"), so every reference is
    # backtick-quoted — a bare F.col("tf_node.js") would parse the
    # dot as a struct accessor and fail resolution
    def _tf(t):
        return F.col(f"`tf_{t}`")

    def _df_(t):
        return F.col(f"`df_{t}`")

    from universal_importer_duckdb_spark.operators.dedup_text import (
        spread_for_compute,
    )

    one_minus_b = 1.0 - b
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
    tf_cols = [
        F.size(F.filter(toks, (lambda t: (lambda w: w == F.lit(t)))(term)))
        .cast("bigint")
        .alias(f"tf_{term}")
        for term in terms
    ]
    # Spread before tokenizing: a single-split scan (one-row-group
    # parquet) otherwise runs the per-term token filters — the
    # dominant cost — on one core, twice (stats pass + scoring pass).
    # No-op once the scan arrives in >= cores splits.
    if stats not in ("broadcast", "window", "collect"):
        raise ValueError(f"unknown stats mode: {stats!r}")
    per_doc = spread_for_compute(df).select(
        F.col(id_col), *tf_cols, F.size(toks).cast("bigint").alias("doclen")
    )
    if stats == "collect":
        from universal_importer_duckdb_spark.caching import scoped_cache

        per_doc = scoped_cache(per_doc)
    stats_aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("doclen").cast("bigint").alias("sum_len"),
        *[
            F.sum(F.when(_tf(t) > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"df_{t}")
            for t in terms
        ],
    ]
    if stats == "collect":
        row = per_doc.agg(*stats_aggs).collect()[0]
        lits = {
            name: F.lit(int(row[name])).cast("bigint")
            for name in ["n_docs", "sum_len"] + [f"df_{t}" for t in terms]
        }
        scored = per_doc.withColumns(lits)
    elif stats == "window":
        from pyspark.sql import Window

        w = Window.partitionBy()
        scored = per_doc.withColumns(
            {
                "n_docs": F.count(F.lit(1)).over(w).cast("bigint"),
                "sum_len": F.sum("doclen").over(w).cast("bigint"),
                **{
                    f"df_{t}": F.sum(
                        F.when(_tf(t) > 0, 1).otherwise(0)
                    )
                    .over(w)
                    .cast("bigint")
                    for t in terms
                },
            }
        )
    else:
        stats_df = per_doc.agg(*stats_aggs)
        scored = per_doc.crossJoin(F.broadcast(stats_df))
    # identical op tree to the SQL oracle: every step is a single IEEE
    # op on identically-valued operands
    len_norm = F.lit(k1) * (
        F.lit(one_minus_b)
        + F.lit(b) * ((F.col("doclen") * F.col("n_docs")) / F.col("sum_len"))
    )
    score = None
    for t in terms:
        idf = ((F.col("n_docs") - _df_(t)) + F.lit(0.5)) / (
            _df_(t) + F.lit(0.5)
        )
        part = idf * (_tf(t) * F.lit(k1 + 1.0)) / (_tf(t) + len_norm)
        score = part if score is None else score + part
    return (
        scored.select(
            F.col(id_col), *[_tf(t) for t in terms], score.alias("score")
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def rrf_fuse(
    ranked: Sequence[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists — the
    standard score-free combiner for hybrid retrieval (lexical BM25 +
    vector ANN): rrf = Σ 1/(k_rrf + rank_i), missing-list entries
    contribute 0. Rank-based, so it needs no score calibration
    between heterogeneous rankers, and every arithmetic step is one
    IEEE division/addition on identical operands — bit-exact
    cross-engine given deterministic input ranks.

    Inputs carry (id_col, rank_col); lists are small (top-n per
    ranker). The N-way outer merge is a UNION + one groupBy — a
    single exchange of at most N·k skinny rows — rather than a chain
    of N-1 full_outer joins (full outer cannot broadcast in Spark, so
    the join form costs 2(N-1) sort-merge exchanges of the same tiny
    frames). The expensive part of hybrid search is the rankers, not
    the fuse, but the fuse shouldn't add stages either."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    tagged = [
        r.select(
            F.col(id_col),
            F.lit(i).alias("__src"),
            F.col(rank_col).cast("bigint").alias("__rank"),
        )
        for i, r in enumerate(ranked)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    rank_cols = [f"rank_{i}" for i in range(len(ranked))]
    fused = u.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("__src") == i, F.col("__rank"))).alias(name)
            for i, name in enumerate(rank_cols)
        ]
    )
    score = None
    for name in rank_cols:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(k_rrf) + F.col(name)), F.lit(0.0)
        )
        score = term if score is None else score + term
    return (
        fused.select(id_col, *rank_cols, score.alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
    )
