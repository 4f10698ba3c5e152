"""Scoped caching for query-builder fan-out frames.

Query builders (entry_queries, operators) cache frames their plans
reference several times. Plain ``df.cache()`` has exactly the right
read semantics — the CacheManager dedupes by canonicalized plan, so a
REBUILT identical query reuses the materialized frame across actions
and across builder calls — but entries live until an explicit
unpersist, so a long-lived session sweeping many queries accumulates
storage until LRU eviction thrash.

``scoped_cache`` keeps the cache() semantics and ALSO tracks every
cached frame per session (weakly — a dead session drops its whole
ledger), so sweepers can release them deterministically:

    from universal_importer_duckdb_spark.caching import release_scoped
    ...run any number of registry queries...
    release_scoped(spark)   # storage back to zero, nothing leaks

``spark.catalog.clearCache()`` is the blunt equivalent (it drops ALL
cached data, including user tables); release_scoped only drops what
the query builders created. bench.py clears between queries either
way; long-lived sessions should call release_scoped at natural
boundaries (end of a pipeline run, between registry sweeps).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

# session -> list of cached DataFrames. The session key is weak (a
# dead session drops its whole ledger); the FRAME references are
# strong on purpose — the builder-local variables die as soon as the
# builder returns, so the ledger is the owner that keeps the handle
# alive for release_scoped to unpersist. Bounded by the number of
# scoped_cache calls between releases.
_LEDGER: "weakref.WeakKeyDictionary[SparkSession, list[DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` plus registration in the session's release
    ledger. Use for builder-internal fan-out frames instead of bare
    cache().

    Self-pruning: entries whose cache was already dropped out-of-band
    (``spark.catalog.clearCache()``, an explicit unpersist) are
    evicted from the ledger here, so sessions that never call
    release_scoped — e.g. a bench loop clearing the whole cache
    between queries — don't accumulate dead py4j plan references on
    the driver heap."""
    df = df.cache()
    ledger = _LEDGER.setdefault(df.sparkSession, [])
    live = []
    for old in ledger:
        try:
            lvl = old.storageLevel
            if lvl.useMemory or lvl.useDisk:
                live.append(old)
        except Exception:
            pass  # session gone — drop
    ledger[:] = live
    ledger.append(df)
    return df


def release_scoped(spark: SparkSession) -> int:
    """Unpersist every scoped-cached frame created on this session.
    Returns the number of frames released. Blocking=False: block
    removal proceeds asynchronously executor-side."""
    frames = _LEDGER.pop(spark, [])
    n = 0
    for df in frames:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass  # session/executor already gone
    return n
