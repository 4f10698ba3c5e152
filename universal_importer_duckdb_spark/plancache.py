"""Prepared-plan reuse for registry queries.

Building a non-trivial DataFrame plan from Python is not free: every
``F.col``/``select``/``withColumn`` is a py4j round-trip, and the big
registry builders (LSH near-dup, hard-negative mining, hybrid
retrieval) issue hundreds of them — measured 0.5-0.9 s of pure
DRIVER-side construction per call at sf0.1, more than the queries'
actual cluster execution. A long-lived session re-running the same
query pays that construction every time for a byte-identical plan.

DataFrames are immutable logical plans, so the fix is the classic
prepared-statement pattern: build the plan ONCE per (session,
dataset-dir, query) and hand back the same DataFrame on every
subsequent call. Execution is completely unaffected — each action
re-plans physically from the logical plan as usual (cache lookups,
AQE, fresh shuffles every run); only the Python-side plan
construction is skipped.

Builders that run bounded driver-side work at construction time (BPE
merge induction, IVF centroid training, 1-row stats collects) benefit
doubly: the deterministic trained artifact is reused instead of
re-derived, which is exactly how a production session would hold a
trained tokenizer or centroid set.

Memoization is per SparkSession (weak — a dead session drops its
plans) and keyed by (query name, sf_dir). Streaming entries are NOT
memoized: their builders drain a fresh availableNow query with a
unique checkpoint per call, so a second call must re-drain, not
replay a stale result frame.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["prepared_registry"]

_PLANS: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _prepared(
    name: str, fn: Callable[[SparkSession, str], DataFrame]
) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        plans = _PLANS.setdefault(spark, {})
        key = (name, sf_dir)
        df = plans.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            plans[key] = df
        return df

    wrapper.__name__ = getattr(fn, "__name__", name)
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn
    return wrapper


def prepared_registry(
    registry: dict[str, Callable[[SparkSession, str], DataFrame]],
) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Wrap every non-streaming registry callable in per-session
    prepared-plan memoization (see module docstring)."""
    return {
        name: fn if name.startswith("stream_") else _prepared(name, fn)
        for name, fn in registry.items()
    }
