"""Board-wide physical-plan anti-pattern sweep (r11): every benched
entry's plan is audited for the three classes that have actually
produced board regressions or would be scale-killers at 100 TB —

- ``applySchemaToPythonRDD``: a Python-local createDataFrame being
  SERVED inside a query plan. Executes as a Python-RDD scan
  re-serialized through the Python worker on every action; the r11
  root-cause of docs_bpe_learn_merges' entire recorded 2.26x (a
  zero-compute 8-row control timed 0.38-0.48 s/action). Literal
  artifacts must be JVM VALUES LocalRelations (learn_bpe) or
  Arrow-converted frames.
- ``CartesianProduct``: an unintended cross join (the one legitimate
  1-row broadcast aggregate cross join in text_analysis renders as
  BroadcastNestedLoopJoin, not CartesianProduct).
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan. All
  Python on the board must be Arrow-batched (MapInPandas /
  ArrowEvalPython are allowed and are NOT flagged).

One test, all bench entries — a new entry or a refactor that
reintroduces any of these fails here before it ever reaches the
bench artifact.
"""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_module",
    os.path.join(os.path.dirname(__file__), "..", "bench.py"),
)
_bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_bench)


def test_no_plan_antipatterns_across_all_benched_entries(spark, sf_dir):
    from universal_importer_duckdb_spark import entry_queries as eq

    q = eq.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    findings: dict[str, list[str]] = {}
    for name in _bench.BENCH_QUERIES:
        df = q[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        hits = [
            marker
            for marker in (
                "applySchemaToPythonRDD",
                "CartesianProduct",
                "BatchEvalPython",
            )
            if marker in plan
        ]
        if hits:
            findings[name] = hits
    assert not findings, findings
