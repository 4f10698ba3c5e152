"""The 7-stage pipeline as pure DataFrame lineage (reference
``main`` driver, main.py:401-505).

Stages: read → schema-validate → (stop gate) → dedup cascade → custom
rules → projections → export → summary. Each stage returns
``(kept, rejected)``; nothing is mutated. The post-validation frame is
cached because dedup, rules, and projections all fan out from it
(SURVEY.md §4.3.2).

Scale notes: validation is a narrow map (no shuffle); the only
shuffles are one per dedup composite key. Projections run through
Spark SQL on the staged view, so config queries get predicate
pushdown / column pruning / join strategies from Catalyst for free.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_importer_duckdb_spark.caching import release_scoped, scoped_cache
from universal_importer_duckdb_spark.config.loader import load_config, validate_config
from universal_importer_duckdb_spark.config.schema_compiler import compile_schema
from universal_importer_duckdb_spark.operators.dedup import dedupe_cascade
from universal_importer_duckdb_spark.operators.project import create_projections
from universal_importer_duckdb_spark.operators.rules import execute_custom_validations
from universal_importer_duckdb_spark.operators.summary import RunSummary
from universal_importer_duckdb_spark.operators.validate import validate_dataframe
from universal_importer_duckdb_spark.sources.readers import (
    INGEST_ORD,
    read_csv_with_ingest_order,
    with_ingest_order,
)
from universal_importer_duckdb_spark.sources.writers import export_csv, save_errors


@dataclass
class PipelineResult:
    entity: str
    stage: DataFrame | None = None
    schema_errors: DataFrame | None = None
    duplicates: DataFrame | None = None
    custom_issues: list[dict[str, Any]] = field(default_factory=list)
    projections: dict[str, DataFrame] = field(default_factory=dict)
    summary: RunSummary | None = None
    # observe mode: Observation handles planted on the stage lineage
    # (validate / post-dedup / per-rule); harvested lazily by
    # finalize_observed_summary after ONE action touches the stage
    observations: dict[str, Any] = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    config: dict[str, Any],
    entity: str,
    source_df: DataFrame | None = None,
    today: str | None = None,
    output_dir: str | None = None,
    fillna: dict[str, Any] | None = None,
    strict_required: bool = False,
    order_cols: list[str] | None = None,
    compute_summary: bool = True,
) -> PipelineResult:
    """Run the full pipeline for ``entity``.

    ``source_df`` overrides the config ``source`` CSV (must carry an
    ``_ingest_ord`` column or a unique ordering is derived from it).

    ``compute_summary=False`` skips every counting action and the
    fan-out caches, leaving ``result.summary`` None — the whole run
    then declares ONE lineage with zero Spark jobs, for callers that
    only consume ``result.stage``/``result.projections`` (the stop
    gate still runs its one count when mode is 'stop').

    ``compute_summary="observe"`` builds the same zero-job single
    lineage but plants ``Observation`` metric nodes at every funnel
    boundary (validate, post-dedup, each skip-mode rule). The FIRST
    action that consumes ``result.stage`` — an export, a count, a
    downstream aggregation — computes every funnel number as a side
    effect of its one pass; call :func:`finalize_observed_summary`
    afterwards to materialize ``result.summary``. At 100 TB this is
    the difference between the funnel costing one extra full scan per
    boundary and costing nothing. (Projection counts are not
    observed: projections are independent fan-out queries; their
    counts stay with the classic mode or the export path.)
    """
    observe = compute_summary == "observe"
    if observe:
        compute_summary = False
    details = validate_config(config, entity)
    settings = details.get("settings", {})
    schema_cfg = details.get("validations", {}).get("schema", {}).get("fields", {})
    rules = details.get("validations", {}).get("custom", {}).get("rules", [])
    schema = compile_schema(schema_cfg, strict_required=strict_required)

    if source_df is None:
        source_df = read_csv_with_ingest_order(spark, details["source"])
    result = PipelineResult(entity=entity)
    summary = RunSummary(entity=entity)

    ingest = INGEST_ORD if INGEST_ORD in source_df.columns else None
    obs_val = None
    if observe:
        from pyspark.sql import Observation

        obs_val = Observation()
        result.observations["validate"] = obs_val
    valid, errors, flagged = validate_dataframe(
        source_df, schema, fillna=fillna, ingest_ord=ingest,
        return_flagged=True, observe_with=obs_val,
    )
    result.schema_errors = errors
    # Action economy: ONE aggregation pass yields total + error counts
    # (valid is not cached — it is consumed exactly once, by the dedup
    # window; caching it costs more than the one recomputation).
    from universal_importer_duckdb_spark.operators.validate import FLAG_COL

    mode = settings.get("custom_validation_mode", "skip")
    if compute_summary:
        crow = flagged.agg(
            F.count(F.lit(1)).alias("t"),
            F.count_if(F.col(FLAG_COL)).alias("e"),
        ).collect()[0]
        summary.total_records = crow.t
        summary.schema_errors = crow.e
        summary.valid_records = crow.t - crow.e
        n_schema_errors = crow.e
    elif mode == "stop":
        # summary skipped, but the gate still needs this one count
        n_schema_errors = errors.count()
    else:
        n_schema_errors = 0

    # Stop gate: the reference reuses custom_validation_mode for this
    # decision (main.py:435-439 — setting conflation, kept for parity).
    if n_schema_errors > 0 and mode == "stop":
        raise ValueError(
            f"Schema validation failed for {n_schema_errors} rows in '{entity}'"
        )

    composite_keys = settings.get("unique_composite", []) or []
    resolution = settings.get("duplicate_resolution", "first")
    order: list[str] = order_cols or [ingest or INGEST_ORD]
    if composite_keys:
        missing = [c for c in order if c not in valid.columns]
        if missing and order_cols:
            # caller named ordering columns that don't exist — never
            # silently skip dedup (a data-correctness trap)
            raise ValueError(
                f"unique_composite dedup for '{entity}' needs order columns "
                f"{missing} that are absent from the frame"
            )
        if missing:
            # caller-supplied source_df without _ingest_ord and no
            # order_cols: derive an ingest order (JVM-side stamp) so
            # dedup ALWAYS runs when configured, as in the reference
            valid = with_ingest_order(valid)
            order = [INGEST_ORD]
        # Both outputs derive from the same windowed intermediate, so
        # the per-key shuffle is computed once per action branch; at the
        # pipeline's low dup rates the window's WindowGroupLimit
        # pre-filter beats the min_by aggregation form (measured at
        # sf0.1 — see operators/dedup.py). dedupe_cascade_keep_only
        # remains the pick for duplicate-heavy kept-only consumers.
        kept, dups = dedupe_cascade(valid, composite_keys, resolution, order)
        if observe:
            from pyspark.sql import Observation

            obs_kept = Observation()
            kept = kept.observe(
                obs_kept, F.count(F.lit(1)).alias("kept")
            )
            result.observations["dedup_kept"] = obs_kept
        if compute_summary:
            # cache the kept side (rules + projections + counts fan out
            # of it); duplicates_removed is derived arithmetically so
            # the dups branch is only computed when exporting errors
            kept = scoped_cache(kept)
            summary.duplicates_removed = summary.valid_records - kept.count()
    else:
        kept, dups = (scoped_cache(valid) if compute_summary else valid), valid.limit(0)
        summary.duplicates_removed = 0
    result.duplicates = dups

    kept_count = summary.valid_records - summary.duplicates_removed
    rule_obs: list | None = [] if (observe and mode == "skip") else None
    kept, issues = execute_custom_validations(
        kept, rules, mode=mode, today=today, observe_invalid=rule_obs
    )
    if rule_obs is not None:
        result.observations["rules"] = rule_obs
    result.custom_issues = issues
    if compute_summary:
        summary.custom_validation_errors = sum(
            issue["invalid"].count() for issue in issues if issue.get("invalid") is not None
        )

    stage = kept.drop(INGEST_ORD) if INGEST_ORD in kept.columns else kept
    if compute_summary:
        stage = scoped_cache(stage)
    result.stage = stage
    stage.createOrReplaceTempView(f"{entity}_stage")

    result.projections = create_projections(
        spark, entity, stage, details.get("projections", []), schema.columns
    )
    if compute_summary:
        for name, df in result.projections.items():
            summary.projection_counts[name] = df.count()
        # final record count: skip mode removed exactly the per-rule
        # invalid rows (null-predicate rows are kept, matching the
        # reference's DELETE semantics), so no extra scan is needed
        summary.valid_records = kept_count - (
            summary.custom_validation_errors if mode == "skip" else 0
        )
        result.summary = summary

    if output_dir:
        def _clean(edf: DataFrame) -> DataFrame:
            return edf.drop(INGEST_ORD) if INGEST_ORD in edf.columns else edf

        export_csv(result.projections, output_dir)
        save_errors(entity, "schema_validation", errors, output_dir)
        save_errors(entity, "duplicates", _clean(dups), output_dir)
        for issue in issues:
            if issue.get("invalid") is not None:
                save_errors(entity, f"custom_{issue['field']}", _clean(issue["invalid"]), output_dir)
    return result


def finalize_observed_summary(result: PipelineResult) -> RunSummary:
    """Materialize the funnel summary from a ``compute_summary=
    "observe"`` run. Call AFTER one action has consumed
    ``result.stage`` (or any frame derived from it) — ``Observation.
    get`` blocks until its metrics node has been executed, so calling
    this with no action yet issued will hang rather than guess.

    Every number is a byproduct of that single pass: total/schema
    errors from the validate node, duplicates from the post-dedup
    node, per-rule failures from the pre-filter rule nodes. Projection
    counts are NOT filled (independent fan-out queries — count them
    where they are exported)."""
    obs = result.observations
    if "validate" not in obs:
        raise ValueError("run_pipeline was not invoked with compute_summary='observe'")
    summary = RunSummary(entity=result.entity)
    v = obs["validate"].get
    summary.total_records = v["total"]
    summary.schema_errors = v["schema_errors"]
    valid_records = summary.total_records - summary.schema_errors
    if "dedup_kept" in obs:
        summary.duplicates_removed = valid_records - obs["dedup_kept"].get["kept"]
    else:
        summary.duplicates_removed = 0
    summary.custom_validation_errors = sum(
        ob.get["n_invalid"] for ob in obs.get("rules", [])
    )
    summary.valid_records = (
        valid_records - summary.duplicates_removed - summary.custom_validation_errors
    )
    result.summary = summary
    return summary


def main(argv: list[str] | None = None) -> int:
    """CLI mirroring the reference (main.py:402-406):
    ``python -m universal_importer_duckdb_spark.plans.pipeline <entity>
    [--config config.yaml] [--output_dir output]``."""
    from universal_importer_duckdb_spark.session import get_spark

    parser = argparse.ArgumentParser(description="Run the import pipeline for an entity")
    parser.add_argument("entity")
    parser.add_argument("--config", default="config.yaml")
    parser.add_argument("--output_dir", default="output")
    args = parser.parse_args(argv)

    # typed error handling mirroring the reference's except blocks
    # (reference main.py:496-505: print and exit, no traceback)
    try:
        spark = get_spark(app_name=f"pipeline-{args.entity}")
        config = load_config(args.config)
        result = run_pipeline(spark, config, args.entity, output_dir=args.output_dir)
    except FileNotFoundError as e:
        print(f"File not found: {e}")
        return 1
    except KeyError as e:
        print(f"Configuration error: {e}")
        return 1
    except ValueError as e:
        print(f"Validation error: {e}")
        return 1
    print(result.summary.report())
    # CLI is the terminal consumer: release the run's fan-out caches so
    # repeated invocations in one long-lived session don't accumulate
    release_scoped(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
