from universal_importer_duckdb_spark.plans.pipeline import PipelineResult, run_pipeline

__all__ = ["PipelineResult", "run_pipeline"]
