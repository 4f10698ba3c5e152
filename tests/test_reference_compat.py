"""Drop-in compatibility with the reference's OWN config and data:
`/root/reference/config.yaml` + `input_data/*.csv` run through this
engine unmodified (read-only access; nothing is written there)."""

from __future__ import annotations

import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/config.yaml"), reason="reference snapshot not present"
)

# the reference hardcodes this null-patch before validation (main.py:58-63)
REF_FILLNA = {
    "trial_period_ends_on": "",
    "ends_on": "",
    "es_contract_observations": "",
    "pt_contract_type_id": "",
}


@pytest.fixture(scope="module")
def ref_config():
    from universal_importer_duckdb_spark.config.loader import load_config

    return load_config(f"{REF}/config.yaml")


def test_reference_config_loads_and_validates(ref_config):
    from universal_importer_duckdb_spark.config.loader import validate_config

    details = validate_config(ref_config, "employees")
    assert details["settings"]["duplicate_resolution"] == "last"
    assert details["settings"]["unique_composite"] == [["employee_id", "company_id"]]


def test_reference_schema_compiles(spark, ref_config):
    from universal_importer_duckdb_spark.config.schema_compiler import compile_schema

    fields = ref_config["transformations_config"]["employees"]["validations"][
        "schema"
    ]["fields"]
    schema = compile_schema(fields, strict_required=True)
    assert len(schema.columns) == 24
    assert {c.check for c in schema.constraints} >= {"required", "type", "pattern"}


def test_reference_locations_missing_settings_raises(ref_config):
    """The reference's own `locations` entity has no settings block —
    its validate_config raises KeyError (latent config bug, SURVEY.md
    §5); we reproduce that contract exactly."""
    from universal_importer_duckdb_spark.config.loader import validate_config

    with pytest.raises(KeyError, match="settings"):
        validate_config(ref_config, "locations")


@pytest.fixture(scope="module")
def employees_result(spark, ref_config):
    import copy

    from universal_importer_duckdb_spark.plans.pipeline import run_pipeline

    cfg = copy.deepcopy(ref_config)
    ent = cfg["transformations_config"]["employees"]
    ent["source"] = f"{REF}/input_data/employees.csv"
    return run_pipeline(
        spark,
        cfg,
        "employees",
        today="2026-08-13",
        fillna=REF_FILLNA,
        strict_required=True,
    )


def test_reference_employees_pipeline_counts(employees_result):
    s = employees_result.summary
    assert s.total_records == 12
    # the fixture plants two duplicate composite keys (rows 11-12 repeat
    # rows 1 and 8 on (employee_id, company_id))
    assert s.duplicates_removed == 2
    assert s.total_records == (
        s.valid_records + s.schema_errors + s.duplicates_removed
        + s.custom_validation_errors
    )


def test_reference_employees_projections(employees_result):
    assert set(employees_result.projections) == {"personal_data", "contract_data"}
    # alias employee_id -> emp_id declared in the reference config
    assert "emp_id" in employees_result.projections["contract_data"].columns


def test_reference_last_resolution_keeps_late_duplicates(employees_result):
    stage = employees_result.stage
    # duplicated keys resolved to exactly one row each
    assert stage.groupBy("employee_id", "company_id").count().filter("count > 1").count() == 0
