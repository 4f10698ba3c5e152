"""Port of the reference's config-validation suite
(reference tests/test_main.py:9-28) plus schema-compiler checks."""

from __future__ import annotations

import pytest

from universal_importer_duckdb_spark.config.loader import validate_config
from universal_importer_duckdb_spark.config.schema_compiler import (
    FieldSpec,
    compile_schema,
)

VALID = {
    "transformations_config": {
        "employees": {
            "source": "x.csv",
            "settings": {
                "duplicate_resolution": "last",
                "custom_validation_mode": "skip",
                "unique_composite": [["employee_id", "company_id"]],
            },
            "validations": {"schema": {"fields": {"employee_id": {"type": "int"}}}},
        }
    }
}


def test_valid_config_exposes_source_and_validations():
    details = validate_config(VALID, "employees")
    assert details["source"] == "x.csv"
    assert "validations" in details


def test_missing_entity_raises_keyerror():
    with pytest.raises(KeyError):
        validate_config(VALID, "nope")


def test_structurally_invalid_config_raises_keyerror():
    with pytest.raises(KeyError):
        validate_config({"transformations_config": {"e": {"source": "x"}}}, "e")


def test_bad_resolution_raises_valueerror():
    import copy

    cfg = copy.deepcopy(VALID)
    cfg["transformations_config"]["employees"]["settings"]["duplicate_resolution"] = "zap"
    with pytest.raises(ValueError):
        validate_config(cfg, "employees")


def test_schema_compiler_types_and_constraints(spark):
    schema = compile_schema(
        {
            "id": {"type": "int", "required": True},
            "email": {"type": "str", "pattern": "^a+$"},
            "score": {"type": "float", "min": 0},
        }
    )
    assert schema.columns == ["id", "email", "score"]
    checks = {(c.field, c.check) for c in schema.constraints}
    assert ("id", "required") in checks
    assert ("id", "type") in checks
    assert ("email", "pattern") in checks
    assert ("score", "min") in checks


def test_schema_compiler_rejects_unknown_type():
    with pytest.raises(ValueError):
        FieldSpec.from_dict("x", {"type": "list"})


def test_schema_compiler_rejects_unknown_keys():
    with pytest.raises(ValueError):
        FieldSpec.from_dict("x", {"type": "int", "maximum": 3})
