"""Golden end-to-end: reproduces the reference's documented example run
shape (readme.md:206-216): 12 total / 10 valid / 2 schema errors /
1 custom error / 2 duplicates removed — on our own synthetic fixture."""

from __future__ import annotations

import os

import pytest

CONFIG = {
    "transformations_config": {
        "employees": {
            "source": "SET_AT_RUNTIME",
            "settings": {
                "duplicate_resolution": "last",
                "custom_validation_mode": "skip",
                "unique_composite": [["employee_id", "company_id"]],
            },
            "projections": [
                {
                    "name": "personal_data",
                    "type": "table",
                    "query": "SELECT employee_id, company_id, first_name, email FROM employees",
                },
                {
                    "name": "contract_data",
                    "type": "view",
                    "query": "SELECT employee_id, salary_amount FROM employees",
                    "aliases": {"employee_id": "emp_id"},
                },
            ],
            "validations": {
                "schema": {
                    "fields": {
                        "company_id": {"type": "int", "required": True},
                        "employee_id": {"type": "int", "required": True},
                        "first_name": {"type": "str", "required": True},
                        "email": {
                            "type": "str",
                            "required": True,
                            "pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$",
                        },
                        "birthday_on": {
                            "type": "str",
                            "required": True,
                            "pattern": "^\\d{4}-\\d{2}-\\d{2}$",
                        },
                        "salary_amount": {"type": "float"},
                    }
                },
                "custom": {
                    "rules": [
                        {
                            "field": "birthday_on",
                            "validation": "age_gte",
                            "params": {"min_age": 35},
                        }
                    ]
                },
            },
        }
    }
}

CSV = """company_id,employee_id,first_name,email,birthday_on,salary_amount,phone
101,1,Ana,ana@x.com,1980-01-01,50000,111
101,2,Bo,bo@x.com,1975-05-05,60000,222
101,3,Cy,cy-bad-email,1970-01-01,70000,333
101,4,Di,di@x.com,1999-12-31,40000,444
101,5,Ed,ed@x.com,1960-06-06,55000,555
102,6,Fi,fi@x.com,not-a-date,45000,666
101,7,Gus,gus@x.com,1985-03-03,65000,777
101,8,Hana,hana@x.com,1982-02-02,52000,888
101,9,Ivo,ivo@x.com,1978-08-08,58000,999
101,10,Jo,jo@x.com,1965-09-09,62000,000
101,1,Ana2,ana2@x.com,1980-01-02,51000,111
101,8,Hana2,hana2@x.com,1982-02-03,53000,888
"""


@pytest.fixture(scope="module")
def pipeline_result(spark, tmp_path_factory):
    from universal_importer_duckdb_spark.plans.pipeline import run_pipeline

    tmp = tmp_path_factory.mktemp("e2e")
    src = os.path.join(tmp, "employees.csv")
    with open(src, "w") as f:
        f.write(CSV)
    import copy

    cfg = copy.deepcopy(CONFIG)
    cfg["transformations_config"]["employees"]["source"] = src
    out_dir = os.path.join(tmp, "output")
    return (
        run_pipeline(
            spark, cfg, "employees", today="2026-08-13", output_dir=str(out_dir)
        ),
        str(out_dir),
    )


def test_summary_counts(pipeline_result):
    result, _ = pipeline_result
    s = result.summary
    # 12 total; rows 3 (bad email) + 6 (bad date) fail schema; dups on
    # (1,101) and (8,101) remove the *first*-ingested copies under
    # 'last'; row 4 (age 26) fails age_gte in skip mode.
    assert s.total_records == 12
    assert s.schema_errors == 2
    assert s.duplicates_removed == 2
    assert s.custom_validation_errors == 1
    assert s.valid_records == 7  # 12 - 2 schema - 2 dups - 1 custom


def test_last_resolution_kept_late_rows(pipeline_result):
    result, _ = pipeline_result
    names = {r.first_name for r in result.stage.collect()}
    assert "Ana2" in names and "Ana" not in names
    assert "Hana2" in names and "Hana" not in names


def test_projection_alias_applied(pipeline_result):
    result, _ = pipeline_result
    assert result.projections["contract_data"].columns == ["emp_id", "salary_amount"]


def test_undeclared_column_dropped(pipeline_result):
    result, _ = pipeline_result
    assert "phone" not in result.stage.columns


def test_export_files_written(pipeline_result):
    _, out_dir = pipeline_result
    assert os.path.exists(os.path.join(out_dir, "exports", "personal_data.csv"))
    assert os.path.exists(os.path.join(out_dir, "errors", "employees_schema_validation_errors.csv"))
    assert os.path.exists(os.path.join(out_dir, "errors", "employees_duplicates_errors.csv"))
    assert os.path.exists(os.path.join(out_dir, "errors", "employees_custom_birthday_on_errors.csv"))


def test_stop_mode_on_schema_errors_raises(spark, tmp_path):
    import copy

    from universal_importer_duckdb_spark.plans.pipeline import run_pipeline

    src = tmp_path / "employees.csv"
    src.write_text(CSV)
    cfg = copy.deepcopy(CONFIG)
    ent = cfg["transformations_config"]["employees"]
    ent["source"] = str(src)
    ent["settings"]["custom_validation_mode"] = "stop"
    with pytest.raises(ValueError, match="Schema validation failed"):
        run_pipeline(spark, cfg, "employees", today="2026-08-13")


def test_caller_frame_without_ingest_ord_still_dedups(spark, tmp_path):
    """unique_composite configured + caller-supplied source_df with no
    _ingest_ord and no order_cols: an ingest order is derived so dedup
    ALWAYS runs (silently skipping it would leak duplicates into every
    projection — the reference always dedups)."""
    import copy

    from universal_importer_duckdb_spark.plans.pipeline import run_pipeline
    from universal_importer_duckdb_spark.sources.readers import (
        read_csv_with_ingest_order,
    )

    src = tmp_path / "employees.csv"
    src.write_text(CSV)
    # a frame WITHOUT the stamp (drop it after a normal read)
    df = read_csv_with_ingest_order(spark, str(src)).drop("_ingest_ord")
    cfg = copy.deepcopy(CONFIG)
    cfg["transformations_config"]["employees"]["source"] = str(src)
    result = run_pipeline(
        spark, cfg, "employees", source_df=df, today="2026-08-13"
    )
    assert result.summary.duplicates_removed == 2
    assert result.stage.count() == 7


def test_missing_explicit_order_cols_raise(spark, tmp_path):
    import copy

    from universal_importer_duckdb_spark.plans.pipeline import run_pipeline
    from universal_importer_duckdb_spark.sources.readers import (
        read_csv_with_ingest_order,
    )

    src = tmp_path / "employees.csv"
    src.write_text(CSV)
    df = read_csv_with_ingest_order(spark, str(src)).drop("_ingest_ord")
    cfg = copy.deepcopy(CONFIG)
    cfg["transformations_config"]["employees"]["source"] = str(src)
    with pytest.raises(ValueError, match="order columns"):
        run_pipeline(
            spark, cfg, "employees", source_df=df,
            order_cols=["no_such_column"], today="2026-08-13",
        )
