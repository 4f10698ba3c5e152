from __future__ import annotations

from universal_importer_duckdb_spark.config.schema_compiler import compile_schema
from universal_importer_duckdb_spark.operators.validate import validate_dataframe

SCHEMA = {
    "id": {"type": "int", "required": True},
    "email": {"type": "str", "required": True,
              "pattern": "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"},
    "salary": {"type": "float", "min": 0},
    "active": {"type": "bool"},
}


def _df(spark):
    rows = [
        ("1", "a@b.com", "100.5", "true", 1),
        ("2", "bad-email", "50", "false", 2),     # pattern error
        (None, "c@d.com", "10", "true", 3),       # required error
        ("xx", "e@f.com", "10", "true", 4),       # int coercion error
        ("5", "g@h.com", "-3", "true", 5),        # min error
        ("6", "i@j.com", None, None, 6),          # nulls on optional fields: ok
    ]
    return spark.createDataFrame(
        rows, "id string, email string, salary string, active string, _ingest_ord int"
    )


def test_validate_splits_valid_and_errors(spark):
    schema = compile_schema(SCHEMA)
    valid, errors = validate_dataframe(_df(spark), schema, ingest_ord="_ingest_ord")
    assert sorted(r.id for r in valid.collect()) == [1, 6]
    errs = {r.row: r.errors for r in errors.collect()}
    assert set(errs) == {2, 3, 4, 5}
    assert "email: string should match pattern" in errs[2]
    assert errs[3] == "id: field required"
    assert "id: value is not a valid int" in errs[4]
    assert "salary: value should be >= 0" in errs[5]


def test_validate_coerces_types(spark):
    schema = compile_schema(SCHEMA)
    valid, _ = validate_dataframe(_df(spark), schema, ingest_ord="_ingest_ord")
    dtypes = dict(valid.dtypes)
    assert dtypes["id"] == "bigint"
    assert dtypes["salary"] == "double"
    assert dtypes["active"] == "boolean"


def test_validate_drops_undeclared_columns(spark):
    df = spark.createDataFrame([("1", "a@b.com", "zap")], "id string, email string, phone string")
    schema = compile_schema({"id": {"type": "int"}, "email": {"type": "str"}})
    valid, _ = validate_dataframe(df, schema)
    assert valid.columns == ["id", "email"]


def test_validate_fillna_patches_before_required_check(spark):
    df = spark.createDataFrame([("1", None)], "id string, note string")
    schema = compile_schema({"id": {"type": "int"}, "note": {"type": "str", "required": True}})
    valid, errors = validate_dataframe(df, schema, fillna={"note": ""})
    assert valid.count() == 1 and errors.count() == 0


def test_validate_errors_keep_raw_values(spark):
    schema = compile_schema(SCHEMA)
    _, errors = validate_dataframe(_df(spark), schema, ingest_ord="_ingest_ord")
    raw = {r.row: r.id for r in errors.collect()}
    assert raw[4] == "xx"


def test_apply_defaults_substitutes_before_constraints(spark):
    """Config `default` key: ignored by default (reference parity,
    main.py:40-52), honored when compile_schema(apply_defaults=True) —
    a NULL required-with-default field takes the default instead of
    failing required."""
    schema_cfg = {
        "id": {"type": "int", "required": True},
        "dept": {"type": "str", "required": True, "default": "unassigned"},
        "score": {"type": "float", "default": 1.5},
    }
    rows = [("1", "eng", "9.9", 1), ("2", None, None, 2), (None, None, "3.0", 3)]
    df = spark.createDataFrame(rows, "id string, dept string, score string, _ingest_ord int")

    # Reference behavior: default parsed but never applied.
    ignored = compile_schema(schema_cfg)
    valid, errors = validate_dataframe(df, ignored, ingest_ord="_ingest_ord")
    errs = {r.row: r.errors for r in errors.collect()}
    assert "dept: field required" in errs[2]

    # Opt-in behavior: defaults fill NULLs before any constraint runs.
    applied = compile_schema(schema_cfg, apply_defaults=True)
    valid, errors = validate_dataframe(df, applied, ingest_ord="_ingest_ord")
    got = {r.id: (r.dept, r.score) for r in valid.collect()}
    assert got == {1: ("eng", 9.9), 2: ("unassigned", 1.5)}
    # id has no default, so row 3 still fails required.
    errs = {r.row: r.errors for r in errors.collect()}
    assert errs == {3: "id: field required"}
