"""tools/bench_report.py unit coverage (pure Python — no Spark):
the r11 median/hysteresis classifier and the README prior-class
parser, pinned so a format drift in the generated table can't
silently disable the hysteresis memory (the bug class found during
r11: the parser assumed a fixed column count and returned {})."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench_report",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_report.py"),
)
br = importlib.util.module_from_spec(spec)
spec.loader.exec_module(br)


def test_classify_plain_thresholds():
    assert br.classify(None) == "no-oracle-timing"
    assert br.classify(0.05) == "scheduling-floor"
    assert br.classify(0.5) == "comparable"
    assert br.classify(5.0) == "artifact-replay"


def test_classify_zero_is_a_real_timing():
    # 0.0 is a recorded (sub-millisecond) timing, NOT absent — the
    # r10 advice fix: it classifies instead of falling into the
    # no-oracle bucket
    assert br.classify(0.0) == "scheduling-floor"


def test_classify_hysteresis_keeps_prior_inside_band():
    lo, hi = br.BANDS[("scheduling-floor", "comparable")]
    mid = (lo + hi) / 2
    assert br.classify(mid, "scheduling-floor") == "scheduling-floor"
    assert br.classify(mid, "comparable") == "comparable"
    # outside the band the prior is ignored
    assert br.classify(hi + 0.01, "scheduling-floor") == "comparable"
    assert br.classify(lo - 0.01, "comparable") == "scheduling-floor"
    # a prior from the OTHER boundary's pair doesn't stick here
    assert br.classify(mid, "artifact-replay") == (
        "scheduling-floor" if mid < 0.1 else "comparable"
    )


def test_classify_hysteresis_artifact_boundary():
    lo, hi = br.BANDS[("comparable", "artifact-replay")]
    mid = (lo + hi) / 2
    assert br.classify(mid, "artifact-replay") == "artifact-replay"
    assert br.classify(mid, "comparable") == "comparable"
    assert br.classify(hi + 0.1, "comparable") == "artifact-replay"


def test_prior_classes_parses_any_column_count():
    text = "\n".join(
        [
            br.START,
            "",
            "header prose",
            "",
            "| entry | spark s | oracle s | ratio | class | note |",
            "| --- | ---: | ---: | ---: | --- | --- |",
            "| old_style | 0.5 | 0.2 | 2.50 | comparable | note |",
            br.END,
        ]
    )
    assert br.prior_classes(text) == {"old_style": "comparable"}
    text2 = "\n".join(
        [
            br.START,
            "| entry | a | b | c | d | e | class | note |",
            "| --- | - | - | - | - | - | --- | --- |",
            "| new_style | 0.5 | 0.4 | 0.2 | 0.1 | 2.50 "
            "| scheduling-floor | some note |",
            br.END,
        ]
    )
    assert br.prior_classes(text2) == {"new_style": "scheduling-floor"}


def test_prior_classes_empty_without_markers():
    assert br.prior_classes("no table here") == {}


def test_build_table_handles_zero_and_absent_oracle():
    detail = {
        "sf": 0.1,
        "calibration_sec": 0.1,
        "queries": {"a": 0.5, "b": 0.4},
        "queries_median": {"a": 0.55, "b": 0.45},
        "oracle": {"a": 0.0, "b": None},
        "oracle_median": {"a": 0.0, "b": None},
    }
    table = br.build_table(detail, {})
    row_a = next(ln for ln in table.splitlines() if ln.startswith("| a |"))
    row_b = next(ln for ln in table.splitlines() if ln.startswith("| b |"))
    # zero oracle: a REAL recorded timing (prints 0.000, classifies
    # floor, ratio undefined); absent oracle: em-dash everywhere
    assert "0.000" in row_a and "scheduling-floor" in row_a
    assert "—" in row_b and "no-oracle-timing" in row_b
