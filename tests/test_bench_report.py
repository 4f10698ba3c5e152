"""tools/bench_report.py unit coverage (pure Python — no Spark):
the r11 median/hysteresis classifier and the README prior-class
parser, pinned so a format drift in the generated table can't
silently disable the hysteresis memory (the bug class found during
r11: the parser assumed a fixed column count and returned {})."""

from __future__ import annotations

import importlib.util
import json
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


spec_bc = importlib.util.spec_from_file_location(
    "benchclass",
    os.path.join(os.path.dirname(__file__), "..", "tools", "benchclass.py"),
)
bc = importlib.util.module_from_spec(spec_bc)
spec_bc.loader.exec_module(bc)


def test_stickiness_two_agreeing_passes_beat_hysteresis():
    # the emb_hard_negatives failure mode: the 0.06-0.25 band could
    # keep an entry scheduling-floor forever however often its median
    # recorded >= 0.1 s. Two consecutive passes at/over the boundary
    # now graduate it regardless of the published prior.
    assert bc.classify(0.100, "scheduling-floor", 0.12) == "comparable"
    # symmetric demotion: two consecutive floor-side passes
    assert bc.classify(0.08, "comparable", 0.09) == "scheduling-floor"
    # and at the artifact boundary
    assert bc.classify(2.4, "comparable", 2.1) == "artifact-replay"


def test_stickiness_single_noisy_pass_still_absorbed():
    # previous pass on the OTHER side: hysteresis still applies
    assert bc.classify(0.15, "scheduling-floor", 0.05) == "scheduling-floor"
    assert bc.classify(0.08, "comparable", 0.12) == "comparable"
    # no previous median recorded (pre-r12 artifact): pure hysteresis
    assert bc.classify(0.15, "scheduling-floor", None) == "scheduling-floor"


def test_prior_state_prefers_artifact_over_readme(tmp_path):
    detail = tmp_path / "BENCH_DETAIL_last.json"
    readme = tmp_path / "README.md"
    detail.write_text(json.dumps({
        "classes": {"a": "comparable"},
        "oracle_median": {"a": 0.3, "b": None},
    }) + "\n")
    readme.write_text("\n".join([
        bc.START,
        "| entry | class |", "| --- | --- |",
        "| a | scheduling-floor |",
        bc.END,
    ]))
    classes, med, src = bc.prior_state(str(detail), str(readme))
    assert src == "artifact"
    assert classes == {"a": "comparable"}
    assert med == {"a": 0.3}  # None medians dropped


def test_prior_state_readme_fallback_for_pre_r12_artifact(tmp_path):
    detail = tmp_path / "BENCH_DETAIL_last.json"
    readme = tmp_path / "README.md"
    # pre-r12 artifact: no classes key
    detail.write_text(json.dumps({"oracle_median": {"a": 0.3}}) + "\n")
    readme.write_text("\n".join([
        bc.START,
        "| entry | class |", "| --- | --- |",
        "| a | scheduling-floor |",
        bc.END,
    ]))
    classes, med, src = bc.prior_state(str(detail), str(readme))
    assert src == "readme"
    assert classes == {"a": "scheduling-floor"}
    assert med == {}  # README carries no medians: stickiness can't fire


def test_prior_state_nothing_on_disk(tmp_path):
    classes, med, src = bc.prior_state(
        str(tmp_path / "nope.json"), str(tmp_path / "nope.md")
    )
    assert (classes, med, src) == ({}, {}, "none")


def test_build_table_renders_recorded_classes():
    # the artifact's own classes key wins over recomputation: a
    # stickiness-graduated entry renders as recorded even though the
    # naive prior-based classify would disagree
    detail = {
        "sf": 0.1, "calibration_sec": 0.1,
        "queries": {"a": 0.5}, "queries_median": {"a": 0.55},
        "oracle": {"a": 0.1}, "oracle_median": {"a": 0.1},
        "classes": {"a": "comparable"},
    }
    table = br.build_table(detail, {"a": "scheduling-floor"})
    row = next(ln for ln in table.splitlines() if ln.startswith("| a |"))
    assert "| comparable |" in row


def test_weak_block_skips_entry_without_cells():
    # r14 advice: a hand-recorded row carrying ratio_last but no
    # per-scale spark map must not abort README/SURVEY regeneration
    probe = {"entries": {
        "handrow": {"ratio_last": 3.5},
        "real": {"ratio_last": 2.5, "spark": {"1": 1.0, "64": 2.0},
                 "spark_passes": {"64": [1.9, 2.0, 2.1]},
                 "spark_exp": 0.2, "oracle_exp": 0.4},
    }}
    block = br.weak_block(probe)
    assert "handrow | 3.50x @x? |" in block
    assert "real | 2.50x @x64 |" in block
    assert "Canonical weak count: 2" in block


def test_weak_block_reports_pass_depth():
    probe = {"entries": {
        "real": {"ratio_last": 2.5, "spark": {"64": 2.0},
                 "spark_passes": {"64": [1.9, 2.0, 2.1]},
                 "spark_exp": 0.2, "oracle_exp": 0.4},
        "legacy": {"ratio_last": 2.2, "spark": {"16": 2.0},
                   "spark_exp": 0.1, "oracle_exp": 0.3},
    }}
    block = br.weak_block(probe)
    real = next(ln for ln in block.splitlines() if ln.startswith("| real"))
    legacy = next(ln for ln in block.splitlines() if ln.startswith("| legacy"))
    assert real.rstrip().endswith("| 3 |")    # 3 recorded passes
    assert legacy.rstrip().endswith("| 1 |")  # legacy scalar = 1 pass
