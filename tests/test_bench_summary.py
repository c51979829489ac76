"""The bench artifact's capture-proof summary line.

The driver records only the final ~2000 characters of bench.py stdout —
round 3's artifact lost the headline number when the full-detail JSON
outgrew that window. bench.py therefore prints a compact summary LAST
(`bench._compact_summary`); these tests pin that line's contract so a
future round adding stages can't silently push the headline back out of
the capture window.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

# The driver's tail window, minus slack for the trailing newline and any
# final log line the runner appends.
CAPTURE_WINDOW = 1900


def _synthetic_result(n_stages: int) -> dict:
    """A result dict shaped like main()'s, with n_stages gated stages
    (incl. nested sub-stages and one failure) and bulky non-stage keys."""
    detail: dict = {
        "backend": "tpu",
        "config": "x" * 500,  # bulky non-stage metadata must be dropped
        "quality_gate": "passed",
        "roofline": {"note": "y" * 400},  # no quality_gate -> skipped
    }
    for i in range(n_stages):
        stage = {
            "config": f"stage {i} long description " * 8,
            "elapsed_s": 1.2345678,
            "ess_per_sec": 10.0**i + 0.123456789,
            "ess_mean": 1e5,
            "quality_gate": "passed",
        }
        if i % 5 == 0:  # nested sub-stage (the bench_eight_schools shape)
            stage["sub_variant"] = {
                "draws_per_sec": 2.0e7,
                "quality_gate": "passed",
            }
        detail[f"stage_{i:02d}_with_a_descriptive_name"] = stage
    detail["broken_gate_failed"] = "ValueError: gate xyz failed " + "z" * 300
    return {
        "metric": "effective_samples_per_sec_per_chip",
        "value": 3.67e8,
        "unit": "ESS/s",
        "vs_baseline": 367.0,
        "detail": detail,
    }


def test_compact_summary_fits_driver_capture_window():
    # Far more stages than the real bench has today: the line must STILL
    # carry the contract fields inside the tail window.
    line = json.dumps(bench._compact_summary(_synthetic_result(25)))
    assert len(line) < CAPTURE_WINDOW, len(line)


def test_compact_summary_contract_fields_and_stage_map():
    result = _synthetic_result(6)
    summary = bench._compact_summary(result)
    # Contract fields the judge/driver parse.
    assert summary["metric"] == "effective_samples_per_sec_per_chip"
    assert summary["value"] == result["value"]
    assert summary["unit"] == "ESS/s"
    assert summary["vs_baseline"] == result["vs_baseline"]
    # One headline rate per stage, 4-significant-digit floats.
    stages = summary["stages"]
    assert stages["hmc_flagship"] == 3.67e8
    assert stages["stage_01_with_a_descriptive_name"] == 10.12
    # Nested sub-stages surface under dotted names.
    assert stages["stage_00_with_a_descriptive_name.sub_variant"] == 2e7
    # Failures are visible (truncated), and counted out of stages_passed.
    failed = stages["broken_FAILED"]
    assert failed.startswith("ValueError") and len(failed) <= 160
    # top-level gate + 6 stages + 2 nested subs all passed.
    assert summary["stages_passed"] == 9


def test_compact_summary_failed_stage_has_no_headline():
    result = _synthetic_result(2)
    result["detail"]["stage_00_with_a_descriptive_name"]["quality_gate"] = (
        "failed: rhat 1.7")
    summary = bench._compact_summary(result)
    assert summary["stages"]["stage_00_with_a_descriptive_name"] == "FAILED"
    # top-level(1) + stage_01(1) + the nested sub under the failed stage
    # (still reported independently)(1); exactly one fewer than all-pass.
    assert summary["stages_passed"] == 3
    all_pass = bench._compact_summary(_synthetic_result(2))
    assert summary["stages_passed"] == all_pass["stages_passed"] - 1


def _ratcheted_result():
    """A result whose floored stages all clear their _PERF_FLOORS."""
    detail: dict = {"backend": "tpu", "quality_gate": "passed"}
    for path, floors in bench._PERF_FLOORS.items():
        if path == "hmc_flagship":
            detail["ess_per_sec"] = floors["rate"] * 4
            detail["ess_mean"] = floors.get("ess_mean", 1) * 4
            detail["quality_gate"] = "passed"
            continue
        node = detail
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {"quality_gate": "passed"})
        node[parts[-1]] = {
            "ess_per_sec": floors["rate"] * 4,
            "ess_mean": floors.get("ess_mean", 1) * 4,
            "quality_gate": "passed",
        }
    value = detail.pop("ess_per_sec")
    return {
        "metric": "effective_samples_per_sec_per_chip",
        "value": value,
        "unit": "ESS/s",
        "vs_baseline": value / bench.BASELINE_ESS_PER_SEC,
        "detail": detail,
    }


def test_perf_ratchet_passes_at_measured_rates():
    result = _ratcheted_result()
    compact = bench._compact_summary(result)
    failures = bench._apply_perf_ratchet(result, compact)
    assert failures == [], failures
    assert compact["perf_ratchet"] == "passed"
    # floors are recorded alongside the rates in the full artifact
    assert result["detail"]["perf_floor_rate"] == (
        bench._PERF_FLOORS["hmc_flagship"]["rate"])
    nuts_pre = result["detail"]["nuts"]["preconditioned"]
    assert nuts_pre["perf_floor_rate"] == (
        bench._PERF_FLOORS["nuts.preconditioned"]["rate"])
    # the compact line still fits the driver capture window with the
    # ratchet marker attached
    assert len(json.dumps(compact)) < CAPTURE_WINDOW


def test_perf_ratchet_fails_throttled_stage():
    """VERDICT r4 'done' criterion: artificially throttling a stage fails
    its gate even though every quality gate still reads 'passed'."""
    result = _ratcheted_result()
    floor = bench._PERF_FLOORS["gibbs_mixture_65k"]["rate"]
    result["detail"]["gibbs_mixture_65k"]["ess_per_sec"] = floor / 3
    compact = bench._compact_summary(result)
    failures = bench._apply_perf_ratchet(result, compact)
    assert any("gibbs_mixture_65k" in f for f in failures), failures
    assert compact["perf_ratchet"] != "passed"


def test_perf_ratchet_fails_efficiency_collapse():
    # halved sampling efficiency with unchanged wall time: the rate can
    # stay above its floor while ess_mean collapses — the ess_mean floor
    # must catch it (VERDICT r4 weak #5)
    result = _ratcheted_result()
    result["detail"]["nuts"]["ess_mean"] = (
        bench._PERF_FLOORS["nuts"]["ess_mean"] / 10)
    compact = bench._compact_summary(result)
    failures = bench._apply_perf_ratchet(result, compact)
    assert any("nuts: ess_mean" in f for f in failures), failures


def test_perf_ratchet_fails_below_north_star():
    result = _ratcheted_result()
    result["value"] = bench.BASELINE_ESS_PER_SEC / 2
    compact = bench._compact_summary(result)
    failures = bench._apply_perf_ratchet(result, compact)
    assert any("north star" in f for f in failures), failures


def test_perf_ratchet_fails_missing_stage():
    result = _ratcheted_result()
    del result["detail"]["chees_65k"]
    compact = bench._compact_summary(result)
    failures = bench._apply_perf_ratchet(result, compact)
    assert any("chees_65k" in f and "missing" in f for f in failures)
