"""The in-package physics gates must pass with default parameters."""

from qpsim_tpu import run_fast_validation_suite


def test_fast_validation_suite_passes():
    report = run_fast_validation_suite()
    details = report.as_dict()
    assert report.overall_passed, details
    assert details["detailed_balance"]["max_relative_error"] <= 1e-9
    assert details["pure_diffusion"]["mass_relative_drift"] <= 1e-10
    assert details["thermal_stability"]["max_relative_drift"] <= 1e-6
    assert details["pure_scattering"]["mass_relative_drift"] <= 2e-5
    assert details["pure_recombination"]["passed"]
