"""bench.py contract tests (driver-facing artifact).

The driver runs ``python bench.py`` at the end of every round and records the
result; round 2's artifact was lost to a tunnel outage because the script
crashed before printing anything.  The contract under test: bench ALWAYS
prints exactly one parseable JSON line with the headline fields and exits 0,
even when the TPU backend is unreachable.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


@pytest.mark.slow
def test_bench_emits_degraded_json_line_when_backend_unavailable():
    env = dict(os.environ)
    # An unknown platform makes the probe child's backend init raise quickly —
    # the same failure class as the r2 tunnel outage (UNAVAILABLE at init).
    env["JAX_PLATFORMS"] = "bogus_platform_does_not_exist"
    env["QPSIM_BENCH_PROBE_TIMEOUT_S"] = "60"
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=180,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload["metric"] == "cell-steps/sec (2D CN, 1024^2 grid)"
    assert payload["value"] == 0.0
    assert payload["unit"] == "cell-steps/s"
    assert payload["vs_baseline"] == 0.0
    assert payload["error"] == "tpu_unavailable"
    # The outage payload must still carry the newest checked-in hardware
    # capture (VERDICT r4 weak #4): a driver reading only BENCH_r*.json sees
    # the last real numbers plus their provenance.
    last = payload["last_captured"]
    assert last["file"].startswith("BENCH_CAPTURED_r")
    assert last["value"] > 0
    assert "captured_at" in last


@pytest.mark.slow
def test_bench_smoke_runs_every_stage_on_cpu():
    """QPSIM_BENCH_SMOKE=1 runs all 14 stages end-to-end at tiny shapes on
    the CPU backend (interpret-mode Pallas) — stage wiring regressions must
    surface here, not on TPU time."""
    env = dict(os.environ)
    env["QPSIM_BENCH_SMOKE"] = "1"
    env["QPSIM_PERSISTENT_CACHE"] = "0"
    r = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, r.stdout
    payload = json.loads(lines[0])
    assert payload.get("smoke") is True
    assert "stage_errors" not in payload, payload["stage_errors"]
    assert payload["value"] > 0
    for key in (
        "coupled_1024_ms_per_step",
        "coupled_1024_ms_per_step_exact_strang",
        "sharded_overhead_1dev",
        "collisions_100bin_ms_per_substep",
        "snapshot_overlap_dense_over_sparse",
        "mkid_pulse_10k_steps_wallclock_s",
    ):
        assert key in payload, key


def test_bench_module_stage_functions_exist():
    """Every stage wired in main() must resolve to a callable at import time
    (a typo'd stage name would otherwise only fail on TPU hardware)."""
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    for name in (
        "bench_scalar_cn_1024",
        "bench_masked_512",
        "bench_coupled_2d",
        "bench_coupled_full_scale",
        "bench_rooflines",
        "bench_sharded_overhead_1dev",
        "bench_collisions_50bin",
        "bench_collisions_100bin",
        "bench_analytic_gap",
        "bench_analytic_gap_100bin",
        "bench_1d_64bin",
        "bench_ensemble_sweep",
        "bench_mkid_pulse",
        "bench_engine_snapshot_overlap",
    ):
        assert callable(getattr(bench, name))
