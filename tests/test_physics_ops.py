"""Core physics precompute: grids, DOS, kernels, phonon maps."""

import numpy as np
import pytest

from qpsim_tpu.constants import K_B_UEV_PER_K
from qpsim_tpu.ops.dos import (
    bcs_density_of_states,
    dynes_density_of_states,
    thermal_phonon_occupation,
    thermal_qp_weights,
    diffusion_coefficient_of_energy,
)
from qpsim_tpu.ops.energy_grid import build_energy_grid, integration_widths_from_centers
from qpsim_tpu.ops.kernels import (
    recombination_kernel,
    recombination_kernel_base,
    scattering_kernel,
    scattering_kernel_base,
    thermal_generation_rate,
)
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map


def test_energy_grid_cell_centered():
    E, dE = build_energy_grid(100.0, 1.0, 3.0, 10)
    assert dE == 20.0
    assert E[0] == 110.0 and E[-1] == 290.0
    assert np.allclose(np.diff(E), dE)
    # all bins live strictly above the gap
    assert np.all(E > 100.0)


def test_energy_grid_single_bin_unit_weight():
    E, dE = build_energy_grid(100.0, 1.5, 1.5, 1)
    assert E.shape == (1,) and dE == 1.0 and E[0] == 150.0


def test_energy_grid_rejects_bad_inputs():
    with pytest.raises(ValueError):
        build_energy_grid(0.0, 1.0, 2.0, 4)
    with pytest.raises(ValueError):
        build_energy_grid(100.0, 2.0, 1.0, 4)


def test_integration_widths():
    w = integration_widths_from_centers(np.array([1.0, 2.0, 4.0]))
    assert np.allclose(w, [1.0, 1.5, 2.0])
    assert integration_widths_from_centers(np.array([3.0]), fallback_width=7.0)[0] == 7.0
    with pytest.raises(ValueError):
        integration_widths_from_centers(np.array([2.0, 1.0]))


def test_dynes_reduces_to_bcs_and_stays_positive():
    E = np.linspace(150.0, 800.0, 40)
    gap = 180.0
    assert np.allclose(dynes_density_of_states(E, gap, 0.0), bcs_density_of_states(E, gap))
    rho = dynes_density_of_states(E, gap, 0.5)
    assert np.all(rho >= 0.0)
    assert np.all(np.isfinite(rho))
    # Dynes smears density below the gap
    assert dynes_density_of_states(np.array([170.0]), gap, 5.0)[0] > 0.0
    # far above the gap the DOS tends to 1
    assert abs(dynes_density_of_states(np.array([1e6]), gap, 0.5)[0] - 1.0) < 1e-4


def test_thermal_occupations():
    omega = np.array([10.0, 100.0, 1000.0])
    assert np.all(thermal_phonon_occupation(omega, 0.0) == 0.0)
    occ = thermal_phonon_occupation(omega, 0.5)
    kT = K_B_UEV_PER_K * 0.5
    np.testing.assert_allclose(occ, 1.0 / (np.exp(omega / kT) - 1.0), rtol=1e-12)
    E, _ = build_energy_grid(180.0, 1.0, 4.0, 16)
    assert np.all(thermal_qp_weights(E, 180.0, 0.0) == 0.0)
    w = thermal_qp_weights(E, 180.0, 0.3, 0.1)
    assert np.all(w >= 0) and w[0] > w[-1]  # occupation decays with E


def test_diffusion_coefficient_of_energy():
    E = np.array([180.0, 254.55844123, 360.0])
    D = diffusion_coefficient_of_energy(6.0, E, 180.0)
    assert D[0] == 0.0  # at the gap, group velocity vanishes
    assert np.allclose(D[1], 6.0 * np.sqrt(1 - 0.5), rtol=1e-6)
    assert D[2] < 6.0


def test_kernel_structure():
    E, _ = build_energy_grid(180.0, 1.0, 4.0, 12)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 440.0, 1.2)
    assert np.all(np.diag(Ks) == 0.0)
    assert np.allclose(Ks, Ks.T)  # base kernel symmetric in (i, j)
    assert np.allclose(Kr, Kr.T)
    assert np.all(Kr > 0)


def test_detailed_balance_of_dressed_scattering():
    E, _ = build_energy_grid(180.0, 1.0, 4.0, 24)
    T = 0.25
    Ks = scattering_kernel(E, 180.0, 440.0, 1.2, T)
    kT = K_B_UEV_PER_K * T
    lhs = Ks
    rhs = Ks.T * np.exp(np.clip((E[:, None] - E[None, :]) / kT, -200, 200))
    rel = np.max(np.abs(lhs - rhs)) / np.max(np.abs(Ks))
    assert rel < 1e-9


def test_zero_temperature_scattering_is_emission_only():
    E, _ = build_energy_grid(180.0, 1.0, 4.0, 8)
    Ks = scattering_kernel(E, 180.0, 440.0, 1.2, 0.0)
    # upper triangle (E_i < E_j, absorption) must vanish at T=0
    assert np.all(Ks[np.triu_indices(8, k=1)] == 0.0)
    assert np.any(Ks[np.tril_indices(8, k=-1)] > 0.0)


def test_thermal_generation_balances_recombination():
    E, dE = build_energy_grid(180.0, 1.0, 4.0, 24)
    T = 0.3
    Kr = recombination_kernel(E, 180.0, 440.0, 1.2, T)
    n_eq = thermal_qp_weights(E, 180.0, T, 0.0)
    G = thermal_generation_rate(n_eq, Kr, dE)
    loss = 2.0 * n_eq * dE * (Kr @ n_eq)
    np.testing.assert_allclose(G, loss, rtol=1e-12)


def test_phonon_frequency_map_uniform_grid_is_compact():
    E, _ = build_energy_grid(180.0, 1.0, 4.0, 16)
    pm = build_phonon_frequency_map(E)
    # uniform grid: diffs and sums each take O(NE) distinct values
    assert pm.num_omega <= 4 * 16
    np.testing.assert_allclose(pm.omega_bins[pm.idx_sum], E[:, None] + E[None, :], atol=1e-9)
    np.testing.assert_allclose(
        pm.omega_bins[pm.idx_diff], np.abs(E[:, None] - E[None, :]), atol=1e-9
    )
    assert np.all(np.diag(pm.diff_sign) == 0)
    # one-hot scatter matrices: each pair row sums to exactly 1
    assert np.all(pm.scatter_diff.sum(axis=1) == 1.0)
    assert np.all(pm.scatter_sum.sum(axis=1) == 1.0)


def test_evaluate_gap_expression_validation():
    import pytest

    from qpsim_tpu.expr.safe_eval import ExpressionError
    from qpsim_tpu.fields import evaluate_gap_expression

    mask = np.ones((2, 4), dtype=bool)
    # empty expression -> uniform default over interior pixels
    np.testing.assert_allclose(evaluate_gap_expression("", mask, 180.0), 180.0)
    # spatially varying map in normalized coordinates
    vals = evaluate_gap_expression("return 100.0 + 50.0 * x", mask, 180.0)
    assert vals.shape == (8,)
    assert vals.min() >= 100.0 and vals.max() <= 150.0
    # non-positive and non-finite maps are rejected
    with pytest.raises(Exception):
        evaluate_gap_expression("return 0.0 * x", mask, 180.0)
    with pytest.raises(Exception):
        evaluate_gap_expression("return x / 0.0", mask, 180.0)
    # sandbox rejects dunders
    with pytest.raises(ExpressionError):
        evaluate_gap_expression("__import__('os').getcwd()", mask, 180.0)


def test_fixed_phonon_history_scaffold():
    from qpsim_tpu.solver.phonon_history import build_fixed_phonon_history

    mask = np.ones((2, 3), dtype=bool)
    mask[0, 0] = False
    times = [0.0, 1.0, 2.0]
    frames, eframes, bins, meta = build_fixed_phonon_history(
        mask=mask, times=times, bath_temperature=0.3, phonon_energy_bins=None
    )
    assert len(frames) == 3
    # constant bath: every stored frame identical, NaN outside the mask
    np.testing.assert_array_equal(np.isnan(frames[0]), ~mask)
    np.testing.assert_array_equal(
        np.nan_to_num(frames[0]), np.nan_to_num(frames[-1])
    )
    assert meta["mode"] == "fixed_temperature"
    # zero-temperature bath -> zero occupation
    z_frames, *_ = build_fixed_phonon_history(
        mask=mask, times=times, bath_temperature=0.0, phonon_energy_bins=None
    )
    assert np.nanmax(z_frames[0]) == 0.0
