"""Gap-asymmetric junction rate model (Marchegiani & Catelani 2025).

Correctness gates:

* pure tunneling conserves the total quasiparticle number
  N ∝ x_L + γ(x_Rgt + x_Rlt) exactly (the γ cross-normalization);
* with photons off and detailed-balance-consistent rates, the thermal
  state is stationary and the steady-state chemical potentials vanish —
  the paper's regime (iv);
* with the photon drive on, μ decreases with temperature and the system
  crosses over to full equilibrium (Fig. 3's qualitative structure);
* the steady state is differentiable in the drive strength.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from dataclasses import replace

from qpsim_tpu.qubit import (
    JunctionParams,
    TunnelingRates,
    chemical_potentials,
    classify_regime,
    detailed_balance_rates,
    evolve,
    junction_rhs,
    parity_switching_rate,
    qp_relaxation_rate,
    steady_state,
    temperature_sweep,
    thermal_densities,
    thermal_generation,
)


def _params(**kw):
    base = dict(
        gap_L=190.0, gap_R=180.0, omega_10=20.0,
        cooper_pairs_L=1.0e9, gamma_ph=3.0e-7,  # 300 Hz, ~µm³-scale electrode
    )
    base.update(kw)
    return JunctionParams(**base)


def test_tunneling_conserves_total_qp_number():
    """At T → 0 (no thermal generation) with recombination off, any state
    and any tunneling rates give d[x_L + γ(x_R> + x_R<)]/dt = 0."""
    rates = TunnelingRates(
        l_00=3.0, l_11=1.0, l_10=2.0, l_01=0.7,
        rgt_00=5.0, rgt_11=0.3, rgt_10=4.0, rgt_01=0.2, rlt_10=6.0,
        phi=0.3,
    )
    p = _params(
        r_L=0.0, r_Rgt=0.0, r_Rlt=0.0, r_cross=0.0,
        rates=rates, gamma_ph=0.0, tau_R=1e3, tau_E=2e3,
    )
    state = jnp.asarray([2.3e-5, 1.1e-5, 4.2e-6, 0.2])
    d = junction_rhs(p, 1e-3, state, photons_on=False)
    dn = float(d[0] + p.gamma * (d[1] + d[2]))
    assert abs(dn) < 1e-22, dn
    # the photon channel adds exactly one QP to each electrode per event:
    # dN = 2·γ^ph/N_cpL in the N/(2ν₀Δ_L V) normalization
    d_ph = junction_rhs(replace(p, gamma_ph=3e-7), 1e-3, state, photons_on=True)
    dn_ph = float(d_ph[0] + p.gamma * (d_ph[1] + d_ph[2]))
    np.testing.assert_allclose(dn_ph, 2 * 3e-7 / p.cooper_pairs_L, rtol=1e-10)


def test_thermal_state_is_stationary_with_photons_off():
    """Detailed-balance rates + balanced generation: the thermal state is
    an exact fixed point of the full system (regime iv by construction)."""
    T = 0.16
    p = _params(generation="balanced")
    p = replace(
        p, rates=detailed_balance_rates(p, T, l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0)
    )
    xl, xgt, xlt = thermal_densities(p, T)
    t_uev = T * 86.17333262145
    p1 = 1.0 / (1.0 + np.exp(p.omega_10 / t_uev))
    y = jnp.asarray([float(xl), float(xgt), float(xlt), p1])
    d = np.asarray(junction_rhs(p, T, y, photons_on=False))
    # scale-relative: residual per component vs its fastest process
    scales = np.abs(np.asarray([xl, xgt, xlt, p1])) + 1e-300
    assert np.all(np.abs(d[:3]) / scales[:3] < 1e-12), d
    assert abs(d[3]) < 1e-12 * max(p1, 1e-12), d
    # ... and Newton converges to it with μ ≈ 0
    y_ss = steady_state(p, T, photons_on=False)
    mu = np.asarray(chemical_potentials(p, T, y_ss))
    assert np.all(np.abs(mu) < 0.05), mu  # µeV
    assert classify_regime(mu, atol_ueV=0.5) == "full_equilibrium"


def test_photon_drive_regime_crossover_with_temperature():
    """Paper Fig. 3 structure: photon-driven nonequilibrium at base
    temperature, monotone-decreasing chemical potentials, and a crossover
    to full equilibrium once thermal phonon generation wins."""
    p = _params(tau_R=5e4)
    out = temperature_sweep(
        p,
        np.linspace(0.02, 0.28, 9),
        l_rates=dict(l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0),
    )
    mu = out["mu_ueV"]
    # low-T: strongly out of equilibrium (μ ≫ T); high-T: equilibrated
    assert np.all(mu[0] > 5.0), mu[0]
    assert out["regimes"][-1] == "full_equilibrium", out["regimes"]
    assert out["regimes"][0] != "full_equilibrium"
    # μ_L decreases (approximately monotonically) with temperature
    mul = mu[:, 0]
    assert mul[0] > mul[len(mul) // 2] > mul[-1] - 1e-9
    # the quasiparticle density itself INCREASES with T at the top end
    # (thermal generation dominates there)
    x_l = out["states"][:, 0]
    assert x_l[-1] > x_l[-3]


def test_parity_rate_floor_and_qp_relaxation():
    """At base temperature the parity-switching rate is dominated by the
    photon-assisted channel the paper anchors to experiment (300 Hz)."""
    T = 0.02
    p = _params(tau_R=5e4)
    p = replace(
        p, rates=detailed_balance_rates(p, T, l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0)
    )
    y = steady_state(p, T)
    rate = float(parity_switching_rate(p, y))
    assert rate >= p.gamma_ph
    assert rate < 10.0 * p.gamma_ph  # QP tunneling comparable, not runaway
    assert float(qp_relaxation_rate(p, y)) > 0.0


def test_steady_state_differentiable_in_drive():
    """∂x_L/∂γ^ph exists and is positive — the model composes with the
    framework's gradient-fitting tools."""
    T = 0.05
    base = _params(tau_R=5e4)
    rates = detailed_balance_rates(base, T, l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0)

    def x_l_of(gamma_ph):
        p = replace(base, gamma_ph=gamma_ph, rates=rates)
        return steady_state(p, T)[0]

    g = jax.grad(x_l_of)(3.0e-7)
    assert np.isfinite(float(g)) and float(g) > 0
    eps = 1e-9
    fd = (x_l_of(3.0e-7 + eps) - x_l_of(3.0e-7 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_evolution_approaches_steady_state():
    T = 0.05
    p = _params(tau_R=5e4)
    p = replace(
        p, rates=detailed_balance_rates(p, T, l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0)
    )
    y_ss = np.asarray(steady_state(p, T))
    y0 = jnp.asarray([0.0, 0.0, 0.0, 0.0])
    # recombination at x_ss ~ 5e-7 e-folds in ~1/(2 r x) ~ 6e8 ns; RK4
    # stability needs dt ≲ τ_R — 1e5 steps of 2e4 ns cover ~3 e-foldings
    _, ys = evolve(p, T, y0, dt=2e4, n_steps=100_000, store_every=10_000)
    y_end = np.asarray(ys)[-1]
    np.testing.assert_allclose(y_end[:3], y_ss[:3], rtol=0.05)


def test_generation_forms_agree_at_low_temperature():
    """The paper's main-text g^pn and the exact-closure form coincide in
    their common validity domain T ≪ δΔ ≪ Δ."""
    p = _params()
    for T in (0.05, 0.1):
        a = np.asarray(thermal_generation(p, T, balanced=False))
        b = np.asarray(thermal_generation(p, T, balanced=True))
        # with equal r_R's and r_cross = r_R the two forms coincide exactly
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_validation_errors():
    with pytest.raises(ValueError, match="gap_L"):
        JunctionParams(gap_L=100.0, gap_R=150.0).validate()
    with pytest.raises(ValueError, match="photon_split_gt"):
        JunctionParams(photon_split_gt=1.5).validate()
    with pytest.raises(ValueError, match="generation"):
        JunctionParams(generation="bogus").validate()
    JunctionParams().validate()
