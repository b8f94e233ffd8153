"""Photon-drive collision terms (Fischer et al. 2024) — op-level gates.

The analytic limits used as correctness oracles:

* pure pair-breaking generation from vacuum is exactly linear in dt
  (µ = 0 ⇒ the exponential update degenerates to forward Euler), with the
  closed-form per-bin rate c·n̄·K⁻(E_i, E_j)·ρ_i·ρ_j;
* with thermal occupations (f_FD for QPs, n_BE(ω_eff) for the photon
  mode) every term balances bin-by-bin — the thermal state is an exact
  fixed point of the update;
* the scattering term conserves QP number at the rate level; the
  exponential relaxation breaks it only at O(dt²) per step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.constants import K_B_UEV_PER_K
from qpsim_tpu.ops.dos import dynes_density_of_states, fermi_dirac_occupation
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.photon_drive import build_photon_drive_plan, make_photon_substep

GAP = 180.0
NE = 24


def _grid():
    E, dE = build_energy_grid(GAP, 1.0, 4.0, NE)
    rho = dynes_density_of_states(E, GAP, 0.0)
    return E, dE, rho


def _bose(omega: float, T: float) -> float:
    return 1.0 / np.expm1(omega / (K_B_UEV_PER_K * T))


def test_pair_breaking_generation_rate_from_vacuum():
    E, dE, rho = _grid()
    omega = 2.5 * GAP  # > 2Δ
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=omega,
        coupling=3e-4, occupancy=2.0, include_scattering=False,
    )
    assert plan.s_index >= 0
    dt = 0.05
    step = make_photon_substep(plan, dt)
    n0 = jnp.zeros((NE, 3, 4))
    n1 = np.asarray(step(n0, jnp.asarray(1.0)))
    s = plan.s_index
    expect = np.zeros(NE)
    for i in range(NE):
        j = s - i
        if 0 <= j < NE:
            expect[i] = dt * plan.coupling * plan.occupancy * plan.km_pair[i] * rho[i] * rho[j]
    np.testing.assert_allclose(n1[:, 1, 2], expect, rtol=1e-12, atol=1e-30)
    # pairs: the two partners of each absorbed photon appear together
    total = float(n1[:, 0, 0].sum() * dE)
    assert total > 0
    # gated off -> exact identity
    n_off = np.asarray(step(jnp.full((NE, 2, 2), 1e-5), jnp.asarray(0.0)))
    np.testing.assert_array_equal(n_off, np.full((NE, 2, 2), 1e-5))


def test_thermal_state_is_exact_fixed_point_of_scattering():
    E, dE, rho = _grid()
    T = 0.25
    k = 5
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=k * dE,
        coupling=1e-3, occupancy=_bose(k * dE, T), include_pair_breaking=False,
    )
    assert plan.k_offset == k and plan.s_index < 0
    n_eq = jnp.asarray((rho * fermi_dirac_occupation(E, T))[:, None])
    step = make_photon_substep(plan, 0.1)
    n1 = step(n_eq, jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.asarray(n1), np.asarray(n_eq), rtol=0, atol=1e-16
    )


def test_thermal_state_is_exact_fixed_point_of_pair_breaking():
    E, dE, rho = _grid()
    T = 0.3
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=2.7 * GAP,
        coupling=2e-3, occupancy=1.0, include_scattering=False,
    )
    assert plan.s_index >= 0
    # detailed balance needs n̄ = n_BE at the grid-snapped pair energy
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=plan.omega_eff_pair,
        coupling=2e-3, occupancy=_bose(plan.omega_eff_pair, T),
        include_scattering=False,
    )
    n_eq = jnp.asarray((rho * fermi_dirac_occupation(E, T))[:, None])
    n1 = make_photon_substep(plan, 0.1)(n_eq, jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.asarray(n1), np.asarray(n_eq), rtol=0, atol=1e-16
    )


def test_scattering_conserves_number_at_first_order():
    E, dE, rho = _grid()
    rng = np.random.default_rng(3)
    n0 = jnp.asarray(rho[:, None] * rng.uniform(0.1, 0.5, (NE, 5)))
    errs = []
    for dt in (2e-3, 1e-3):
        plan = build_photon_drive_plan(
            E_bins=E, dE=dE, gap=GAP, rho=rho, omega=4 * dE,
            coupling=5e-3, occupancy=1.5, include_pair_breaking=False,
        )
        n1 = make_photon_substep(plan, dt)(n0, jnp.asarray(1.0))
        tot0 = float(jnp.sum(n0) * dE)
        errs.append(abs(float(jnp.sum(n1) * dE) - tot0) / tot0)
    assert errs[0] < 1e-7, errs
    # O(dt²): halving dt cuts the error ~4x
    assert errs[1] < errs[0] / 3.0, errs


def test_scattering_redistributes_downward_in_cold_bath():
    # n̄ = 0: only spontaneous emission — occupation flows DOWN by ω
    E, dE, rho = _grid()
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=6 * dE,
        coupling=1e-2, occupancy=0.0, include_pair_breaking=False,
    )
    n0 = np.zeros((NE, 1))
    n0[-1] = rho[-1] * 0.3  # top bin occupied
    step = make_photon_substep(plan, 0.5)
    n1 = np.asarray(step(jnp.asarray(n0), jnp.asarray(1.0)))
    assert n1[-1, 0] < n0[-1, 0]
    assert n1[NE - 1 - 6, 0] > 0  # arrived exactly ω below
    moved = np.delete(n1[:, 0], [NE - 1, NE - 1 - 6])
    np.testing.assert_allclose(moved, 0.0, atol=1e-30)


def test_pair_breaking_inert_below_threshold_and_off_grid():
    E, dE, rho = _grid()
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=1.5 * GAP,  # < 2Δ
        coupling=1e-3, occupancy=1.0,
    )
    assert plan.s_index < 0
    huge = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=100 * GAP,  # beyond grid
        coupling=1e-3, occupancy=1.0,
    )
    assert huge.s_index < 0


def _engine_geometry(w=12, h=6):
    from qpsim_tpu.geometry.mask import create_intrinsic_geometry, mask_from_lists
    from qpsim_tpu.models.params import BoundaryCondition

    geo = create_intrinsic_geometry(width=w, height=h)
    mask = mask_from_lists(geo.mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
    return geo, mask, bcs


def test_engine_pair_breaking_window_generates_qps():
    """End-to-end: a windowed pair-breaking drive grows the QP mass during
    its window and is inert outside it."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry()
    init = np.zeros(mask.shape)
    init[mask] = 1e-7
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=1.0, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=12, enable_recombination=False,
        enable_scattering=False, bath_temperature=0.1,
    )
    drive = PhotonDriveSpec(
        mode="photon", photon_energy=2.6 * GAP, occupancy=1.0,
        coupling=1e-4, window_start=0.2, window_duration=0.4,
    )
    times, frames, mass, *_ = run_2d_crank_nicolson(**kw, photon_drive=drive)
    mass = np.asarray(mass)
    times = np.asarray(times)
    i_on = int(np.searchsorted(times, 0.2))
    i_off = int(np.searchsorted(times, 0.65))
    # pre-window: only diffusion roundoff (~1e-15 relative) may move mass
    assert abs(mass[i_on] - mass[0]) < 1e-12 * mass[0], "drive fired before its window"
    assert mass[i_off] > 2.0 * mass[0], "window did not generate QPs"
    assert abs(mass[-1] - mass[i_off]) < 1e-3 * mass[i_off], "drive leaked past window"
    # outside-mask cells stay NaN (no generation off the film)
    f = np.asarray(frames[-1])
    assert np.all(np.isnan(f[~mask]))
    # identical run without the drive: flat mass
    t2, f2, mass2, *_ = run_2d_crank_nicolson(**kw)
    assert abs(mass2[-1] - mass2[0]) < 1e-12 * max(mass2[0], 1e-30)


def test_engine_thermal_stationary_under_balanced_photon_scattering():
    """With n̄ = n_BE(ω_eff) and a thermal initial state, the photon
    scattering drive leaves the run stationary through the full engine."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.ops.photon_drive import build_photon_drive_plan
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    E, dE, rho = _grid()
    T = 0.25
    k = 4
    geo, mask, bcs = _engine_geometry(8, 4)
    init = np.zeros(mask.shape)
    # thermal spatial profile: uniform; energy weights default to DOS — use
    # a custom thermal state via initial_condition weights instead: simplest
    # is the engine's energy_weights argument with FD·ρ (normalized inside).
    init[mask] = 1.0
    w = rho * fermi_dirac_occupation(E, T)
    scale = float((w * dE).sum())
    init[mask] = scale  # so state = w per pixel after normalization
    drive = PhotonDriveSpec(
        mode="photon", photon_energy=k * dE, occupancy=_bose(k * dE, T),
        coupling=5e-3, include_pair_breaking=False,
    )
    times, frames, mass, *_ = run_2d_crank_nicolson(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=NE, energy_weights=w, enable_recombination=False,
        enable_scattering=False, bath_temperature=T, photon_drive=drive,
    )
    mass = np.asarray(mass)
    assert abs(mass[-1] - mass[0]) < 1e-9 * mass[0], (mass[0], mass[-1])


def test_engine_merged_matches_exact_with_photon_drive():
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry()
    init = np.zeros(mask.shape)
    init[mask] = 1e-6
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.6, dx=1.0,
        store_every=3, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=10, enable_recombination=True,
        enable_scattering=True, bath_temperature=0.1,
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=2.4 * GAP, occupancy=0.5,
            coupling=5e-5,
        ),
    )
    te, fe, me, *_ = run_2d_crank_nicolson(**kw, strang_mode="exact")
    tm, fm, mm, *_ = run_2d_crank_nicolson(**kw, strang_mode="merged")
    # merged reorders the same operators at O(dt²·steps)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(me), rtol=2e-4)


def test_engine_mesh_photon_drive_matches_single_chip():
    """Photon drive on the mesh path: the substep shifts along the
    unsharded energy axis, so GSPMD partitions it with no extra
    communication — results must match the single-chip run exactly
    (strang pinned on both sides per the mesh-comparison rule)."""
    import jax

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.parallel.mesh import make_mesh
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    geo, mask, bcs = _engine_geometry(16, 16)
    init = np.zeros(mask.shape)
    init[mask] = 1e-6
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=8, enable_recombination=True,
        enable_scattering=True, bath_temperature=0.1,
        strang_mode="exact",
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=2.4 * GAP, occupancy=1.0,
            coupling=1e-4, window_start=0.1, window_duration=0.2,
        ),
    )
    t1, f1, m1, _, e1, _ = run_2d_crank_nicolson(**kw)
    mesh = make_mesh(n_space=len(jax.devices()))
    t2, f2, m2, _, e2, _ = run_2d_crank_nicolson(**kw, mesh=mesh)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)
    for a, b in zip(f2, f1):
        np.testing.assert_allclose(
            np.asarray(a)[mask], np.asarray(b)[mask], rtol=0, atol=1e-15
        )
    assert m1[-1] > 2.0 * m1[0]  # the drive actually fired


def test_per_pixel_substep_matches_uniform_on_uniform_gap():
    """The Δ²-affine per-pixel substep reduces to the uniform-gap substep
    when Δ²(x) is constant — same operator, different coefficient algebra
    (1 + Δ²·(1/EᵢEⱼ) vs 1 + Δ²/(EᵢEⱼ)), so agreement is to f64 roundoff."""
    from qpsim_tpu.ops.photon_drive import (
        build_photon_drive_plan_analytic,
        make_photon_substep_per_pixel,
    )

    E, dE, rho = _grid()
    omega = 2.6 * GAP
    rng = np.random.default_rng(7)
    n0 = jnp.asarray(rho[:, None] * rng.uniform(0.0, 0.4, (NE, 12)))
    uni = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=omega,
        coupling=2e-3, occupancy=1.3,
    )
    ana = build_photon_drive_plan_analytic(
        E_bins=E, dE=dE, omega=omega, coupling=2e-3, occupancy=1.3,
    )
    assert (ana.k_offset, ana.s_index) == (uni.k_offset, uni.s_index)
    dt = 0.07
    out_u = make_photon_substep(uni, dt)(n0, jnp.asarray(1.0))
    delta2 = jnp.full((1, 12), GAP * GAP)
    rho_pp = jnp.asarray(np.broadcast_to(rho[:, None], (NE, 12)).copy())
    out_p = make_photon_substep_per_pixel(ana, dt)(
        n0, jnp.asarray(1.0), None, delta2, rho_pp
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_u), rtol=1e-13, atol=1e-25
    )


def test_per_pixel_pair_breaking_respects_local_threshold():
    """Two-gap film with ω between the two pair-breaking thresholds:
    vacuum generation fires only where ω > 2Δ(x), and the above-threshold
    pixels match a uniform run at that gap exactly."""
    from qpsim_tpu.ops.dos import dynes_density_of_states
    from qpsim_tpu.ops.photon_drive import (
        build_photon_drive_plan_analytic,
        make_photon_substep_per_pixel,
    )

    E, dE, _ = _grid()  # grid referenced to GAP=180
    gap_lo, gap_hi = 180.0, 260.0
    omega = 2.4 * gap_lo  # 432 < 2*260 = 520
    ana = build_photon_drive_plan_analytic(
        E_bins=E, dE=dE, omega=omega, coupling=1e-3, occupancy=2.0,
        include_scattering=False,
    )
    assert ana.s_index >= 0
    npix = 6
    gaps = np.where(np.arange(npix) < 3, gap_lo, gap_hi)
    delta2 = jnp.asarray((gaps**2)[None, :])
    rho_pp = jnp.asarray(
        np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps], axis=1)
    )
    dt = 0.05
    n1 = np.asarray(
        make_photon_substep_per_pixel(ana, dt)(
            jnp.zeros((NE, npix)), jnp.asarray(1.0), None, delta2, rho_pp
        )
    )
    assert n1[:, :3].sum() > 0, "no generation in the above-threshold region"
    np.testing.assert_array_equal(n1[:, 3:], 0.0)
    # above-threshold columns match the uniform-gap plan at gap_lo
    rho_lo = dynes_density_of_states(E, gap_lo, 0.0)
    uni = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=gap_lo, rho=rho_lo, omega=omega,
        coupling=1e-3, occupancy=2.0, include_scattering=False,
    )
    ref = np.asarray(
        make_photon_substep(uni, dt)(jnp.zeros((NE, 1)), jnp.asarray(1.0))
    )
    for c in range(3):
        np.testing.assert_allclose(n1[:, c], ref[:, 0], rtol=1e-13, atol=1e-30)


def test_engine_gap_map_photon_generates_only_above_threshold():
    """Engine-level gap map (G > 1): a pair-breaking drive with ω between
    the regional thresholds grows QPs only in the low-gap half."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry(12, 4)
    init = np.zeros(mask.shape)
    times, frames, mass, *_ = run_2d_crank_nicolson(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
        store_every=2, energy_gap=150.0, energy_max_factor=4.0,
        num_energy_bins=12, enable_diffusion=False,
        enable_recombination=False,
        enable_scattering=False, bath_temperature=0.1,
        gap_expression="return 150.0 + 100.0 * (x > 0.5)",  # 150 | 250 µeV
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=2.6 * 150.0,  # 390: only 150-side
            occupancy=1.0, coupling=1e-4, include_scattering=False,
        ),
    )
    final = np.nan_to_num(np.asarray(frames[-1]))
    left = final[:, :6].sum()
    right = final[:, 6:].sum()
    assert left > 0, "no generation in the above-threshold half"
    assert right == 0.0, "generation fired where omega < 2*gap"
    assert mass[-1] > mass[0]


def test_engine_gap_map_photon_mesh_matches_single_chip():
    """Gap map × photon drive × mesh: the per-pixel substep's Δ²/ρ planes
    ride as sharded jit arguments; results must match single-chip exactly
    (strang pinned on both sides per the mesh-comparison rule)."""
    import jax

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.parallel.mesh import make_mesh
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    geo, mask, bcs = _engine_geometry(16, 16)
    init = np.zeros(mask.shape)
    init[mask] = 1e-6
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.4, dx=1.0,
        store_every=2, energy_gap=150.0, energy_max_factor=4.0,
        num_energy_bins=8, enable_recombination=True,
        enable_scattering=True, bath_temperature=0.1,
        strang_mode="exact",
        # keep Δ(x) below the first bin center (178.1) so the uniform
        # initial spectrum stays allowed everywhere
        gap_expression="return 150.0 + 20.0 * x",
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=2.8 * 150.0, occupancy=1.0,
            coupling=1e-4,
        ),
    )
    t1, f1, m1, _, e1, _ = run_2d_crank_nicolson(**kw)
    mesh = make_mesh(n_space=len(jax.devices()))
    t2, f2, m2, _, e2, _ = run_2d_crank_nicolson(**kw, mesh=mesh)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)
    for a, b in zip(f2, f1):
        np.testing.assert_allclose(
            np.asarray(a)[mask], np.asarray(b)[mask], rtol=0, atol=1e-15
        )
    assert m1[-1] > 1.5 * m1[0]  # the drive actually fired


def test_engine_host_generation_composes_with_photon_drive():
    """Host-evaluated custom generation (the untraceable-expression
    fallback) now composes with the photon drive: the per-step host path
    applies the same gen-add → photon → C/2 D C/2 order as the scan path,
    so an effectively-constant host expression matches constant mode."""
    from qpsim_tpu.models.params import ExternalGenerationSpec, PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry(10, 5)
    init = np.zeros(mask.shape)
    init[mask] = 1e-7
    base = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=10, enable_recombination=True,
        enable_scattering=True, bath_temperature=0.1, strang_mode="exact",
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=2.5 * GAP, occupancy=1.0,
            coupling=1e-4, window_start=0.1, window_duration=0.25,
        ),
    )
    # Python conditional on traced t -> host-evaluated fallback
    host_gen = ExternalGenerationSpec(
        mode="custom", custom_body="2e-6 if t >= 0 else 0.0"
    )
    const_gen = ExternalGenerationSpec(mode="constant", rate=2e-6)
    th, fh, mh, *_ = run_2d_crank_nicolson(**base, external_generation=host_gen)
    tc, fc, mc, *_ = run_2d_crank_nicolson(**base, external_generation=const_gen)
    np.testing.assert_allclose(np.asarray(mh), np.asarray(mc), rtol=1e-12)
    np.testing.assert_allclose(
        np.nan_to_num(np.asarray(fh[-1])), np.nan_to_num(np.asarray(fc[-1])),
        rtol=0, atol=1e-18,
    )
    assert mh[-1] > 2.0 * mh[0]  # both channels actually injected


def test_photon_spec_validation_and_storage_roundtrip(tmp_path):
    from qpsim_tpu.models.params import PhotonDriveSpec, SimulationParameters

    with pytest.raises(ValueError, match="photon_energy"):
        PhotonDriveSpec(mode="photon").validate()
    with pytest.raises(ValueError, match="window"):
        PhotonDriveSpec(
            mode="photon", photon_energy=400.0, coupling=1e-3, window_start=1.0
        ).validate()
    with pytest.raises(ValueError, match="energy-resolved"):
        SimulationParameters(
            diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
            photon_drive=PhotonDriveSpec(
                mode="photon", photon_energy=400.0, coupling=1e-3
            ),
        )

    # storage: spec round-trips through the setup JSON; absent key -> off
    from qpsim_tpu.io.storage import _parameters_from, serialize_setup

    p = SimulationParameters(
        diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
        energy_gap=GAP, num_energy_bins=8, energy_max_factor=4.0,
        photon_drive=PhotonDriveSpec(
            mode="photon", photon_energy=450.0, occupancy=2.0, coupling=1e-3,
            window_start=0.1, window_duration=0.5,
        ),
    )
    from dataclasses import asdict

    back = _parameters_from(asdict(p))
    assert back.photon_drive == p.photon_drive
    legacy = asdict(p)
    del legacy["photon_drive"]
    assert not _parameters_from(legacy).photon_drive.enabled


def test_engine_multi_tone_drive():
    """A list of PhotonDriveSpec is a multi-tone drive (readout + pump):
    the modes apply sequentially per step.  A second tone with coupling=0
    changes nothing bit-for-bit; two genuinely active tones inject more
    than either alone; and windows gate each tone independently."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry()
    init = np.zeros(mask.shape)
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.6, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=12, enable_diffusion=False,
        enable_recombination=False, enable_scattering=False,
        bath_temperature=0.0,
    )
    pump = PhotonDriveSpec(
        mode="photon", photon_energy=2.6 * GAP, occupancy=1.0, coupling=1e-4,
        include_scattering=False, window_start=0.0, window_duration=0.3,
    )
    probe = PhotonDriveSpec(
        mode="photon", photon_energy=2.4 * GAP, occupancy=2.0, coupling=5e-5,
        include_scattering=False, window_start=0.3, window_duration=0.3,
    )
    dead = PhotonDriveSpec(
        mode="photon", photon_energy=2.2 * GAP, occupancy=1.0, coupling=0.0,
    )
    _, f1, m1, *_ = run_2d_crank_nicolson(**kw, photon_drive=pump)
    _, f1d, m1d, *_ = run_2d_crank_nicolson(**kw, photon_drive=[pump, dead])
    np.testing.assert_array_equal(np.asarray(m1d), np.asarray(m1))
    np.testing.assert_array_equal(
        np.nan_to_num(np.asarray(f1d[-1])), np.nan_to_num(np.asarray(f1[-1]))
    )
    _, _, m2, *_ = run_2d_crank_nicolson(**kw, photon_drive=probe)
    _, _, mb, *_ = run_2d_crank_nicolson(**kw, photon_drive=[pump, probe])
    # disjoint windows with no other physics: injections simply accumulate
    # (each tone generates from the SAME slowly-filling vacuum state, so
    # the total is within a few dt·rate of the sum of the solo runs)
    assert mb[-1] > m1[-1] and mb[-1] > m2[-1]
    np.testing.assert_allclose(mb[-1], m1[-1] + m2[-1], rtol=2e-2)


def test_engine_multi_tone_thermal_fixed_point():
    """Two thermally balanced tones (scattering + pair-breaking, each with
    n̄ = n_BE at ITS grid-snapped ω_eff): each substep is an exact fixed
    point, so their sequential composition is stationary too."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    E, dE, rho = _grid()
    T = 0.25
    geo, mask, bcs = _engine_geometry(8, 4)
    init = np.zeros(mask.shape)
    w = rho * fermi_dirac_occupation(E, T)
    init[mask] = float((w * dE).sum())
    k = 4
    tone_s = PhotonDriveSpec(
        mode="photon", photon_energy=k * dE, occupancy=_bose(k * dE, T),
        coupling=5e-3, include_pair_breaking=False,
    )
    probe_pb = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=2.7 * GAP,
        coupling=1.0, occupancy=1.0, include_scattering=False,
    )
    tone_pb = PhotonDriveSpec(
        mode="photon", photon_energy=probe_pb.omega_eff_pair,
        occupancy=_bose(probe_pb.omega_eff_pair, T), coupling=2e-3,
        include_scattering=False,
    )
    times, frames, mass, *_ = run_2d_crank_nicolson(
        mask=mask, edges=geo.edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
        store_every=2, energy_gap=GAP, energy_max_factor=4.0,
        num_energy_bins=NE, energy_weights=w, enable_recombination=False,
        enable_scattering=False, bath_temperature=T,
        photon_drive=[tone_s, tone_pb],
    )
    mass = np.asarray(mass)
    assert abs(mass[-1] - mass[0]) < 1e-9 * mass[0], (mass[0], mass[-1])


def test_multi_tone_storage_roundtrip_and_validation():
    from dataclasses import asdict

    from qpsim_tpu.io.storage import _parameters_from, serialize_setup
    from qpsim_tpu.models.params import PhotonDriveSpec, SimulationParameters

    tones = [
        PhotonDriveSpec(mode="photon", photon_energy=450.0, occupancy=1.0, coupling=1e-3),
        PhotonDriveSpec(
            mode="photon", photon_energy=500.0, occupancy=2.0, coupling=5e-4,
            window_start=0.1, window_duration=0.2,
        ),
    ]
    p = SimulationParameters(
        diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
        energy_gap=GAP, num_energy_bins=8, energy_max_factor=4.0,
        photon_drive=tones,
    )
    back = _parameters_from(asdict(p))
    assert isinstance(back.photon_drive, list)
    assert back.photon_drive == tones

    # scalar-mode rejection applies to list drives too
    with pytest.raises(ValueError, match="energy-resolved"):
        SimulationParameters(
            diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
            photon_drive=tones,
        )

    # an all-off list serializes to no key at all (reference-era contract)
    from qpsim_tpu.models.params import SetupData

    p_off = SimulationParameters(
        diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
        photon_drive=[PhotonDriveSpec(), PhotonDriveSpec()],
    )
    setup = SetupData(
        setup_id="s01", name="s", created_at="now", geometry=None,
        boundary_conditions={}, parameters=p_off, initial_condition=None,
    )
    payload = serialize_setup(setup)
    assert "photon_drive" not in payload["parameters"]

    # tuple drives (photon_drive_specs accepts them) serialize like lists
    p_tuple = SimulationParameters(
        diffusion_coefficient=6.0, dt=0.05, total_time=1.0, mesh_size=1.0,
        energy_gap=GAP, num_energy_bins=8, energy_max_factor=4.0,
        photon_drive=tuple(tones),
    )
    payload2 = serialize_setup(
        SetupData(
            setup_id="s02", name="s", created_at="now", geometry=None,
            boundary_conditions={}, parameters=p_tuple, initial_condition=None,
        )
    )
    assert isinstance(payload2["parameters"]["photon_drive"], list)
    assert len(payload2["parameters"]["photon_drive"]) == 2


def test_engine_rejects_inert_photon_drive():
    """A drive whose channels both snap off the grid would be the identity
    while still disabling gen-fusion — the engine refuses with guidance."""
    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    geo, mask, bcs = _engine_geometry(8, 4)
    kw = dict(
        mask=mask, edges=geo.edges, edge_conditions=bcs,
        initial_field=np.zeros(mask.shape),
        diffusion_coefficient=6.0, dt=0.05, total_time=0.2, dx=1.0,
        energy_gap=GAP, energy_max_factor=4.0, num_energy_bins=8,
        enable_recombination=False, enable_scattering=False,
        bath_temperature=0.1,
    )
    # scattering-only at omega far beyond the grid span: k snaps to 0
    inert = PhotonDriveSpec(
        mode="photon", photon_energy=50.0 * GAP, occupancy=1.0,
        coupling=1e-4, include_pair_breaking=False,
    )
    with pytest.raises(ValueError, match="inert"):
        run_2d_crank_nicolson(**kw, photon_drive=inert)
    # pair-breaking-only below threshold: channel closed, also inert
    below = PhotonDriveSpec(
        mode="photon", photon_energy=1.5 * GAP, occupancy=1.0,
        coupling=1e-4, include_scattering=False,
    )
    with pytest.raises(ValueError, match="inert"):
        run_2d_crank_nicolson(**kw, photon_drive=below)


def test_ensemble_rejects_multi_tone_photon():
    import jax.numpy as jnp

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=2, member_shape=(4, 8), num_energy_bins=5, dt=0.05,
        dtype=jnp.float64,
    )
    tones = [
        PhotonDriveSpec(mode="photon", photon_energy=450.0, occupancy=1.0, coupling=1e-4),
        PhotonDriveSpec(mode="photon", photon_energy=500.0, occupancy=1.0, coupling=1e-4),
    ]
    with pytest.raises(ValueError, match="multi-tone"):
        ens.make_chunk(2, photon=tones)


def test_sep_adi_auto_tile_budget_refusal():
    """Over-budget extents return None (the builder falls back to the
    general kernels) instead of a sub-128 width Mosaic cannot tile."""
    from qpsim_tpu.ops.pallas_adi_sep import _auto_tile

    assert _auto_tile(1024) == 128
    assert _auto_tile(1024, coupled=True) == 128
    assert _auto_tile(40_000) is None


def test_photon_occupancy_is_differentiable_and_recoverable():
    """Traced photon occupancy in the differentiable sim: gradient matches
    finite differences, and a gradient fit recovers the true n̄ from a
    synthetic response trace — the Fischer-2024 experimental inference
    problem (photon number in the mode from the measured QP response)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.diff import fit_parameters, make_differentiable_sim

    sim = make_differentiable_sim(
        nx=24, num_energy_bins=8, n_steps=24, dt=0.05, n0=1e-6,
        phonon_feedback=False, photon_omega=2.5 * 180.0,
        photon_window=(0.1, 0.6),
    )
    base = {
        "D0": 6.0, "tau_s": 440.0, "tau_r": 440.0, "photon_coupling": 1e-4,
    }

    def total(nbar):
        return jnp.sum(sim({**base, "photon_occupancy": nbar})["total"])

    g = jax.grad(total)(1.5)
    eps = 1e-6
    fd = (total(1.5 + eps) - total(1.5 - eps)) / (2 * eps)
    assert np.isfinite(g) and g > 0
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)

    true_nbar = 2.0
    observed = sim({**base, "photon_occupancy": true_nbar})["total"]
    fitted = fit_parameters(
        observed,
        {"photon_occupancy": 0.5},
        decay_fn=lambda p: sim({**base, **p})["total"],
        learning_rate=0.2,
        n_iters=150,
    )
    assert abs(float(fitted["photon_occupancy"]) - true_nbar) / true_nbar < 0.02


def test_substep_is_jit_and_grad_safe():
    E, dE, rho = _grid()
    plan = build_photon_drive_plan(
        E_bins=E, dE=dE, gap=GAP, rho=rho, omega=2.6 * GAP,
        coupling=1e-3, occupancy=1.0,
    )
    step = make_photon_substep(plan, 0.05)
    n0 = jnp.asarray(rho[:, None] * 0.2)

    @jax.jit
    def total(amp):
        return jnp.sum(step(n0, amp))

    g = jax.grad(total)(jnp.asarray(1.0))
    assert np.isfinite(float(g))
