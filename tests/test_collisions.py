"""Collision engine invariants: conservation, positivity, equilibrium."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
from qpsim_tpu.ops.dos import (
    dynes_density_of_states,
    thermal_phonon_occupation,
    thermal_qp_weights,
)
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

GAP, TAU, TC = 180.0, 440.0, 1.2


def _setup(ne=12, ny=1, nx=4, T=0.2, scattering=True, recombination=True,
           update_phonons=True, gamma=0.0, chunk=8):
    E, dE = build_energy_grid(GAP, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=dynes_density_of_states(E, GAP, gamma)[None],
        K_r0_by_gap=recombination_kernel_base(E, GAP, TAU, TC)[None] if recombination else None,
        K_s0_by_gap=scattering_kernel_base(E, GAP, TAU, TC)[None] if scattering else None,
        gap_id=np.zeros((ny, nx), np.int32),
        pmap=pm,
        enable_recombination=recombination,
        enable_scattering=scattering,
        update_phonons=update_phonons,
        pixel_chunk=chunk,
    )
    return E, dE, pm, plan


def test_pure_scattering_conserves_number():
    E, dE, pm, plan = _setup(recombination=False, update_phonons=False)
    ny, nx = 1, 4
    weights = np.exp(-(((E - 2.6 * GAP) / (0.6 * GAP)) ** 2))
    q = np.broadcast_to((2e-4 * weights / (weights.sum() * dE))[:, None, None], (12, ny, nx)).copy()
    ph = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
        (pm.num_omega, ny, nx),
    ).copy()
    step = jax.jit(make_collision_step(plan, 0.05))
    qj, pj = jnp.asarray(q), jnp.asarray(ph)
    n0 = float(jnp.sum(qj) * dE)
    for _ in range(10):
        qj, pj = step(qj, pj)
    n1 = float(jnp.sum(qj) * dE)
    assert abs(n1 - n0) / n0 < 2e-5
    assert float(jnp.min(qj)) >= 0.0


def test_pure_recombination_decays_monotonically_at_zero_T():
    E, dE, pm, plan = _setup(ne=1, scattering=False, T=0.0, update_phonons=False)
    q = jnp.asarray(np.full((1, 1, 4), 1e-3))
    ph = jnp.asarray(np.zeros((pm.num_omega, 1, 4)))
    step = jax.jit(make_collision_step(plan, 0.1))
    masses = [float(jnp.sum(q))]
    for _ in range(20):
        q, ph = step(q, ph)
        masses.append(float(jnp.sum(q)))
    assert all(b <= a + 1e-15 for a, b in zip(masses, masses[1:]))
    assert masses[-1] < masses[0]


def test_thermal_equilibrium_is_stationary():
    T = 0.25
    E, dE, pm, plan = _setup(ne=16, update_phonons=False)
    n_eq = thermal_qp_weights(E, GAP, T, 0.0)
    q = jnp.asarray(np.broadcast_to(n_eq[:, None, None], (16, 1, 4)).copy())
    ph = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, T)[:, None, None],
            (pm.num_omega, 1, 4),
        ).copy()
    )
    step = jax.jit(make_collision_step(plan, 0.05))
    q0 = q
    for _ in range(10):
        q, ph = step(q, ph)
    drift = float(jnp.max(jnp.abs(q - q0)) / jnp.max(jnp.abs(q0)))
    assert drift < 1e-6


def test_pair_breaking_creates_quasiparticles():
    # hot phonons above 2*gap break pairs: QP number must grow from zero
    E, dE, pm, plan = _setup(ne=8, scattering=False, update_phonons=True)
    q = jnp.asarray(np.zeros((8, 1, 4)))
    ph_vals = np.where(pm.omega_bins >= 2 * GAP, 0.5, 0.0)
    ph = jnp.asarray(np.broadcast_to(ph_vals[:, None, None], (pm.num_omega, 1, 4)).copy())
    step = jax.jit(make_collision_step(plan, 0.05))
    for _ in range(5):
        q, ph = step(q, ph)
    assert float(jnp.sum(q)) > 0.0


def test_frozen_phonons_do_not_change():
    E, dE, pm, plan = _setup(update_phonons=False)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(0, 1e-4, (12, 1, 4)))
    ph0 = rng.uniform(0, 0.1, (pm.num_omega, 1, 4))
    ph = jnp.asarray(ph0)
    step = jax.jit(make_collision_step(plan, 0.05))
    for _ in range(3):
        q, ph = step(q, ph)
    np.testing.assert_array_equal(np.asarray(ph), ph0)


def test_chunking_is_invisible():
    # same physics regardless of pixel chunk size / padding
    rng = np.random.default_rng(1)
    ny, nx = 3, 5
    results = []
    for chunk in (4, 8, 16):
        E, dE, pm, plan = _setup(ny=ny, nx=nx, chunk=chunk)
        q = jnp.asarray(rng.uniform(0, 1e-4, (12, ny, nx)) * 0 + 1e-4)
        ph = jnp.asarray(
            np.broadcast_to(
                thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
                (pm.num_omega, ny, nx),
            ).copy()
        )
        step = jax.jit(make_collision_step(plan, 0.05))
        q2, p2 = step(q, ph)
        results.append((np.asarray(q2), np.asarray(p2)))
    for q2, p2 in results[1:]:
        np.testing.assert_allclose(q2, results[0][0], atol=1e-15)
        np.testing.assert_allclose(p2, results[0][1], atol=1e-15)


def test_nonuniform_gap_uses_local_kernels():
    # two regions with different gaps must relax at visibly different rates
    ny, nx = 1, 2
    E, dE = build_energy_grid(180.0, 1.0, 4.0, 8)
    pm = build_phonon_frequency_map(E)
    gaps = np.array([120.0, 240.0])
    gap_id = np.array([[0, 1]], dtype=np.int32)
    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps]),
        K_r0_by_gap=np.stack([recombination_kernel_base(E, g, TAU, TC) for g in gaps]),
        K_s0_by_gap=None,
        gap_id=gap_id,
        pmap=pm,
        enable_recombination=True,
        enable_scattering=False,
        update_phonons=False,
        pixel_chunk=8,
    )
    q = jnp.asarray(np.full((8, ny, nx), 1e-3))
    ph = jnp.asarray(np.zeros((pm.num_omega, ny, nx)))
    step = jax.jit(make_collision_step(plan, 0.5))
    for _ in range(10):
        q, ph = step(q, ph)
    out = np.asarray(q).sum(axis=0)[0]
    assert out[0] != out[1]
    assert np.all(out > 0)


def test_pallas_loop_single_gap_matches_xla_interpret():
    # the fori_loop kernel serves NE > 64; exercise it directly (small NE,
    # interpret mode) against the XLA integrator
    from qpsim_tpu.ops.pallas_collisions_loop import build_pallas_collision_step_loop

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 9)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 440.0, 1.2)
    ny, nx = 2, 6
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    xla = make_collision_step(plan, 0.02)
    pal = build_pallas_collision_step_loop(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True)
    assert pal is not None
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    q1, p1 = xla(q0, ph0)
    q2, p2 = pal(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)


def test_pallas_analytic_gap_matches_xla_interpret():
    # continuous gap map (every pixel a distinct gap): the analytic kernel
    # evaluates exact per-pixel kernels from a Δ² row; parity vs the XLA
    # gather integrator built over the full unique-gap table stack
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step_analytic

    for gamma in (0.0, 0.12):
        E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
        pm = build_phonon_frequency_map(E)
        ny, nx = 3, 6
        rng = np.random.default_rng(7)
        gap_plane = rng.uniform(120.0, 200.0, (ny, nx))
        gaps = np.unique(gap_plane)  # G == Npix: all distinct
        gid = np.searchsorted(gaps, gap_plane).astype(np.int32)
        rho = np.stack([dynes_density_of_states(E, g, gamma) for g in gaps])
        Ks = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
        Kr = np.stack([recombination_kernel_base(E, g, 500.0, 1.2) for g in gaps])
        plan = build_collision_plan_arrays(
            dE=dE, rho_by_gap=rho, K_r0_by_gap=Kr, K_s0_by_gap=Ks, gap_id=gid,
            pmap=pm, enable_recombination=True, enable_scattering=True,
            update_phonons=True)
        xla = make_collision_step(plan, 0.01)
        pal = build_pallas_collision_step_analytic(
            E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.01,
            tau_s=440.0, tau_r=500.0, T_c=1.2, dynes_gamma=gamma,
            update_phonons=True, tile=128, interpret=True)
        assert pal is not None
        q0 = jnp.asarray(
            rng.uniform(0, 1e-4, (10, ny, nx)) * rho[gid].transpose(2, 0, 1)
        )
        ph0 = jnp.asarray(
            np.broadcast_to(
                thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
                (pm.num_omega, ny, nx),
            ).copy()
        )
        q1, p1 = xla(q0, ph0)
        q2, p2 = pal(q0, ph0)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-11, atol=1e-22)
        np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)


@pytest.mark.slow
def test_pallas_multi_gap_matches_xla_interpret():
    # piecewise-constant gap map (G=3): the unrolled kernel blends per-gap
    # tables with lane selects; parity vs the XLA integrator's gather path
    import jax.numpy as jnp

    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
    pm = build_phonon_frequency_map(E)
    gaps = [120.0, 150.0, 170.0]
    rho = np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps])
    Ks = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    Kr = np.stack([recombination_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    ny, nx = 3, 5
    rng = np.random.default_rng(1)
    gid = rng.integers(0, 3, (ny, nx)).astype(np.int32)
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho, K_r0_by_gap=Kr, K_s0_by_gap=Ks, gap_id=gid, pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    xla = make_collision_step(plan, 0.01)
    pal = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.01,
        update_phonons=True, tile=128, interpret=True, gap_id=gid)
    assert pal is not None
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (10, ny, nx)) * rho[gid].transpose(2, 0, 1))
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    q1, p1 = xla(q0, ph0)
    q2, p2 = pal(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22)
    # phonon occupations span ~1e-12..1e0; summation-order differences show
    # up at ~1e-10 relative on the smallest thermal values
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)

    # same configuration through the fori_loop kernel (the NE > 64 path)
    from qpsim_tpu.ops.pallas_collisions_loop import build_pallas_collision_step_loop

    pal_loop = build_pallas_collision_step_loop(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.01,
        update_phonons=True, tile=128, interpret=True, gap_id=gid)
    assert pal_loop is not None
    q3, p3 = pal_loop(q0, ph0)
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q1), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p1), rtol=1e-9, atol=1e-22)


def test_pallas_rows_matches_xla_interpret():
    """Static-offset row kernel (pallas_collisions_rows) ≡ the XLA integrator.

    This is the VERDICT-r1 item-7 kernel for the 65–192-bin range; parity is
    checked at a small NE in interpret mode, all channel combinations.
    """
    from qpsim_tpu.ops.pallas_collisions_rows import build_pallas_collision_step_rows

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 11)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 520.0, 1.2)
    ny, nx = 2, 6
    rng = np.random.default_rng(9)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (11, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    for use_s, use_r, phon in (
        (True, True, True), (True, False, True), (False, True, True),
        (True, True, False),
    ):
        plan = build_collision_plan_arrays(
            dE=dE, rho_by_gap=rho[None],
            K_r0_by_gap=Kr[None] if use_r else None,
            K_s0_by_gap=Ks[None] if use_s else None,
            gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
            enable_recombination=use_r, enable_scattering=use_s,
            update_phonons=phon)
        xla = make_collision_step(plan, 0.02)
        pal = build_pallas_collision_step_rows(
            E_bins=E, dE=dE, rho=rho,
            K_s0=Ks if use_s else None, K_r0=Kr if use_r else None,
            pmap=pm, dt=0.02, update_phonons=phon, tile=128, interpret=True)
        assert pal is not None
        q1, p1 = xla(q0, ph0)
        q2, p2 = pal(q0, ph0)
        ctx = f"s={use_s} r={use_r} ph={phon}"
        np.testing.assert_allclose(
            np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22, err_msg=ctx)


def test_split_omega_diagonal_binning_exact():
    """ω bins that split a Toeplitz diagonal keep the reference binning.

    The ω grid dedupes pair energies with the reference's round-at-1e-12,
    which fails to merge fp near-duplicates at magnitudes ≳ 1 — at NE=11
    (Δ=180, E_max/Δ=4) one diagonal straddles two ω bins.  The pair kernels
    must read the exact per-pair idx maps (not collapsed per-offset rows),
    and the fori_loop kernel — which structurally needs collapsed rows —
    must refuse and fall back.
    """
    from qpsim_tpu.ops.pallas_collisions import (
        _uniform_pair_rows,
        build_pallas_collision_step,
        build_pallas_collision_step_analytic,
    )
    from qpsim_tpu.ops.pallas_collisions_loop import build_pallas_collision_step_loop

    ne = 11
    E, dE = build_energy_grid(180.0, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    # this configuration genuinely splits (the regression's precondition)
    assert _uniform_pair_rows(np.asarray(E), pm) is None
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 520.0, 1.2)
    ny, nx = 2, 6
    rng = np.random.default_rng(5)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (ne, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    q1, p1 = make_collision_step(plan, 0.02)(q0, ph0)

    unrolled = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True)
    q2, p2 = unrolled(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)

    # analytic kernel at a uniform gap plane reduces to the same physics
    ana = build_pallas_collision_step_analytic(
        E_bins=E, dE=dE, gap_plane=np.full((ny, nx), 180.0), pmap=pm, dt=0.02,
        tau_s=440.0, tau_r=520.0, T_c=1.2, update_phonons=True,
        tile=128, interpret=True)
    q3, p3 = ana(q0, ph0)
    np.testing.assert_allclose(np.asarray(q3), np.asarray(q1), rtol=1e-7, atol=1e-20)
    np.testing.assert_allclose(np.asarray(p3), np.asarray(p1), rtol=1e-6, atol=1e-18)

    # the fori_loop kernel cannot represent split diagonals: must refuse
    assert build_pallas_collision_step_loop(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True) is None


@pytest.mark.slow
def test_dispatch_above_unroll_cap():
    """NE>64 with a split ω diagonal: the dispatcher must REFUSE (the
    fori_loop kernel cannot represent split diagonals and the rows kernel
    is not auto-dispatched — Mosaic stack limits make its compileability
    caller-dependent), so the engine falls back to the exact XLA
    integrator.  The explicitly-built rows kernel stays exact."""
    ne = 66  # splits at gap=180, E_max/gap=4 (see the consistency survey)
    E, dE = build_energy_grid(180.0, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 520.0, 1.2)
    ny, nx = 1, 4
    from qpsim_tpu.ops.pallas_collisions import (
        _uniform_pair_rows,
        build_pallas_collision_step,
    )
    from qpsim_tpu.ops.pallas_collisions_rows import build_pallas_collision_step_rows

    assert _uniform_pair_rows(np.asarray(E), pm) is None  # precondition
    assert build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True) is None

    pal = build_pallas_collision_step_rows(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True)
    assert pal is not None
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    rng = np.random.default_rng(13)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (ne, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    q1, p1 = make_collision_step(plan, 0.02)(q0, ph0)
    q2, p2 = pal(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)


@pytest.mark.slow
def test_pallas_blocked_matches_xla_interpret():
    """Block-gridded kernel (pallas_collisions_blocked) ≡ the XLA integrator.

    The NE > 64 production kernel: offset blocks on the sequential Pallas
    grid with persistent scratch accumulators.  Parity at small NE in
    interpret mode over all channel combinations and block sizes that do /
    don't divide the offset range.
    """
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked,
    )

    # NE=9: uniform grid whose ω binning is diagonal-constant (NE=11 splits
    # a pair diagonal at Δ=180 and the builder correctly declines — see
    # test_split_omega_diagonal_binning_exact)
    E, dE = build_energy_grid(180.0, 1.0, 4.0, 9)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 520.0, 1.2)
    ny, nx = 2, 6
    rng = np.random.default_rng(9)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    for use_s, use_r, phon, blk, hoist, gated in (
        (True, True, True, 8, True, False), (True, False, True, 8, True, False),
        (False, True, True, 8, True, False), (True, True, False, 8, True, False),
        (True, True, True, 4, True, False), (True, True, True, 16, True, False),
        # per-offset load path (the fallback if Mosaic ever rejects the
        # hoisted block windows on hardware) stays correct too
        (True, True, True, 8, False, False), (True, True, True, 16, False, False),
        # chunk-gated walk (row_gating): every channel combination + B=16
        (True, True, True, 8, True, True), (True, False, True, 8, True, True),
        (False, True, True, 8, True, True), (True, True, False, 8, True, True),
        (True, True, True, 16, True, True),
    ):
        plan = build_collision_plan_arrays(
            dE=dE, rho_by_gap=rho[None],
            K_r0_by_gap=Kr[None] if use_r else None,
            K_s0_by_gap=Ks[None] if use_s else None,
            gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
            enable_recombination=use_r, enable_scattering=use_s,
            update_phonons=phon)
        xla = make_collision_step(plan, 0.02)
        pal = build_pallas_collision_step_blocked(
            E_bins=E, dE=dE, rho=rho,
            K_s0=Ks if use_s else None, K_r0=Kr if use_r else None,
            pmap=pm, dt=0.02, update_phonons=phon, tile=128, block=blk,
            hoist_loads=hoist, row_gating=gated, interpret=True)
        assert pal is not None
        q1, p1 = xla(q0, ph0)
        q2, p2 = pal(q0, ph0)
        ctx = f"s={use_s} r={use_r} ph={phon} blk={blk} hoist={hoist} gated={gated}"
        np.testing.assert_allclose(
            np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22, err_msg=ctx)

    # the hoisted-window base tables and static remainders depend on
    # ne mod 8 (rr = ne%8 + 15 − i; dnw/revw alignment) — cover a multiple
    # of 8, a ≡2 and a ≡7 grid, not just ne=9 (≡1); the chunk-gated walk
    # shares those tables and its validity predicates depend on ne too
    for ne2 in (10, 15, 16):
        E2, dE2 = build_energy_grid(180.0, 1.0, 4.0, ne2)
        pm2 = build_phonon_frequency_map(E2)
        rho2 = dynes_density_of_states(E2, 180.0, 0.0)
        Ks2 = scattering_kernel_base(E2, 180.0, 440.0, 1.2)
        Kr2 = recombination_kernel_base(E2, 180.0, 520.0, 1.2)
        q0b = jnp.asarray(rng.uniform(0, 1e-4, (ne2, ny, nx)) * rho2[:, None, None])
        ph0b = jnp.asarray(
            np.broadcast_to(
                thermal_phonon_occupation(pm2.omega_bins, 0.25)[:, None, None],
                (pm2.num_omega, ny, nx),
            ).copy()
        )
        plan = build_collision_plan_arrays(
            dE=dE2, rho_by_gap=rho2[None], K_r0_by_gap=Kr2[None],
            K_s0_by_gap=Ks2[None], gap_id=np.zeros((ny, nx), np.int32),
            pmap=pm2, enable_recombination=True, enable_scattering=True,
            update_phonons=True)
        xla = make_collision_step(plan, 0.02)
        q1, p1 = xla(q0b, ph0b)
        for gated in (False, True):
            pal = build_pallas_collision_step_blocked(
                E_bins=E2, dE=dE2, rho=rho2, K_s0=Ks2, K_r0=Kr2, pmap=pm2,
                dt=0.02, update_phonons=True, tile=128, block=8,
                hoist_loads=True, row_gating=gated, interpret=True)
            assert pal is not None, f"ne={ne2}"
            q2, p2 = pal(q0b, ph0b)
            np.testing.assert_allclose(
                np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22,
                err_msg=f"ne={ne2} gated={gated}")
            np.testing.assert_allclose(
                np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22,
                err_msg=f"ne={ne2} gated={gated}")


def test_pallas_blocked_multi_gap_matches_xla_interpret():
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked,
    )

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
    pm = build_phonon_frequency_map(E)
    gaps = [120.0, 150.0, 170.0]
    rho = np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps])
    Ks = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    Kr = np.stack([recombination_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    ny, nx = 3, 5
    rng = np.random.default_rng(1)
    gid = rng.integers(0, 3, (ny, nx)).astype(np.int32)
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho, K_r0_by_gap=Kr, K_s0_by_gap=Ks, gap_id=gid, pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    xla = make_collision_step(plan, 0.01)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (10, ny, nx)) * rho[gid].transpose(2, 0, 1))
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    q1, p1 = xla(q0, ph0)
    for gated in (False, True):
        pal = build_pallas_collision_step_blocked(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.01,
            update_phonons=True, tile=128, interpret=True, gap_id=gid,
            row_gating=gated)
        assert pal is not None
        q2, p2 = pal(q0, ph0)
        np.testing.assert_allclose(
            np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22,
            err_msg=f"gated={gated}")
        np.testing.assert_allclose(
            np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22,
            err_msg=f"gated={gated}")


def test_pallas_blocked_asymmetric_ks_interpret():
    """The symmetric-K^s column-reuse fast path must not be load-bearing:
    a deliberately asymmetric scattering table exercises the 4-table
    fallback and still matches the XLA integrator."""
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked,
    )

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 9)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    rng = np.random.default_rng(3)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Ks = Ks * rng.uniform(0.5, 1.5, Ks.shape)  # breaks i<->j symmetry
    np.fill_diagonal(Ks, 0.0)
    Kr = recombination_kernel_base(E, 180.0, 520.0, 1.2)
    ny, nx = 2, 6
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    xla = make_collision_step(plan, 0.02)
    q1, p1 = xla(q0, ph0)
    for gated in (False, True):
        pal = build_pallas_collision_step_blocked(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
            update_phonons=True, tile=128, block=8, row_gating=gated,
            interpret=True)
        assert pal is not None
        q2, p2 = pal(q0, ph0)
        np.testing.assert_allclose(
            np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22,
            err_msg=f"gated={gated}")
        np.testing.assert_allclose(
            np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22,
            err_msg=f"gated={gated}")


def test_pallas_blocked_envelope_refusals():
    """The blocked builder refuses configs it cannot run correctly/safely:
    stacked multi-gap tables without a gap-id plane (silent gap-0 physics
    otherwise), and table footprints that cannot fit VMEM at any lane tile
    (the engine then falls through to the XLA integrator)."""
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked,
    )

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
    pm = build_phonon_frequency_map(E)
    gaps = [120.0, 150.0]
    rho = np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps])
    Ks = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    Kr = np.stack([recombination_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    assert (
        build_pallas_collision_step_blocked(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.01,
            gap_id=None)
        is None
    )

    # 8 gaps x 256 bins: per-gap tables alone exceed the VMEM budget
    E2, dE2 = build_energy_grid(180.0, 1.0, 4.0, 256)
    pm2 = build_phonon_frequency_map(E2)
    g8 = list(np.linspace(100.0, 170.0, 8))
    rho8 = np.stack([dynes_density_of_states(E2, g, 0.0) for g in g8])
    Ks8 = np.stack([scattering_kernel_base(E2, g, 440.0, 1.2) for g in g8])
    Kr8 = np.stack([recombination_kernel_base(E2, g, 440.0, 1.2) for g in g8])
    gid = np.zeros((4, 4), np.int32)
    assert (
        build_pallas_collision_step_blocked(
            E_bins=E2, dE=dE2, rho=rho8, K_s0=Ks8, K_r0=Kr8, pmap=pm2,
            dt=0.01, gap_id=gid)
        is None
    )
    # ... but the single-gap config at the same NE still builds, and a
    # non-128-multiple tile request floors instead of halving below 128
    assert (
        build_pallas_collision_step_blocked(
            E_bins=E2, dE=dE2, rho=rho8[0], K_s0=Ks8[0], K_r0=Kr8[0],
            pmap=pm2, dt=0.01)
        is not None
    )
    assert (
        build_pallas_collision_step_blocked(
            E_bins=E, dE=dE, rho=rho[0], K_s0=Ks[0], K_r0=Kr[0], pmap=pm,
            dt=0.01, tile=192)
        is not None
    )


@pytest.mark.slow
def test_pallas_blocked_analytic_matches_analytic_and_xla_interpret():
    """Blocked analytic-gap kernel (NE>64 continuous gap maps) ≡ the ≤64
    analytic kernel ≡ the XLA integrator with per-unique-gap tables."""
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step_analytic
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked_analytic,
    )

    tau_s, tau_r, tc = 440.0, 520.0, 1.2
    E, dE = build_energy_grid(180.0, 1.0, 4.0, 9)
    pm = build_phonon_frequency_map(E)
    ny, nx = 3, 4
    rng = np.random.default_rng(11)
    gap_vals = rng.uniform(120.0, 180.0, ny * nx)  # every pixel distinct
    gap_plane = gap_vals.reshape(ny, nx)
    for gamma in (0.0, 0.4):
        # XLA oracle: one gap table per pixel
        rho_g = np.stack([dynes_density_of_states(E, g, gamma) for g in gap_vals])
        Ks_g = np.stack([scattering_kernel_base(E, g, tau_s, tc) for g in gap_vals])
        Kr_g = np.stack([recombination_kernel_base(E, g, tau_r, tc) for g in gap_vals])
        gid = np.arange(ny * nx, dtype=np.int32).reshape(ny, nx)
        plan = build_collision_plan_arrays(
            dE=dE, rho_by_gap=rho_g, K_r0_by_gap=Kr_g, K_s0_by_gap=Ks_g,
            gap_id=gid, pmap=pm, enable_recombination=True,
            enable_scattering=True, update_phonons=True)
        xla = make_collision_step(plan, 0.015)
        ana = build_pallas_collision_step_analytic(
            E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.015,
            tau_s=tau_s, tau_r=tau_r, T_c=tc, dynes_gamma=gamma,
            update_phonons=True, interpret=True)
        blk = build_pallas_collision_step_blocked_analytic(
            E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.015,
            tau_s=tau_s, tau_r=tau_r, T_c=tc, dynes_gamma=gamma,
            update_phonons=True, tile=128, interpret=True)
        assert ana is not None and blk is not None
        rho_px = rho_g.T.reshape(9, ny, nx)
        q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho_px)
        ph0 = jnp.asarray(
            np.broadcast_to(
                thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
                (pm.num_omega, ny, nx),
            ).copy()
        )
        q1, p1 = xla(q0, ph0)
        q2, p2 = ana(q0, ph0)
        q3, p3 = blk(q0, ph0)
        ctx = f"gamma={gamma}"
        np.testing.assert_allclose(
            np.asarray(q3), np.asarray(q2), rtol=1e-11, atol=1e-24, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(p3), np.asarray(p2), rtol=1e-9, atol=1e-24, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(q3), np.asarray(q1), rtol=1e-9, atol=1e-22, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(p3), np.asarray(p1), rtol=1e-7, atol=1e-22, err_msg=ctx)
        # chunk-gated walk: per-pixel analytic coefficients evaluated only
        # on valid (8-row) chunks — must still match exactly
        blk_g = build_pallas_collision_step_blocked_analytic(
            E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.015,
            tau_s=tau_s, tau_r=tau_r, T_c=tc, dynes_gamma=gamma,
            update_phonons=True, tile=128, row_gating=True, interpret=True)
        q4, p4 = blk_g(q0, ph0)
        np.testing.assert_allclose(
            np.asarray(q4), np.asarray(q3), rtol=1e-13, atol=1e-26, err_msg=ctx)
        np.testing.assert_allclose(
            np.asarray(p4), np.asarray(p3), rtol=1e-13, atol=1e-26, err_msg=ctx)

    # arg-mode: the plane arrives at call time (sharded-caller contract)
    blk_arg = build_pallas_collision_step_blocked_analytic(
        E_bins=E, dE=dE, gap_plane=None, pmap=pm, dt=0.015,
        tau_s=tau_s, tau_r=tau_r, T_c=tc, dynes_gamma=0.0,
        update_phonons=True, tile=128, interpret=True)
    blk_baked = build_pallas_collision_step_blocked_analytic(
        E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.015,
        tau_s=tau_s, tau_r=tau_r, T_c=tc, dynes_gamma=0.0,
        update_phonons=True, tile=128, interpret=True)
    rho_g0 = np.stack([dynes_density_of_states(E, g, 0.0) for g in gap_vals])
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho_g0.T.reshape(9, ny, nx))
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    qa, pa = blk_arg(q0, ph0, jnp.asarray(gap_plane))
    qb, pb = blk_baked(q0, ph0)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=0, atol=0)


@pytest.mark.slow
def test_pallas_gen_input_fuses_forward_euler_bit_exact():
    # gen_input=True pre-adds dt·g on the VMEM tile; must be bit-identical
    # to adding in XLA first, and a zero plane must equal the plain step
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 10)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    kw = dict(
        E_bins=E, dE=dE, rho=rho,
        K_s0=scattering_kernel_base(E, 180.0, 440.0, 1.2),
        K_r0=recombination_kernel_base(E, 180.0, 440.0, 1.2),
        pmap=pm, dt=0.02, update_phonons=True, tile=128, interpret=True,
    )
    plain = build_pallas_collision_step(**kw)
    fused = build_pallas_collision_step(**kw, gen_input=True)
    assert getattr(fused, "takes_gen", False)
    assert not getattr(plain, "takes_gen", False)
    ny, nx = 4, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(0, 1e-4, (10, ny, nx)) * rho[:, None, None])
    ph = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    grow = jnp.asarray(rng.uniform(0, 1e-6, (ny, nx)))
    qa, pa = plain(q + grow[None], ph)
    qb, pb = fused(q, ph, grow)
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    qc, pc = fused(q, ph, jnp.zeros((ny, nx)))
    qd, pd = plain(q, ph)
    np.testing.assert_array_equal(np.asarray(qc), np.asarray(qd))
    np.testing.assert_array_equal(np.asarray(pc), np.asarray(pd))


def test_pallas_gen_input_multigap_bit_exact():
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 8)
    pm = build_phonon_frequency_map(E)
    gaps = np.array([180.0, 150.0])
    rho = np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps])
    Ks = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    Kr = np.stack([recombination_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    ny, nx = 2, 16
    gid = (np.arange(ny * nx).reshape(ny, nx) % 2).astype(np.int32)
    kw = dict(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True, gap_id=gid,
    )
    plain = build_pallas_collision_step(**kw)
    fused = build_pallas_collision_step(**kw, gen_input=True)
    assert getattr(fused, "takes_gen", False)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(0, 1e-4, (8, ny, nx)))
    ph = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    grow = jnp.asarray(rng.uniform(0, 1e-6, (ny, nx)))
    qa, pa = plain(q + grow[None], ph)
    qb, pb = fused(q, ph, grow)
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_pallas_analytic_gen_input_bit_exact():
    # fused generation on the analytic-gap kernel (continuous gap maps)
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step_analytic

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 8)
    pm = build_phonon_frequency_map(E)
    ny, nx = 2, 24
    gap_plane = 150.0 + 40.0 * np.random.default_rng(2).random((ny, nx))
    kw = dict(
        E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.02,
        tau_s=440.0, tau_r=440.0, T_c=1.2, dynes_gamma=0.0,
        update_phonons=True, tile=128, interpret=True,
    )
    plain = build_pallas_collision_step_analytic(**kw)
    fused = build_pallas_collision_step_analytic(**kw, gen_input=True)
    assert getattr(fused, "takes_gen", False)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(0, 1e-4, (8, ny, nx)))
    ph = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    grow = jnp.asarray(rng.uniform(0, 1e-6, (ny, nx)))
    qa, pa = plain(q + grow[None], ph)
    qb, pb = fused(q, ph, grow)
    np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_pallas_diag_walk_matches_xla_interpret():
    """Diagonal-major pair walk ≡ the XLA integrator (and the pair walk).

    The walk order changes only instruction order (register live ranges on
    hardware) and float accumulation order; physics must be identical.
    Covers the unrolled kernel (single- and multi-gap) and the analytic-gap
    kernel, interpret mode.
    """
    from qpsim_tpu.ops.pallas_collisions import (
        build_pallas_collision_step,
        build_pallas_collision_step_analytic,
    )

    E, dE = build_energy_grid(180.0, 1.0, 4.0, 9)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, 180.0, 0.0)
    Ks = scattering_kernel_base(E, 180.0, 440.0, 1.2)
    Kr = recombination_kernel_base(E, 180.0, 440.0, 1.2)
    ny, nx = 2, 6
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    xla = make_collision_step(plan, 0.02)
    rng = np.random.default_rng(7)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (9, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.25)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
    )
    q1, p1 = xla(q0, ph0)

    diag = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks, K_r0=Kr, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True, walk="diag")
    assert diag is not None
    q2, p2 = diag(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-9, atol=1e-22)

    # multi-gap blend path under the diag walk
    gaps = np.array([180.0, 150.0])
    rho_g = np.stack([dynes_density_of_states(E, g, 0.0) for g in gaps])
    Ks_g = np.stack([scattering_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    Kr_g = np.stack([recombination_kernel_base(E, g, 440.0, 1.2) for g in gaps])
    gid = (np.arange(ny * nx).reshape(ny, nx) % 2).astype(np.int32)
    plan_g = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho_g, K_r0_by_gap=Kr_g, K_s0_by_gap=Ks_g,
        gap_id=gid, pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True)
    q1g, p1g = make_collision_step(plan_g, 0.02)(q0, ph0)
    diag_g = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho_g, K_s0=Ks_g, K_r0=Kr_g, pmap=pm, dt=0.02,
        update_phonons=True, tile=128, interpret=True, gap_id=gid, walk="diag")
    assert diag_g is not None
    q2g, p2g = diag_g(q0, ph0)
    np.testing.assert_allclose(np.asarray(q2g), np.asarray(q1g), rtol=1e-12, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p2g), np.asarray(p1g), rtol=1e-9, atol=1e-22)

    # analytic-gap kernel under the diag walk (continuous gap map)
    gap_plane = np.full((ny, nx), 180.0)
    ana_pair = build_pallas_collision_step_analytic(
        E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.02,
        tau_s=440.0, tau_r=440.0, T_c=1.2, update_phonons=True,
        tile=128, interpret=True, walk="pair")
    ana_diag = build_pallas_collision_step_analytic(
        E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.02,
        tau_s=440.0, tau_r=440.0, T_c=1.2, update_phonons=True,
        tile=128, interpret=True, walk="diag")
    q3, p3 = ana_pair(q0, ph0)
    q4, p4 = ana_diag(q0, ph0)
    np.testing.assert_allclose(np.asarray(q4), np.asarray(q3), rtol=1e-10, atol=1e-22)
    np.testing.assert_allclose(np.asarray(p4), np.asarray(p3), rtol=1e-9, atol=1e-22)
