"""Multi-device sharding: sharded step ≡ single-chip step on a virtual mesh.

conftest forces an 8-device CPU platform (xla_force_host_platform_device_count)
so these tests exercise real ppermute/all_to_all/psum collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
from qpsim_tpu.parallel.ensemble import build_diffusion_sweep_step, sweep_diffusion_decay
from qpsim_tpu.parallel.mesh import make_mesh, state_sharding
from qpsim_tpu.parallel.sharded import build_sharded_step
from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

GAP, TAU, TC, TBATH = 180.0, 440.0, 1.2, 0.2


def _geometry(ny, nx):
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {}
    for e in edges:
        bcs[e.edge_id] = BoundaryCondition(
            kind="dirichlet" if e.normal in ("left", "right") else "reflective", value=0.0
        )
    return mask, edges, bcs


def test_sharded_diffusion_matches_single_chip():
    ny, nx = 32, 24
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([2.0, 5.0]))
    dt = 0.05

    mesh = make_mesh(n_space=len(jax.devices()))
    sharded = build_sharded_step(mesh, op, dt, dtype=jnp.float64)
    single = jax.jit(ADIDiffusion(op, dtype=jnp.float64).make_step(dt))

    rng = np.random.default_rng(0)
    q0 = rng.uniform(0, 1, (2, ny, nx))
    q_sh = jax.device_put(jnp.asarray(q0), sharded.q_sharding)
    ph_sh = jax.device_put(jnp.zeros((1, ny, nx)), sharded.ph_sharding)
    q_single = jnp.asarray(q0)
    for _ in range(5):
        q_sh, ph_sh, mass = sharded.step(q_sh, ph_sh)
        q_single = single(q_single)
    np.testing.assert_allclose(np.asarray(q_sh), np.asarray(q_single), atol=1e-12)
    assert abs(float(mass) - float(jnp.sum(q_single))) < 1e-10


def test_sharded_full_coupled_matches_single_chip():
    ny, nx = 16, 16
    ne = 6
    mask, edges, bcs = _geometry(ny, nx)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, GAP, 0.0)
    Kr = recombination_kernel_base(E, GAP, TAU, TC)
    Ks = scattering_kernel_base(E, GAP, TAU, TC)
    D_bins = 6.0 * np.sqrt(np.maximum(0.0, 1.0 - (GAP / E) ** 2))
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D_bins)
    dt = 0.05

    mesh = make_mesh(n_space=len(jax.devices()))
    sharded = build_sharded_step(
        mesh,
        op,
        dt,
        collisions=dict(
            dE=dE, rho=rho, K_r0=Kr, K_s0=Ks, pmap=pm,
            enable_recombination=True, enable_scattering=True, update_phonons=True,
        ),
        dtype=jnp.float64,
    )

    # single-chip composition: C(dt/2) → D(dt) → C(dt/2)
    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    col_half = make_collision_step(plan, 0.5 * dt)
    diff = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)

    @jax.jit
    def single(q, ph):
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return q, ph

    rng = np.random.default_rng(1)
    q0 = rng.uniform(0, 1e-4, (ne, ny, nx))
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, TBATH)[:, None, None],
        (pm.num_omega, ny, nx),
    ).copy()
    q_sh = jax.device_put(jnp.asarray(q0), sharded.q_sharding)
    ph_sh = jax.device_put(jnp.asarray(ph0), sharded.ph_sharding)
    q_s, ph_s = jnp.asarray(q0), jnp.asarray(ph0)
    for _ in range(3):
        q_sh, ph_sh, _ = sharded.step(q_sh, ph_sh)
        q_s, ph_s = single(q_s, ph_s)
    np.testing.assert_allclose(np.asarray(q_sh), np.asarray(q_s), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ph_sh), np.asarray(ph_s), atol=1e-13)


def test_vmapped_sweep_orders_by_diffusivity():
    traces = sweep_diffusion_decay(
        width=32, height=16, D_values=np.array([1.0, 4.0, 8.0]), steps=20, dt=0.05,
        dtype=jnp.float64,
    )
    assert traces.shape == (3, 21)
    finals = traces[:, -1]
    # faster diffusion spreads the peak faster
    assert finals[0] > finals[1] > finals[2] > 0


def test_sweep_member_matches_scalar_run():
    ny, nx = 16, 16
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    step = build_diffusion_sweep_step(mask, edges, bcs, 1.0, 0.05, dtype=jnp.float64)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 3.0)
    single = jax.jit(ADIDiffusion(op, dtype=jnp.float64).make_step(0.05))
    rng = np.random.default_rng(2)
    u0 = rng.uniform(0, 1, (1, ny, nx))
    batch = jnp.asarray(np.stack([u0, u0 * 2]))
    d = jnp.asarray([3.0, 3.0])
    out = step(batch, d)
    ref = single(jnp.asarray(u0))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out[1]), 2 * np.asarray(ref), atol=1e-12)


def test_film_ensemble_members_independent_and_match_solo():
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble
    from qpsim_tpu.ops.dos import dynes_density_of_states

    ny, nx, ne, b = 8, 10, 6, 3
    taus = np.array([200.0, 440.0, 800.0])
    ens = build_film_ensemble(
        n_members=b, member_shape=(ny, nx), num_energy_bins=ne,
        energy_max_factor=3.0, tau_s=taus, tau_r=taus, dt=0.1,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(0)
    base_q = rng.uniform(0, 1e-4, (ne, ny, nx))
    q_members = np.stack([base_q.copy() for _ in range(b)])
    ph_members = ens.thermal_phonons(np.full(b, 0.2))
    q, ph = ens.pack(q_members, ph_members)
    qj, pj = jnp.asarray(q), jnp.asarray(ph)
    import jax

    stepped = jax.jit(ens.step)
    for _ in range(4):
        qj, pj = stepped(qj, pj)
    qm, pm_ = ens.unpack(qj, pj)
    # same IC, different tau -> members evolve differently
    assert not np.allclose(qm[0], qm[1])
    assert not np.allclose(qm[1], qm[2])
    # each member equals a solo run with its own tau
    solo = build_film_ensemble(
        n_members=1, member_shape=(ny, nx), num_energy_bins=ne,
        energy_max_factor=3.0, tau_s=taus[1:2], tau_r=taus[1:2], dt=0.1,
        dtype=jnp.float64,
    )
    qs, ps = solo.pack(q_members[1:2], ph_members[1:2])
    qsj, psj = jnp.asarray(qs), jnp.asarray(ps)
    solo_step = jax.jit(solo.step)
    for _ in range(4):
        qsj, psj = solo_step(qsj, psj)
    qsm, _ = solo.unpack(qsj, psj)
    np.testing.assert_allclose(qm[1], qsm[0], atol=1e-15)
    # separator rows stay empty
    assert float(np.abs(np.asarray(qj)[:, ny, :]).max()) == 0.0


def test_film_ensemble_per_member_gaps():
    # film-to-film gap variation: members with different gaps evolve
    # differently, and each matches a solo run at its own gap — via the
    # analytic-gap kernel (uniform taus) AND the per-member-stack XLA path
    # (taus varying too)
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ny, nx, ne, b = 6, 8, 5, 3
    gaps = np.array([150.0, 180.0, 210.0])
    rng = np.random.default_rng(2)
    base_q = rng.uniform(0, 1e-4, (ne, ny, nx))
    for taus in (440.0, np.array([300.0, 440.0, 600.0])):
        ens = build_film_ensemble(
            n_members=b, member_shape=(ny, nx), num_energy_bins=ne,
            energy_max_factor=3.0, gap=gaps, tau_s=taus, tau_r=taus, dt=0.1,
            dtype=jnp.float64,
        )
        q_members = np.stack([base_q.copy() for _ in range(b)])
        ph_members = ens.thermal_phonons(np.full(b, 0.2))
        q, ph = ens.pack(q_members, ph_members)
        qj, pj = jnp.asarray(q), jnp.asarray(ph)
        stepped = jax.jit(ens.step)
        for _ in range(3):
            qj, pj = stepped(qj, pj)
        qm, _ = ens.unpack(qj, pj)
        assert not np.allclose(qm[0], qm[1])
        assert not np.allclose(qm[1], qm[2])
        # member 0 equals a solo ensemble at its own (gap, tau); note the
        # solo energy grid must match: pass the same nominal max gap
        solo = build_film_ensemble(
            n_members=2, member_shape=(ny, nx), num_energy_bins=ne,
            energy_max_factor=3.0, gap=np.array([gaps[0], gaps.max()]),
            tau_s=np.broadcast_to(np.asarray(taus), (b,))[np.array([0, 2])],
            tau_r=np.broadcast_to(np.asarray(taus), (b,))[np.array([0, 2])],
            dt=0.1, dtype=jnp.float64,
        )
        qs, ps = solo.pack(q_members[:2], ph_members[:2])
        qsj, psj = jnp.asarray(qs), jnp.asarray(ps)
        solo_step = jax.jit(solo.step)
        for _ in range(3):
            qsj, psj = solo_step(qsj, psj)
        qsm, _ = solo.unpack(qsj, psj)
        np.testing.assert_allclose(qm[0], qsm[0], atol=1e-13)


def test_sharded_nonuniform_gap_matches_single_chip():
    # non-uniform gap map: per-shard gap-id slices feed the XLA gather
    # integrator at call time (the CPU-mesh dry-run path), and variable-D
    # diffusion planes shard like the state
    ny, nx = 16, 16
    ne = 5
    mask, edges, bcs = _geometry(ny, nx)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    pm = build_phonon_frequency_map(E)
    # piecewise gap: top half suppressed
    gap_plane = np.full((ny, nx), GAP)
    gap_plane[: ny // 2] = 150.0
    unique_gaps = np.unique(gap_plane)
    gid = np.searchsorted(unique_gaps, gap_plane).astype(np.int32)
    # variable-D per-bin planes (harmonic-mean interfaces inside fold)
    D_dense = np.stack(
        [
            np.where(
                gap_plane < E[i],
                6.0 * np.sqrt(np.maximum(0.0, 1.0 - (gap_plane / E[i]) ** 2)),
                0.0,
            )
            for i in range(ne)
        ]
    )
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D_dense)
    dt = 0.05

    mesh = make_mesh(n_space=len(jax.devices()))
    sharded = build_sharded_step(
        mesh,
        op,
        dt,
        collisions=dict(
            dE=dE, rho=dynes_density_of_states(E, GAP, 0.0), pmap=pm, E_bins=E,
            gap_plane=gap_plane, tau_s=TAU, tau_r=TAU, T_c=TC,
            enable_recombination=True, enable_scattering=True, update_phonons=True,
        ),
        dtype=jnp.float64,
    )

    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=np.stack([dynes_density_of_states(E, g, 0.0) for g in unique_gaps]),
        K_r0_by_gap=np.stack([recombination_kernel_base(E, g, TAU, TC) for g in unique_gaps]),
        K_s0_by_gap=np.stack([scattering_kernel_base(E, g, TAU, TC) for g in unique_gaps]),
        gap_id=gid, pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    col_half = make_collision_step(plan, 0.5 * dt)
    diff = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)

    @jax.jit
    def single(q, ph):
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return q, ph

    rng = np.random.default_rng(4)
    q0 = rng.uniform(0, 1e-4, (ne, ny, nx))
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, TBATH)[:, None, None],
        (pm.num_omega, ny, nx),
    ).copy()
    q_sh = jax.device_put(jnp.asarray(q0), sharded.q_sharding)
    ph_sh = jax.device_put(jnp.asarray(ph0), sharded.ph_sharding)
    q_s, ph_s = jnp.asarray(q0), jnp.asarray(ph0)
    for _ in range(3):
        q_sh, ph_sh, _ = sharded.step(q_sh, ph_sh)
        q_s, ph_s = single(q_s, ph_s)
    np.testing.assert_allclose(np.asarray(q_sh), np.asarray(q_s), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ph_sh), np.asarray(ph_s), atol=1e-13)
    # the suppressed-gap half must actually behave differently
    final = np.asarray(q_sh).sum(axis=0)
    assert not np.allclose(final[: ny // 2].sum(), final[ny // 2 :].sum())


def test_chunk_helpers_match_stepwise():
    # make_chunk (sharded + ensemble) equals calling step() n times
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ny, nx = 16, 16
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 6.0)
    mesh = make_mesh(n_space=len(jax.devices()))
    sharded = build_sharded_step(mesh, op, 0.05, dtype=jnp.float64)
    q = jax.device_put(jnp.ones((1, ny, nx)), sharded.q_sharding)
    ph = jax.device_put(jnp.zeros((1, ny, nx)), sharded.ph_sharding)
    q_it, ph_it = q, ph
    for _ in range(5):
        q_it, ph_it, mass_it = sharded.step(q_it, ph_it)
    q_ch, ph_ch, mass_ch = sharded.make_chunk(5, unroll=2)(q, ph)
    np.testing.assert_allclose(np.asarray(q_ch), np.asarray(q_it), atol=1e-14)
    assert abs(float(mass_ch) - float(mass_it)) < 1e-10

    ens = build_film_ensemble(n_members=2, member_shape=(6, 8), num_energy_bins=4,
                              energy_max_factor=3.0, dt=0.1, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    qm, pm_ = ens.pack(rng.uniform(0, 1e-4, (2, 4, 6, 8)),
                       ens.thermal_phonons(np.full(2, 0.2)))
    qe, pe = jnp.asarray(qm), jnp.asarray(pm_)
    q_it2, p_it2 = qe, pe
    stepped = jax.jit(ens.step)
    for _ in range(4):
        q_it2, p_it2 = stepped(q_it2, p_it2)
    q_ch2, p_ch2 = ens.make_chunk(4, unroll=2)(qe, pe)
    np.testing.assert_allclose(np.asarray(q_ch2), np.asarray(q_it2), atol=1e-14)
    np.testing.assert_allclose(np.asarray(p_ch2), np.asarray(p_it2), atol=1e-14)


def test_analytic_step_gap_plane_arg_matches_baked():
    # the call-time gap-plane variant (used by sharded TPU runs) is the
    # same computation as the baked-plane variant
    from qpsim_tpu.ops.dos import thermal_phonon_occupation as tpo
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step_analytic

    E, dE = build_energy_grid(GAP, 1.0, 3.0, 6)
    pm = build_phonon_frequency_map(E)
    ny, nx = 2, 8
    rng = np.random.default_rng(9)
    gp = rng.uniform(130.0, 200.0, (ny, nx))
    kw = dict(E_bins=E, dE=dE, pmap=pm, dt=0.02, tau_s=TAU, tau_r=TAU,
              T_c=TC, update_phonons=True, tile=128, interpret=True)
    baked = build_pallas_collision_step_analytic(gap_plane=gp, **kw)
    argmode = build_pallas_collision_step_analytic(gap_plane=None, **kw)
    rho = dynes_density_of_states(E, GAP, 0.0)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (6, ny, nx)) * rho[:, None, None])
    ph0 = jnp.asarray(
        np.broadcast_to(tpo(pm.omega_bins, 0.2)[:, None, None], (pm.num_omega, ny, nx)).copy()
    )
    q1, p1 = baked(q0, ph0)
    q2, p2 = argmode(q0, ph0, jnp.asarray(gp))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), rtol=1e-14, atol=0)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), rtol=1e-14, atol=0)
    # both-channels-off no-op keeps the arg-mode arity
    noop = build_pallas_collision_step_analytic(
        **{**kw, "tau_s": None, "tau_r": None}, gap_plane=None)
    q3, p3 = noop(q0, ph0, jnp.asarray(gp))
    assert q3 is q0 and p3 is ph0


def test_sharded_lazy_bin_scale_matches_single_chip(monkeypatch):
    # force the lazy-scale path (normally only taken on very large grids)
    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

    monkeypatch.setattr(ADIDiffusion, "MATERIALIZE_MAX_ELEMENTS", 0)
    ny, nx = 16, 16
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([2.0, 5.0, 7.0]))
    assert op.bin_scale is not None
    mesh = make_mesh(n_space=len(jax.devices()))
    sharded = build_sharded_step(mesh, op, 0.05, dtype=jnp.float64)
    single = jax.jit(ADIDiffusion(op, dtype=jnp.float64).make_step(0.05))
    rng = np.random.default_rng(7)
    q0 = rng.uniform(0, 1, (3, ny, nx))
    q_sh = jax.device_put(jnp.asarray(q0), sharded.q_sharding)
    ph_sh = jax.device_put(jnp.zeros((1, ny, nx)), sharded.ph_sharding)
    q_single = jnp.asarray(q0)
    for _ in range(4):
        q_sh, ph_sh, _ = sharded.step(q_sh, ph_sh)
        q_single = single(q_single)
    np.testing.assert_allclose(np.asarray(q_sh), np.asarray(q_single), atol=1e-12)


def test_multihost_mesh_single_process_layout():
    # single-process: make_multihost_mesh spans all local devices with the
    # ensemble axis defaulting to process_count (=1 here)
    from qpsim_tpu.parallel.mesh import make_multihost_mesh, initialize_distributed

    initialize_distributed()  # no-op in single-process runs
    mesh = make_multihost_mesh()
    assert mesh.shape["ensemble"] * mesh.shape["space"] == len(jax.devices())
    assert mesh.shape["ensemble"] == 1
    mesh2 = make_multihost_mesh(n_space=2)
    assert mesh2.shape["space"] == 2
    # a sharded step built over it runs
    ny, nx = 8, 8
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 6.0)
    sharded = build_sharded_step(mesh2, op, 0.05, dtype=jnp.float64)
    q = jax.device_put(jnp.ones((1, ny, nx)), sharded.q_sharding)
    ph = jax.device_put(jnp.zeros((1, ny, nx)), sharded.ph_sharding)
    q, ph, mass = sharded.step(q, ph)
    assert np.isfinite(float(mass))


def test_sharded_pallas_tridiag_matches_xla_backend():
    """The in-VMEM Pallas local solve (interpret mode on the CPU mesh)
    reproduces the XLA scan-Thomas sharded step."""
    ny, nx = 32, 24
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([2.0, 5.0]))
    dt = 0.05

    mesh = make_mesh(n_space=len(jax.devices()))
    ref = build_sharded_step(mesh, op, dt, dtype=jnp.float64, tridiag_backend="xla")
    pal = build_sharded_step(mesh, op, dt, dtype=jnp.float64, tridiag_backend="pallas")

    rng = np.random.default_rng(3)
    q0 = rng.uniform(0, 1, (2, ny, nx))
    qa = jax.device_put(jnp.asarray(q0), ref.q_sharding)
    qb = jax.device_put(jnp.asarray(q0), pal.q_sharding)
    ph = jax.device_put(jnp.zeros((1, ny, nx)), ref.ph_sharding)
    pha, phb = ph, ph
    for _ in range(3):
        qa, pha, _ = ref.step(qa, pha)
        qb, phb, _ = pal.step(qb, phb)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(qa), atol=1e-12)


def test_sharded_ensemble_chunk_matches_single_chip_L6():
    """L=6 chunked sharded run (space × ensemble mesh) ≡ single-chip loop.

    VERDICT r1 item 4: the driver-facing multi-step path — ``make_chunk``
    over a 2×4 (ensemble × space) mesh with the full coupled physics — must
    reproduce the per-member single-chip composition, not just one dispatch.
    """
    n_dev = len(jax.devices())
    if n_dev < 4 or n_dev % 2:
        pytest.skip("needs an even mesh of >= 4 devices")
    n_ens, n_space = 2, n_dev // 2
    ny, nx = 8 * n_space, 16
    ne = 4
    n_members = 2 * n_ens  # two members per ensemble shard
    mask, edges, bcs = _geometry(ny, nx)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, GAP, 0.0)
    Kr = recombination_kernel_base(E, GAP, TAU, TC)
    Ks = scattering_kernel_base(E, GAP, TAU, TC)
    D_bins = 6.0 * np.sqrt(np.maximum(0.0, 1.0 - (GAP / E) ** 2))
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D_bins)
    dt = 0.05
    L = 6

    mesh = make_mesh(n_space=n_space, n_ensemble=n_ens)
    sharded = build_sharded_step(
        mesh, op, dt,
        collisions=dict(
            dE=dE, rho=rho, K_r0=Kr, K_s0=Ks, pmap=pm,
            enable_recombination=True, enable_scattering=True, update_phonons=True,
        ),
        dtype=jnp.float64,
        ensemble=True,
    )

    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny, nx), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    col_half = make_collision_step(plan, 0.5 * dt)
    diff = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)

    @jax.jit
    def single(q, ph):
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return q, ph

    rng = np.random.default_rng(11)
    q0 = rng.uniform(0, 1e-4, (n_members, ne, ny, nx))  # distinct per member
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, TBATH)[None, :, None, None],
        (n_members, pm.num_omega, ny, nx),
    ).copy()
    q_sh = jax.device_put(jnp.asarray(q0), sharded.q_sharding)
    ph_sh = jax.device_put(jnp.asarray(ph0), sharded.ph_sharding)
    q_sh, ph_sh, mass = sharded.make_chunk(L, unroll=2)(q_sh, ph_sh)

    for m in range(n_members):
        q_s, ph_s = jnp.asarray(q0[m]), jnp.asarray(ph0[m])
        for _ in range(L):
            q_s, ph_s = single(q_s, ph_s)
        np.testing.assert_allclose(np.asarray(q_sh)[m], np.asarray(q_s), atol=1e-13)
        np.testing.assert_allclose(np.asarray(ph_sh)[m], np.asarray(ph_s), atol=1e-13)
        assert abs(float(np.asarray(mass)[m]) - float(jnp.sum(q_s))) < 1e-10
    # members with different ICs must evolve differently
    assert not np.allclose(np.asarray(q_sh)[0], np.asarray(q_sh)[1])


def test_engine_mesh_matches_single_chip():
    """run_2d_crank_nicolson(mesh=...) ≡ the single-chip engine run.

    VERDICT r1 item 10: multi-chip is not a separate API — the engine's own
    entry point routes its hot loop through the sharded step while keeping
    snapshot/Pauli/store_every semantics.  The Wang-partitioned distributed
    tridiagonal solve reorders floating-point work vs the sequential
    single-chip sweep, so equality is to f64 roundoff (1e-12), not bitwise.
    """
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.325,  # + remainder seg
        dx=1.0, store_every=2,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
    )
    t_ref, f_ref, m_ref, c_ref, ef_ref, eb_ref = run_2d_crank_nicolson(
        # exact tier on BOTH sides: auto resolves to merged seams here
        # (single-chip since r3, mesh= too now), which is a genuine O(dt²)
        # reordering — this test pins the reference composition instead
        **kw, diffusion_backend="adi", collision_backend="xla", strang_mode="exact"
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    t_m, f_m, m_m, c_m, ef_m, eb_m = run_2d_crank_nicolson(
        **kw, mesh=mesh, strang_mode="exact"
    )
    assert t_m == t_ref
    for a, b in zip(f_m, f_ref):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)
    np.testing.assert_allclose(m_m, m_ref, rtol=1e-12)
    for ea, eb_ in zip(ef_m, ef_ref):
        for a, b in zip(ea, eb_):
            np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)


def test_engine_mesh_rejects_unsupported_modes():
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    mesh = make_mesh(n_space=len(jax.devices()))
    base = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.1, dx=1.0, mesh=mesh,
    )
    with pytest.raises(ValueError, match="energy-resolved"):
        run_2d_crank_nicolson(**base)  # scalar mode
    with pytest.raises(ValueError, match="enable_diffusion"):
        run_2d_crank_nicolson(**base, energy_gap=GAP, num_energy_bins=4,
                              energy_max_factor=3.0, enable_diffusion=False)


def test_engine_mesh_merged_matches_single_chip_merged():
    """mesh= + strang_mode='merged' ≡ the single-chip merged engine.

    Multi-step stored segments (store_every=4) so the seam fusion actually
    engages, a remainder segment, and pulsed generation injected at the
    merged seams.  The sharded pieces (apply_col_half/full, apply_diffuse)
    must compose to the same states as the single-chip merged runner up to
    the Wang-partition f64 reordering (1e-12), and must genuinely differ
    from the exact composition (the fusion is a real O(dt²) reordering).
    """
    from qpsim_tpu.models.params import ExternalGenerationSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    gen = ExternalGenerationSpec(mode="pulse", pulse_start=0.05,
                                 pulse_duration=0.2, pulse_rate=2e-4)
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.425,  # + remainder
        dx=1.0, store_every=4,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
        external_generation=gen,
    )
    t_ref, f_ref, m_ref, c_ref, ef_ref, _ = run_2d_crank_nicolson(
        **kw, diffusion_backend="adi", collision_backend="xla",
        strang_mode="merged",
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    t_m, f_m, m_m, c_m, ef_m, _ = run_2d_crank_nicolson(
        **kw, mesh=mesh, strang_mode="merged"
    )
    assert t_m == t_ref
    for a, b in zip(f_m, f_ref):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)
    np.testing.assert_allclose(m_m, m_ref, rtol=1e-11)
    for ea, eb_ in zip(ef_m, ef_ref):
        for a, b in zip(ea, eb_):
            np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)

    # 'auto' on the mesh resolves to the same merged composition
    t_a, f_a, m_a, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)
    np.testing.assert_allclose(m_a, m_m, rtol=1e-13)

    # and merged is a genuine reordering vs exact (differs beyond roundoff)
    _, _, m_e, *_ = run_2d_crank_nicolson(**kw, mesh=mesh, strang_mode="exact")
    assert max(abs(a - b) for a, b in zip(m_e, m_m)) > 1e-10


def test_engine_mesh_merged_gap_map_matches_single_chip():
    """Merged over the mesh with a non-uniform gap map (gap-id pieces)."""
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.4, dx=1.0,
        store_every=4,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
        gap_expression="return 160.0 + 30.0 * (x > 8)",
    )
    t_ref, f_ref, m_ref, *_ = run_2d_crank_nicolson(
        **kw, diffusion_backend="adi", collision_backend="xla",
        strang_mode="merged",
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    t_m, f_m, m_m, *_ = run_2d_crank_nicolson(**kw, mesh=mesh, strang_mode="merged")
    assert t_m == t_ref
    for a, b in zip(f_m, f_ref):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)
    np.testing.assert_allclose(m_m, m_ref, rtol=1e-11)


def test_engine_mesh_gap_map_and_generation_match_single_chip():
    """mesh= with a non-uniform gap map and pulsed generation ≡ single-chip."""
    from qpsim_tpu.models.params import ExternalGenerationSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    gen = ExternalGenerationSpec(mode="pulse", pulse_start=0.05, pulse_duration=0.1,
                                 pulse_rate=2e-4)
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.25, dx=1.0,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
        gap_expression="return 160.0 + 30.0 * (x > 8)",
        external_generation=gen,
    )
    t_ref, f_ref, m_ref, *_ = run_2d_crank_nicolson(
        **kw, diffusion_backend="adi", collision_backend="xla"
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    t_m, f_m, m_m, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)
    assert t_m == t_ref
    for a, b in zip(f_m, f_ref):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)
    np.testing.assert_allclose(m_m, m_ref, rtol=1e-11)


@pytest.mark.slow
def test_film_ensemble_pulse_energy_sweep():
    """Per-member pulse injection: the docstring's '32 pulse energies' use
    case.  Injected totals scale with the per-member rate, the window
    gates in time, separator rows stay empty."""
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=3, member_shape=(8, 12), num_energy_bins=5, dt=0.05,
        dtype=jnp.float64,
    )
    rates = np.array([1e-6, 2e-6, 4e-6])
    plane = ens.generation_plane(rates)
    # plane: member rows hold the member rate, separators zero
    assert plane[ens._member_rows(1), :].max() == rates[1]
    stride = ens.member_shape[0]
    assert plane[stride, :].max() == 0.0  # first separator row

    q0 = np.zeros((3, 5, 8, 12))
    ph0 = ens.thermal_phonons(np.full(3, 0.2))
    q, ph = ens.pack(q0, ph0)
    q, ph = jnp.asarray(q), jnp.asarray(ph)

    chunk = ens.make_chunk(8, gen_plane=plane, pulse_window=(0.0, 0.2))
    q1, ph1 = chunk(q, ph, 0.0)        # 4 steps inside the window
    q2, ph2 = chunk(q1, ph1, 8 * 0.05)  # window over: no further injection

    qm1, _ = ens.unpack(q1, ph1)
    m1 = qm1.sum(axis=(1, 2, 3)) * ens.dE
    # injection scales with rate (collisions cause only tiny deviations)
    np.testing.assert_allclose(m1 / m1[0], rates / rates[0], rtol=1e-3)
    # outside the window the gen chunk IS the plain chunk, bit for bit
    # (thermal-bath equilibration still evolves the state, so compare to
    # the no-generation composition rather than asserting monotonicity)
    plain = ens.make_chunk(8)
    q2p, ph2p = plain(q1, ph1)
    np.testing.assert_array_equal(np.asarray(q2), np.asarray(q2p))
    np.testing.assert_array_equal(np.asarray(ph2), np.asarray(ph2p))
    # separator rows stay exactly empty
    sep = np.asarray(q2)[:, ens.member_shape[0], :]
    assert np.all(sep == 0.0)


def test_film_ensemble_per_member_arrival_times():
    """(B,) pulse start times: each member's source fires in its own window."""
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=2, member_shape=(6, 10), num_energy_bins=5, dt=0.05,
        dtype=jnp.float64,
    )
    plane = ens.generation_plane(np.array([1e-6, 1e-6]))
    q0 = np.zeros((2, 5, 6, 10))
    ph0 = ens.thermal_phonons(np.full(2, 0.0))
    q, ph = ens.pack(q0, ph0)
    q, ph = jnp.asarray(q), jnp.asarray(ph)

    # member 0 fires in [0, 0.1), member 1 in [0.2, 0.3)
    chunk = ens.make_chunk(
        4, gen_plane=plane, pulse_window=(np.array([0.0, 0.2]), 0.1)
    )
    q1, ph1 = chunk(q, ph, 0.0)  # covers [0, 0.2): only member 0 fires
    qm, _ = ens.unpack(q1, ph1)
    m = qm.sum(axis=(1, 2, 3))
    assert m[0] > 0 and m[1] == 0.0

    q2, ph2 = chunk(q1, ph1, 0.2)  # covers [0.2, 0.4): only member 1 fires
    qm2, _ = ens.unpack(q2, ph2)
    m2 = qm2.sum(axis=(1, 2, 3))
    assert m2[1] > 0
    # both members got the same 2-step injection at the same rate
    np.testing.assert_allclose(m2[1], m[0], rtol=1e-12)


def test_film_ensemble_photon_occupancy_sweep():
    """Per-member photon occupancy/coupling (the Fischer-2024 Q-vs-n̄
    calibration as ONE compiled ensemble step): each member of the packed
    chunk matches a solo ensemble whose drive pins that member's n̄/c."""
    import jax.numpy as jnp

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    occ = np.array([0.5, 1.0, 2.0])
    coup = np.array([1e-4, 2e-4, 1e-4])
    ens = build_film_ensemble(
        n_members=3, member_shape=(6, 10), num_energy_bins=6, dt=0.05,
        dtype=jnp.float64,
    )
    spec = PhotonDriveSpec(
        mode="photon", photon_energy=2.5 * 180.0, occupancy=9.9, coupling=9.9
    )
    chunk = ens.make_chunk(4, photon=spec, photon_occupancy=occ, photon_coupling=coup)
    q0 = np.zeros((3, 6, 6, 10))
    ph0 = ens.thermal_phonons(np.full(3, 0.2))
    q, ph = ens.pack(q0, ph0)
    q1, ph1 = chunk(jnp.asarray(q), jnp.asarray(ph))
    qm, pm_ = ens.unpack(q1, ph1)
    assert qm.sum() > 0
    solo = build_film_ensemble(
        n_members=1, member_shape=(6, 10), num_energy_bins=6, dt=0.05,
        dtype=jnp.float64,
    )
    for k in range(3):
        spec_k = PhotonDriveSpec(
            mode="photon", photon_energy=2.5 * 180.0,
            occupancy=float(occ[k]), coupling=float(coup[k]),
        )
        chunk_k = solo.make_chunk(4, photon=spec_k)
        qk, phk = solo.pack(q0[k : k + 1], ph0[k : k + 1])
        q1k, ph1k = chunk_k(jnp.asarray(qk), jnp.asarray(phk))
        np.testing.assert_allclose(
            qm[k], np.asarray(q1k), rtol=1e-12, atol=1e-28
        )
        np.testing.assert_allclose(
            pm_[k], np.asarray(ph1k), rtol=1e-12, atol=1e-28
        )


def test_film_ensemble_photon_per_member_gaps_wiring():
    """Per-member gaps route the drive through the Δ²-affine per-pixel
    substep; the chunk equals the hand-assembled photon→step composition
    and different gaps produce genuinely different member responses."""
    import jax.numpy as jnp

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.ops.dos import dynes_density_of_states
    from qpsim_tpu.ops.photon_drive import (
        build_photon_drive_plan_analytic,
        make_photon_substep_per_pixel,
    )
    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    gaps = np.array([160.0, 190.0])
    ens = build_film_ensemble(
        n_members=2, member_shape=(4, 8), num_energy_bins=6, dt=0.05,
        gap=gaps, dtype=jnp.float64,
    )
    # s = 2: off-diagonal pairs — the diagonal rate K⁻(E,E)·ρ(E)² ≡ 1 is
    # gap-INdependent, so an s=0 drive cannot distinguish the members
    omega = float(2.0 * ens.E_bins[0] + 2.0 * ens.dE)
    spec = PhotonDriveSpec(
        mode="photon", photon_energy=omega, occupancy=1.5, coupling=1e-4,
        include_scattering=False,
    )
    chunk = ens.make_chunk(3, photon=spec)
    q0 = np.zeros((2, 6, 4, 8))
    ph0 = ens.thermal_phonons(np.zeros(2))  # T=0 bath: drive is only source
    q, ph = ens.pack(q0, ph0)
    q1, ph1 = chunk(jnp.asarray(q), jnp.asarray(ph))

    # hand-assembled oracle: per-pixel substep (plans already unit-tested)
    # then the ensemble Strang step, same order as the engine
    plan = build_photon_drive_plan_analytic(
        E_bins=ens.E_bins, dE=ens.dE, omega=omega, coupling=1.0,
        occupancy=1.5, include_scattering=False,
    )
    assert plan.s_index >= 0
    psub = make_photon_substep_per_pixel(plan, 0.05, jnp.float64)
    weight = jnp.asarray(ens.generation_plane(np.full(2, 1e-4)))
    delta2 = jnp.asarray(ens.generation_plane(gaps**2))
    rho_pp = np.zeros((6, *ens.super_shape))
    for m, g in enumerate(gaps):
        rho_pp[:, ens._member_rows(m), :] = dynes_density_of_states(
            ens.E_bins, float(g), 0.0
        )[:, None, None]
    qo, po = jnp.asarray(q), jnp.asarray(ph)
    for _ in range(3):
        qo = psub(qo, jnp.asarray(1.0), weight, delta2, jnp.asarray(rho_pp))
        qo, po = ens.step(qo, po)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(qo), rtol=1e-12, atol=1e-30)
    qm, _ = ens.unpack(q1, ph1)
    m_tot = qm.sum(axis=(1, 2, 3))
    assert m_tot[0] > 0 and m_tot[1] > 0
    # smaller gap -> larger K⁻ coherence factor -> different response
    assert not np.isclose(m_tot[0], m_tot[1], rtol=1e-3)


def test_film_ensemble_photon_window_and_validation():
    import jax.numpy as jnp

    from qpsim_tpu.models.params import PhotonDriveSpec
    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=2, member_shape=(4, 8), num_energy_bins=5, dt=0.05,
        dtype=jnp.float64,
    )
    with pytest.raises(ValueError, match="photon_occupancy"):
        ens.make_chunk(2, photon_occupancy=np.array([1.0, 2.0]))
    spec = PhotonDriveSpec(
        mode="photon", photon_energy=2.5 * 180.0, occupancy=1.0,
        coupling=1e-4, window_start=0.2, window_duration=0.1,
    )
    gated = ens.make_chunk(2, photon=spec)
    q0 = np.zeros((2, 5, 4, 8))
    ph0 = ens.thermal_phonons(np.zeros(2))
    q, ph = ens.pack(q0, ph0)
    q, ph = jnp.asarray(q), jnp.asarray(ph)
    with pytest.raises(TypeError, match="absolute start"):
        gated(q, ph)
    qa, pa = gated(q, ph, 0.0)   # [0, 0.1): before the window
    assert float(jnp.sum(qa)) == 0.0
    qb, pb = gated(qa, pa, 0.2)  # [0.2, 0.3): inside the window
    assert float(jnp.sum(qb)) > 0.0


def test_sharded_gen_chunk_matches_plain_plus_add():
    """gen_input=True: make_chunk takes a grow plane; result equals the
    plain sharded chunk applied to a pre-added state for one step."""
    ny, nx = 16, 16
    ne = 4
    mask, edges, bcs = _geometry(ny, nx)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, GAP, 0.0)
    Kr = recombination_kernel_base(E, GAP, TAU, TC)
    Ks = scattering_kernel_base(E, GAP, TAU, TC)
    D_bins = 6.0 * np.sqrt(np.maximum(0.0, 1.0 - (GAP / E) ** 2))
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D_bins)
    cols = dict(
        dE=dE, rho=rho, K_r0=Kr, K_s0=Ks, pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    plain = build_sharded_step(mesh, op, 0.05, collisions=cols, dtype=jnp.float64)
    gen = build_sharded_step(
        mesh, op, 0.05, collisions=cols, dtype=jnp.float64, gen_input=True
    )
    assert gen.takes_gen and not plain.takes_gen

    rng = np.random.default_rng(5)
    q0 = rng.uniform(0, 1e-4, (ne, ny, nx))
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, TBATH)[:, None, None],
        (pm.num_omega, ny, nx),
    ).copy()
    grow = jnp.asarray(rng.uniform(0, 1e-6, (ny, nx)))

    q_g, ph_g, m_g = gen.step(jnp.asarray(q0), jnp.asarray(ph0), grow)
    q_p, ph_p, m_p = plain.step(jnp.asarray(q0) + grow[None], jnp.asarray(ph0))
    np.testing.assert_allclose(np.asarray(q_g), np.asarray(q_p), atol=1e-15)
    np.testing.assert_allclose(np.asarray(ph_g), np.asarray(ph_p), atol=1e-15)

    # the documented multi-step path works too (constant-rate source)
    chunk = gen.make_chunk(3, unroll=1)
    q_c, ph_c, m_c = chunk(jnp.asarray(q0), jnp.asarray(ph0), grow)
    assert np.all(np.isfinite(np.asarray(q_c))) and float(m_c) > 0


def test_pulse_chunk_requires_start_time():
    """A pulse-gated chunk refuses an implicit t0: chaining with a default
    t0=0 would silently re-fire the pulse at the start of every chunk."""
    import jax.numpy as jnp
    import pytest

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=2, member_shape=(6, 10), num_energy_bins=4, dt=0.05,
        dtype=jnp.float64,
    )
    plane = ens.generation_plane(np.array([1e-6, 2e-6]))
    q, ph = ens.pack(np.zeros((2, 4, 6, 10)), ens.thermal_phonons(np.zeros(2)))
    q, ph = jnp.asarray(q), jnp.asarray(ph)

    gated = ens.make_chunk(2, gen_plane=plane, pulse_window=(0.0, 0.2))
    with pytest.raises(TypeError, match="re-fire"):
        gated(q, ph)
    gated(q, ph, 0.0)  # explicit start time is fine
    # without a window the chunk is time-invariant: t0 stays optional
    ens.make_chunk(2, gen_plane=plane)(q, ph)


def test_sharded_wang_y_solve_matches_pencil():
    """y_solve='wang' (distributed Wang partition: one small all_gather
    instead of two pencil transposes) reproduces the pencil path to f64
    roundoff, including masked intervals crossing shard boundaries and a
    non-uniform gap map."""
    ny = nx = 16
    ne = 4
    dt = 0.05
    mask = np.ones((ny, nx), dtype=bool)
    mask[6:10, 3:7] = False  # hole: decoupled y-intervals at shard edges
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 6.0)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, GAP, 0.0)
    col = dict(
        E_bins=E, dE=dE, rho=rho,
        K_r0=recombination_kernel_base(E, GAP, TAU, TC),
        K_s0=scattering_kernel_base(E, GAP, TAU, TC),
        pmap=pm, enable_recombination=True, enable_scattering=True,
        update_phonons=True,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    rng = np.random.default_rng(3)
    q0 = jnp.asarray(np.where(mask, 1.0, 0.0)[None] * rng.uniform(0, 1e-4, (ne, ny, nx)))
    ph0 = jnp.asarray(
        np.where(mask, 1.0, 0.0)[None] * rng.uniform(0, 1e-3, (pm.num_omega, ny, nx))
    )
    outs = {}
    for ys in ("pencil", "wang"):
        sh = build_sharded_step(
            mesh, op, dt, collisions=col, dtype=jnp.float64, y_solve=ys
        )
        outs[ys] = sh.make_chunk(6, unroll=2)(q0, ph0)
    for a, b in zip(outs["pencil"][:2], outs["wang"][:2]):
        scale = float(jnp.max(jnp.abs(a)))
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-13 * max(scale, 1e-30)
        )

    with pytest.raises(ValueError, match="y_solve"):
        build_sharded_step(mesh, op, dt, collisions=col, y_solve="diagonal")


def test_sharded_wang_gap_plane_and_pieces():
    """wang composes with the non-uniform gap plane path and merged pieces."""
    ny = nx = 16
    ne = 4
    dt = 0.05
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    E, dE = build_energy_grid(GAP, 1.0, 3.0, ne)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 6.0)
    pm = build_phonon_frequency_map(E)
    gap_plane = np.full((ny, nx), GAP)
    gap_plane[:, nx // 2:] = GAP - 25.0
    rho = dynes_density_of_states(E, GAP, 0.0)
    col = dict(
        E_bins=E, dE=dE, rho=rho, K_r0=None, K_s0=None,
        gap_plane=gap_plane, tau_s=TAU, tau_r=TAU, T_c=TC,
        pmap=pm, enable_recombination=True, enable_scattering=True,
        update_phonons=True,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    rng = np.random.default_rng(4)
    q0 = jnp.asarray(rng.uniform(0, 1e-4, (ne, ny, nx)))
    ph0 = jnp.asarray(rng.uniform(0, 1e-3, (pm.num_omega, ny, nx)))
    ref = None
    for ys in ("pencil", "wang"):
        sh = build_sharded_step(
            mesh, op, dt, collisions=col, dtype=jnp.float64, y_solve=ys,
            pieces=True,
        )
        raw, src = sh.aux

        @jax.jit
        def merged(q, ph, raw=raw, src=src, sh=sh):
            q, ph = sh.apply_col_half(q, ph, raw)
            q = sh.apply_diffuse(q, raw, src)
            q, ph = sh.apply_col_full(q, ph, raw)
            q = sh.apply_diffuse(q, raw, src)
            q, ph = sh.apply_col_half(q, ph, raw)
            return q, ph

        out = merged(q0, ph0)
        if ref is None:
            ref = out
        else:
            for a, b in zip(ref, out):
                scale = float(jnp.max(jnp.abs(a)))
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-13 * max(scale, 1e-30)
                )


def test_engine_mesh_wang_env_matches_pencil(monkeypatch):
    """QPSIM_MESH_Y_SOLVE=wang routes the engine's mesh runner through the
    distributed Wang y-sweep and reproduces the default at f64 roundoff."""
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.4, dx=1.0,
        store_every=4,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    t_p, f_p, m_p, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)
    monkeypatch.setenv("QPSIM_MESH_Y_SOLVE", "wang")
    t_w, f_w, m_w, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)
    assert t_w == t_p
    for a, b in zip(f_w, f_p):
        np.testing.assert_allclose(np.nan_to_num(a), np.nan_to_num(b), atol=1e-12)
    np.testing.assert_allclose(m_w, m_p, rtol=1e-12)


def test_sharded_wang_lazy_and_prefactored_branches(monkeypatch):
    """Both wang variants agree with pencil: the prefactored path (eager
    coefficients — the default at test sizes) and the unfactored path
    (lazy bin scale, where factors cannot be prebuilt)."""
    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

    ny, nx = 16, 16
    mask, edges, bcs = _geometry(ny, nx)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([2.0, 5.0, 7.0]))
    rng = np.random.default_rng(9)
    q0 = rng.uniform(0, 1, (3, ny, nx))
    mesh = make_mesh(n_space=len(jax.devices()))

    def run(y_solve):
        sh = build_sharded_step(mesh, op, 0.05, dtype=jnp.float64, y_solve=y_solve)
        q = jax.device_put(jnp.asarray(q0), sh.q_sharding)
        ph = jax.device_put(jnp.zeros((1, ny, nx)), sh.ph_sharding)
        for _ in range(4):
            q, ph, _ = sh.step(q, ph)
        return np.asarray(q), sh

    ref, _ = run("pencil")
    # eager → prefactored branch engages (wfp_* planes present)
    got, sh_w = run("wang")
    assert "wfp_cp" in sh_w.aux[0]
    np.testing.assert_allclose(got, ref, atol=1e-12)

    # lazy scale → the unfactored branch (no factor planes)
    monkeypatch.setattr(ADIDiffusion, "MATERIALIZE_MAX_ELEMENTS", 0)
    assert op.bin_scale is not None
    ref_lazy, _ = run("pencil")
    got_lazy, sh_lazy = run("wang")
    assert "wfp_cp" not in sh_lazy.aux[0]
    np.testing.assert_allclose(got_lazy, ref_lazy, atol=1e-12)
    np.testing.assert_allclose(got_lazy, got, atol=1e-12)


def test_engine_mesh_program_cache_zero_retrace(monkeypatch):
    """A second identical mesh= call re-traces nothing; flipping the
    y-solve env knob is a different program (fingerprinted)."""
    from qpsim_tpu.solver import engine
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.3, dx=1.0,
        store_every=3,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    engine.clear_engine_program_cache()
    out1 = run_2d_crank_nicolson(**kw, mesh=mesh)
    traces = engine.engine_trace_count()
    assert traces > 0
    out2 = run_2d_crank_nicolson(**kw, mesh=mesh)
    assert engine.engine_trace_count() == traces
    np.testing.assert_array_equal(out1[2], out2[2])

    # flipping the y-solve strategy off the default ('wang' since r4) must
    # miss the cache — the env var is part of the program fingerprint
    monkeypatch.setenv("QPSIM_MESH_Y_SOLVE", "pencil")
    out3 = run_2d_crank_nicolson(**kw, mesh=mesh)
    assert engine.engine_trace_count() > traces  # new program, not a stale hit
    np.testing.assert_allclose(out3[2], out1[2], rtol=1e-12)


def test_engine_mesh_y_solve_parameter():
    """mesh_y_solve is a first-class per-call engine argument (the env var
    stays as the default) with surface validation."""
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    ny = nx = 16
    mask, edges, bcs = _geometry(ny, nx)
    init = np.zeros(mask.shape)
    init[mask] = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=0.05, total_time=0.2, dx=1.0,
        store_every=2,
        energy_gap=GAP, energy_max_factor=3.0, num_energy_bins=4,
        enable_recombination=True, enable_scattering=True,
        tau_s=TAU, tau_r=TAU, T_c=TC, bath_temperature=TBATH,
    )
    mesh = make_mesh(n_space=len(jax.devices()))
    _, _, m_w, *_ = run_2d_crank_nicolson(**kw, mesh=mesh, mesh_y_solve="wang")
    _, _, m_p, *_ = run_2d_crank_nicolson(**kw, mesh=mesh, mesh_y_solve="pencil")
    np.testing.assert_allclose(m_w, m_p, rtol=1e-12)
    with pytest.raises(ValueError, match="mesh_y_solve"):
        run_2d_crank_nicolson(**kw, mesh=mesh, mesh_y_solve="Wang")
