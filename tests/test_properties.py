"""Property-based tests (hypothesis): solver and kernel invariants hold on
randomized inputs, not just hand-picked fixtures."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from qpsim_tpu.ops.tridiag import (
    _tridiag_solve_thomas,
    tridiag_solve_pcr,
    tridiag_solve_wang,
    wang_apply,
    wang_factor,
)

_noisy = st.integers(min_value=0, max_value=2**31 - 1)


def _random_system(seed: int, batch: int, n: int):
    """Diagonally dominant tridiagonal system with random decoupling zeros."""
    rng = np.random.default_rng(seed)
    sub = rng.uniform(0.01, 0.45, (batch, n))
    sup = rng.uniform(0.01, 0.45, (batch, n))
    diag = 1.0 + sub + sup + rng.uniform(0.0, 1.0, (batch, n))
    rhs = rng.uniform(-2.0, 2.0, (batch, n))
    # decouple random interval boundaries (masked-geometry pattern)
    for _ in range(rng.integers(0, 4)):
        b = rng.integers(0, batch)
        i = rng.integers(1, n) if n > 1 else 0
        if i > 0:
            sub[b, i] = 0.0
            sup[b, i - 1] = 0.0
    return sub, diag, sup, rhs


def _dense_solve(sub, diag, sup, rhs):
    batch, n = rhs.shape
    out = np.empty_like(rhs)
    for b in range(batch):
        A = np.diag(diag[b])
        for i in range(1, n):
            A[i, i - 1] = sub[b, i]
            A[i - 1, i] = sup[b, i - 1]
        out[b] = np.linalg.solve(A, rhs[b])
    return out


@settings(max_examples=15, deadline=None)
@given(seed=_noisy, n=st.integers(min_value=1, max_value=120), chunk=st.sampled_from([4, 16, 64, 128]))
@pytest.mark.slow
def test_all_tridiag_solvers_agree_with_dense(seed, n, chunk):
    sub, diag, sup, rhs = _random_system(seed, 3, n)
    ref = _dense_solve(sub, diag, sup, rhs)
    args = tuple(map(jnp.asarray, (sub, diag, sup, rhs)))
    for name, solve in [
        ("thomas", _tridiag_solve_thomas),
        ("pcr", tridiag_solve_pcr),
        ("wang", lambda *a: tridiag_solve_wang(*a, chunk=chunk)),
        ("wang-prefactored", lambda *a: wang_apply(wang_factor(*a[:3], chunk=chunk), a[3])),
    ]:
        np.testing.assert_allclose(
            np.asarray(solve(*args)), ref, atol=1e-9, err_msg=f"{name} n={n}"
        )


@settings(max_examples=6, deadline=None)
@given(seed=_noisy, ne=st.integers(min_value=2, max_value=12))
def test_collision_step_positivity_and_scattering_conservation(seed, ne):
    from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import scattering_kernel_base
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap = 180.0
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=rho[None],
        K_r0_by_gap=None,
        K_s0_by_gap=scattering_kernel_base(E, gap, 440.0, 1.2)[None],
        gap_id=np.zeros((2, 3), np.int32),
        pmap=pm,
        enable_recombination=False,
        enable_scattering=True,
        update_phonons=True,
    )
    step = make_collision_step(plan, 0.05)
    rng = np.random.default_rng(seed)
    # random sub-occupation state (below rho so Pauli blocking stays regular)
    q0 = rng.uniform(0.0, 0.8, (ne, 2, 3)) * rho[:, None, None]
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, rng.uniform(0.05, 0.5))[:, None, None],
        (pm.num_omega, 2, 3),
    ) * rng.uniform(0.5, 1.5, (pm.num_omega, 2, 3))
    q, ph = jnp.asarray(q0), jnp.asarray(ph0)
    for _ in range(3):
        q, ph = step(q, ph)
        assert bool(jnp.all(q >= 0.0)) and bool(jnp.all(ph >= 0.0))
    # pure scattering preserves total quasiparticle number per pixel
    np.testing.assert_allclose(
        np.asarray(jnp.sum(q, axis=0)), q0.sum(axis=0), rtol=2e-5
    )


@settings(max_examples=12, deadline=None)
@given(seed=_noisy)
def test_mask_polygon_raster_round_trip_random(seed):
    from qpsim_tpu.geometry.mask import mask_to_polygons
    from qpsim_tpu.geometry.raster import rasterize_polygons

    rng = np.random.default_rng(seed)
    ny, nx = rng.integers(3, 20), rng.integers(3, 20)
    mask = rng.random((ny, nx)) > rng.uniform(0.3, 0.7)
    polys = mask_to_polygons(mask)
    if not mask.any():
        assert polys == []
        return
    back = rasterize_polygons(polys, np.arange(nx) + 0.5, np.arange(ny) + 0.5)
    np.testing.assert_array_equal(back, mask)


@settings(max_examples=5, deadline=None)
@given(seed=_noisy)
def test_distributed_wang_matches_pencil_on_random_masks(seed):
    """y_solve='wang' ≡ 'pencil' (f64 roundoff) over random masked
    geometries — holes land anywhere relative to shard boundaries, so the
    decoupled-interval handling of the distributed partition is exercised
    at every alignment."""
    import jax

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.parallel.mesh import make_mesh
    from qpsim_tpu.parallel.sharded import build_sharded_step

    rng = np.random.default_rng(seed)
    ny = nx = 16
    mask = np.ones((ny, nx), dtype=bool)
    for _ in range(rng.integers(0, 4)):
        r0 = int(rng.integers(0, ny - 2))
        c0 = int(rng.integers(0, nx - 2))
        mask[r0 : r0 + int(rng.integers(1, 4)), c0 : c0 + int(rng.integers(1, 4))] = False
    if not mask.any():
        mask[0, 0] = True
    edges = extract_edge_segments(mask)
    kinds = ["reflective", "absorbing", "dirichlet", "neumann"]
    bcs = {
        e.edge_id: BoundaryCondition(
            kind=kinds[int(rng.integers(0, len(kinds)))], value=0.1
        )
        for e in edges
    }
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, rng.uniform(1.0, 8.0, 2))
    mesh = make_mesh(n_space=len(jax.devices()))
    q0 = jnp.asarray(np.where(mask, 1.0, 0.0)[None] * rng.uniform(0, 1, (2, ny, nx)))
    ph0 = jnp.zeros((1, ny, nx))
    outs = {}
    for ys_mode in ("pencil", "wang"):
        sh = build_sharded_step(mesh, op, 0.07, dtype=jnp.float64, y_solve=ys_mode)
        q, ph = q0, ph0
        for _ in range(3):
            q, ph, _ = sh.step(q, ph)
        outs[ys_mode] = np.asarray(q)
    scale = max(float(np.max(np.abs(outs["pencil"]))), 1e-30)
    np.testing.assert_allclose(
        outs["wang"], outs["pencil"], atol=1e-12 * scale
    )
