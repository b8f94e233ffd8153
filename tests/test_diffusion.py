"""Diffusion backends: exactness, BC semantics, analytic decay rates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.diffusion import (
    BoundaryAssignmentError,
    assemble_dense_operator,
    build_directional_stencils,
    fold_diffusion,
)
from qpsim_tpu.ops.tridiag import tridiag_solve
from qpsim_tpu.solver.diffusion_backends import ADIDiffusion, DenseSpectralDiffusion


def _strip(nx, end_bc="reflective", value=None, aux=None):
    mask = np.ones((1, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {}
    for e in edges:
        if e.normal in ("up", "down"):
            bcs[e.edge_id] = BoundaryCondition(kind="reflective")
        else:
            bcs[e.edge_id] = BoundaryCondition(kind=end_bc, value=value, aux_value=aux)
    return mask, edges, bcs


def test_tridiag_matches_dense_solve():
    rng = np.random.default_rng(0)
    n = 33
    sub = rng.uniform(0.1, 0.3, (4, n))
    sup = rng.uniform(0.1, 0.3, (4, n))
    diag = rng.uniform(1.5, 2.5, (4, n))
    rhs = rng.uniform(-1, 1, (4, n))
    x = np.asarray(tridiag_solve(*map(jnp.asarray, (sub, diag, sup, rhs))))
    for b in range(4):
        T = np.diag(diag[b]) + np.diag(sub[b, 1:], -1) + np.diag(sup[b, :-1], 1)
        np.testing.assert_allclose(x[b], np.linalg.solve(T, rhs[b]), atol=1e-11)


def test_tridiag_block_decoupling():
    # zeroed couplings split one line into independent systems
    n = 8
    diag = np.full((1, n), 2.0)
    sub = np.full((1, n), -0.5)
    sup = np.full((1, n), -0.5)
    sub[0, 4] = 0.0
    sup[0, 3] = 0.0
    rhs = np.arange(n, dtype=np.float64)[None]
    x = np.asarray(tridiag_solve(*map(jnp.asarray, (sub, diag, sup, rhs))))[0]
    T1 = np.diag([2.0] * 4) + np.diag([-0.5] * 3, -1) + np.diag([-0.5] * 3, 1)
    T2 = T1.copy()
    np.testing.assert_allclose(x[:4], np.linalg.solve(T1, rhs[0, :4]), atol=1e-12)
    np.testing.assert_allclose(x[4:], np.linalg.solve(T2, rhs[0, 4:]), atol=1e-12)


def test_missing_bc_raises():
    mask = np.ones((3, 3), dtype=bool)
    edges = extract_edge_segments(mask)
    with pytest.raises(BoundaryAssignmentError):
        build_directional_stencils(mask, edges, {}, 1.0)


def test_operator_is_symmetric():
    mask = np.ones((4, 5), dtype=bool)
    mask[0, 0] = False
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="robin", value=0.3, aux_value=0.1) for e in edges}
    xs, ys = build_directional_stencils(mask, edges, bcs, 0.8)
    op = fold_diffusion(xs, ys, mask, 0.8, 2.0)
    L, _ = assemble_dense_operator(op)
    np.testing.assert_allclose(L[0], L[0].T, atol=1e-13)


def test_adi_equals_dense_on_1d():
    mask, edges, bcs = _strip(40, end_bc="dirichlet", value=0.1)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 3.0)
    sd = jax.jit(DenseSpectralDiffusion(op).make_step(0.05))
    sa = jax.jit(ADIDiffusion(op).make_step(0.05))
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 1, 40)))
    ud, ua = u, u
    for _ in range(30):
        ud, ua = sd(ud), sa(ua)
    assert float(jnp.max(jnp.abs(ud - ua))) < 1e-12


def test_adi_splitting_error_is_second_order():
    mask = np.ones((10, 12), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="dirichlet", value=0.0) for e in edges}
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 1.0)
    dense, adi = DenseSpectralDiffusion(op), ADIDiffusion(op)
    u0 = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 10, 12)))
    errs = []
    for dt, nst in [(0.2, 5), (0.1, 10), (0.05, 20)]:
        sd, sa = jax.jit(dense.make_step(dt)), jax.jit(adi.make_step(dt))
        ud, ua = u0, u0
        for _ in range(nst):
            ud, ua = sd(ud), sa(ua)
        errs.append(float(jnp.max(jnp.abs(ud - ua))))
    assert errs[0] > errs[1] > errs[2]
    assert errs[0] / errs[2] > 8.0


@pytest.mark.parametrize("backend_cls", [DenseSpectralDiffusion, ADIDiffusion])
def test_reflective_mode_decay_rate(backend_cls):
    # u(x,0) = 1 + cos(pi x / L) with reflective walls decays as exp(-D (pi/L)^2 t)
    nx, D, dt, steps = 64, 2.0, 0.02, 50
    mask, edges, bcs = _strip(nx, end_bc="reflective")
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D)
    x = np.arange(nx) + 0.5
    u0 = 1.0 + np.cos(np.pi * x / nx)
    state = jnp.asarray(u0[None, None, :])
    step = jax.jit(backend_cls(op).make_step(dt))
    for _ in range(steps):
        state = step(state)
    t = dt * steps
    # discrete CN eigenvalue of the mode (exact for the discrete operator)
    lam = -D * (2 - 2 * np.cos(np.pi / nx))  # discrete Laplacian eigenvalue
    a = 0.5 * dt * lam
    amp = ((1 + a) / (1 - a)) ** steps
    expected = 1.0 + amp * np.cos(np.pi * x / nx)
    np.testing.assert_allclose(np.asarray(state)[0, 0], expected, atol=1e-10)


@pytest.mark.parametrize("backend_cls", [DenseSpectralDiffusion, ADIDiffusion])
def test_dirichlet_relaxes_to_boundary_value(backend_cls):
    nx, D, g = 16, 5.0, 0.25
    mask, edges, bcs = _strip(nx, end_bc="dirichlet", value=g)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D)
    state = jnp.asarray(np.zeros((1, 1, nx)))
    step = jax.jit(backend_cls(op).make_step(0.5))
    for _ in range(400):
        state = step(state)
    np.testing.assert_allclose(np.asarray(state)[0, 0], g, atol=1e-8)


def test_neumann_flux_injects_mass_linearly():
    nx, D, q = 24, 1.5, 0.3
    mask, edges, bcs = _strip(nx, end_bc="neumann", value=q)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D)
    state = jnp.asarray(np.ones((1, 1, nx)))
    step = jax.jit(DenseSpectralDiffusion(op).make_step(0.1))
    masses = [float(jnp.sum(state))]
    for _ in range(10):
        state = step(state)
        masses.append(float(jnp.sum(state)))
    increments = np.diff(masses)
    # two neumann ends each inject D*q per unit time
    np.testing.assert_allclose(increments, 2 * D * q * 0.1, rtol=1e-9)


def test_variable_diffusion_harmonic_mean_blocks_zero_D_interface():
    # cells with D=0 on one side: harmonic mean face D = 0 -> no flux through
    mask = np.ones((1, 6), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    D = np.zeros((1, 1, 6))
    D[0, 0, :3] = 2.0  # right half has D = 0
    op = fold_diffusion(xs, ys, mask, 1.0, D)
    u0 = np.zeros((1, 1, 6))
    u0[0, 0, :3] = 1.0
    state = jnp.asarray(u0)
    step = jax.jit(DenseSpectralDiffusion(op).make_step(0.1))
    for _ in range(50):
        state = step(state)
    out = np.asarray(state)[0, 0]
    np.testing.assert_allclose(out[3:], 0.0, atol=1e-14)
    np.testing.assert_allclose(out[:3].sum(), 3.0, rtol=1e-12)


@pytest.mark.slow
def test_pcr_matches_thomas():
    from qpsim_tpu.ops.tridiag import tridiag_solve_pcr, _tridiag_solve_thomas

    rng = np.random.default_rng(5)
    for n in (1, 2, 3, 7, 16, 33, 100):
        sub = rng.uniform(0.05, 0.3, (3, n))
        sup = rng.uniform(0.05, 0.3, (3, n))
        diag = rng.uniform(1.2, 2.0, (3, n))
        rhs = rng.uniform(-1, 1, (3, n))
        # decouple an interval in one batch row (masked-geometry pattern)
        if n >= 8:
            sub[1, n // 2] = 0.0
            sup[1, n // 2 - 1] = 0.0
        args = tuple(map(jnp.asarray, (sub, diag, sup, rhs)))
        x_pcr = np.asarray(tridiag_solve_pcr(*args))
        x_tho = np.asarray(_tridiag_solve_thomas(*args))
        np.testing.assert_allclose(x_pcr, x_tho, atol=1e-11, err_msg=f"n={n}")


@pytest.mark.slow
def test_wang_partition_matches_thomas():
    from qpsim_tpu.ops.tridiag import _tridiag_solve_thomas, tridiag_solve_wang

    rng = np.random.default_rng(11)
    # N spanning: single chunk, exact multiples, ragged tails, chunk > N
    for n, chunk in [(1, 8), (7, 8), (64, 16), (100, 32), (129, 64), (1024, 128)]:
        sub = rng.uniform(0.05, 0.3, (3, n))
        sup = rng.uniform(0.05, 0.3, (3, n))
        diag = rng.uniform(1.2, 2.0, (3, n))
        rhs = rng.uniform(-1, 1, (3, n))
        # decouple intervals both inside chunks and straddling chunk edges
        if n >= 8:
            for cut in (n // 2, chunk if chunk < n else n // 3):
                sub[1, cut] = 0.0
                sup[1, cut - 1] = 0.0
        args = tuple(map(jnp.asarray, (sub, diag, sup, rhs)))
        x_w = np.asarray(tridiag_solve_wang(*args, chunk=chunk))
        x_t = np.asarray(_tridiag_solve_thomas(*args))
        np.testing.assert_allclose(x_w, x_t, atol=1e-11, err_msg=f"n={n}")


@pytest.mark.slow
def test_wang_as_default_solver_in_adi_step():
    from qpsim_tpu.ops.tridiag import set_default_solver

    ny, nx = 24, 40
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, 6.0)
    u0 = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, ny, nx)))
    base = ADIDiffusion(op, dtype=jnp.float64).make_step(0.1)
    ref = base(u0)
    set_default_solver("wang")
    try:
        out = ADIDiffusion(op, dtype=jnp.float64).make_step(0.1)(u0)
    finally:
        set_default_solver("auto")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


@pytest.mark.slow
def test_prefactored_wang_backend_matches_adi():
    from qpsim_tpu.solver.diffusion_backends import PrefactoredWangADI

    ny, nx = 20, 36
    mask = np.ones((ny, nx), dtype=bool)
    mask[7:11, 10:20] = False  # internal cutout: decoupled intervals
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    for e in edges[: len(edges) // 3]:
        bcs[e.edge_id] = BoundaryCondition(kind="dirichlet", value=0.25)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    # per-bin D: exercises the bin_scale (lazy/eager fold) path
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([2.0, 5.0, 7.0]))
    rng = np.random.default_rng(5)
    u0 = np.zeros((3, ny, nx))
    u0[:, mask] = rng.uniform(0, 1, (3, int(mask.sum())))
    u = jnp.asarray(u0)
    base = ADIDiffusion(op, dtype=jnp.float64).make_step(0.07)
    pref = PrefactoredWangADI(op, dtype=jnp.float64)
    step, aux = pref.make_step_aux(0.07)
    u_a, u_b, u_c = u, u, u
    captured = pref.make_step(0.07)
    for _ in range(3):
        u_a = base(u_a)
        u_b = step(u_b, aux)
        u_c = captured(u_c)
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_a), atol=1e-12)


def test_engine_accepts_wang_backend():
    ny, nx = 6, 130  # nx wide enough for multiple Wang chunks
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = 1.0
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.5,
        dx=1.0,
        store_every=5,
        energy_gap=180.0,
        num_energy_bins=4,
        energy_max_factor=3.0,
        enable_scattering=True,
        bath_temperature=0.2,
    )
    t_w, f_w, m_w, *_ = run_2d_crank_nicolson(**kw, diffusion_backend="wang")
    t_a, f_a, m_a, *_ = run_2d_crank_nicolson(**kw, diffusion_backend="adi")
    np.testing.assert_allclose(m_w, m_a, rtol=1e-12)
    for fw, fa in zip(f_w, f_a):
        np.testing.assert_allclose(np.nan_to_num(fw), np.nan_to_num(fa), atol=1e-12)


def test_cg_backend_matches_dense_unsplit_cn():
    from qpsim_tpu.solver.diffusion_backends import CGDiffusion, DenseSpectralDiffusion

    ny, nx = 14, 22
    mask = np.ones((ny, nx), dtype=bool)
    mask[5:9, 8:14] = False
    edges = extract_edge_segments(mask)
    bcs = {}
    kinds = ["reflective", "dirichlet", "neumann", "robin", "absorbing"]
    for i, e in enumerate(edges):
        kind = kinds[i % len(kinds)]
        kw = {}
        if kind == "dirichlet":
            kw = dict(value=0.3)
        elif kind == "neumann":
            kw = dict(value=0.05)
        elif kind == "robin":
            kw = dict(value=0.4, aux_value=0.02)
        bcs[e.edge_id] = BoundaryCondition(kind=kind, **kw)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, np.array([3.0, 6.0]))
    rng = np.random.default_rng(8)
    u0 = np.zeros((2, ny, nx))
    u0[:, mask] = rng.uniform(0, 1, (2, int(mask.sum())))
    u_dense = jnp.asarray(u0)
    u_cg = jnp.asarray(u0)
    dense = DenseSpectralDiffusion(op, dtype=jnp.float64).make_step(0.08)
    cg = CGDiffusion(op, dtype=jnp.float64).make_step(0.08)
    for _ in range(4):
        u_dense = dense(u_dense)
        u_cg = cg(u_cg)
    # CG is unsplit CN — matches the spectral backend to solver tolerance
    # (ADI would differ at O(dt²))
    np.testing.assert_allclose(
        np.asarray(u_cg)[:, mask], np.asarray(u_dense)[:, mask], atol=1e-10
    )


def test_engine_accepts_cg_backend():
    ny, nx = 8, 40
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = 1.0
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    kw = dict(
        mask=mask,
        edges=edges,
        edge_conditions=bcs,
        initial_field=init,
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=0.4,
        dx=1.0,
        store_every=4,
    )
    t_c, f_c, m_c, *_ = run_2d_crank_nicolson(**kw, diffusion_backend="cg")
    t_d, f_d, m_d, *_ = run_2d_crank_nicolson(**kw, diffusion_backend="dense")
    np.testing.assert_allclose(m_c, m_d, rtol=1e-10)
    for fc, fd in zip(f_c, f_d):
        np.testing.assert_allclose(np.nan_to_num(fc), np.nan_to_num(fd), atol=1e-10)


def test_pallas_thomas_kernel_interpret_mode():
    from qpsim_tpu.ops.pallas_tridiag import tridiag_solve_pallas
    from qpsim_tpu.ops.tridiag import _tridiag_solve_thomas

    rng = np.random.default_rng(9)
    for shape in [(4, 17), (2, 3, 40)]:
        sub = rng.uniform(0.05, 0.3, shape)
        sup = rng.uniform(0.05, 0.3, shape)
        diag = rng.uniform(1.3, 2.2, shape)
        rhs = rng.uniform(-1, 1, shape)
        # decouple one interval (masked-geometry pattern)
        sub[..., shape[-1] // 2] = 0.0
        sup[..., shape[-1] // 2 - 1] = 0.0
        args = tuple(map(jnp.asarray, (sub, diag, sup, rhs)))
        x_p = np.asarray(tridiag_solve_pallas(*args, interpret=True))
        x_t = np.asarray(_tridiag_solve_thomas(*args))
        np.testing.assert_allclose(x_p, x_t, atol=1e-11)


def test_variable_diffusion_steady_state_interface_jump():
    """Harmonic-mean interface D reproduces the EXACT piecewise-linear
    steady state across a D discontinuity.

    Fixed ends u(0)=1, u(L)=0 with D = D1 on the left half and D2 on the
    right: at steady state the flux J = −D·du/dx is constant, so each half
    is linear with slope ∝ 1/D and the interface value follows from flux
    continuity.  For cell-centered finite volumes with harmonic-mean face
    diffusivities this discrete steady state is exact (the reference's own
    deliberate discretization choice, solver.py:246-283)."""
    nx, D1, D2 = 16, 1.0, 4.0
    mask = np.ones((1, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {}
    for e in edges:
        if e.normal == "left":
            bcs[e.edge_id] = BoundaryCondition(kind="dirichlet", value=1.0)
        elif e.normal == "right":
            bcs[e.edge_id] = BoundaryCondition(kind="dirichlet", value=0.0)
        else:
            bcs[e.edge_id] = BoundaryCondition(kind="reflective")
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    D = np.zeros((1, 1, nx))
    D[0, 0, : nx // 2] = D1
    D[0, 0, nx // 2 :] = D2
    op = fold_diffusion(xs, ys, mask, 1.0, D)
    state = jnp.asarray(np.full((1, 1, nx), 0.5))
    step = jax.jit(DenseSpectralDiffusion(op).make_step(0.5))
    for _ in range(3000):
        state = step(state)
    u = np.asarray(state)[0, 0]

    # discrete analytic steady state: solve for the constant flux J over
    # the resistor chain (half-cell to each Dirichlet ghost + harmonic
    # faces), then integrate
    D_cells = D[0, 0]
    # resistances: boundary half-cells (dx/2 / D), interior faces (dx / D_face)
    r = [0.5 / D_cells[0]]
    for i in range(nx - 1):
        D_face = 2 * D_cells[i] * D_cells[i + 1] / (D_cells[i] + D_cells[i + 1])
        r.append(1.0 / D_face)
    r.append(0.5 / D_cells[-1])
    J = (1.0 - 0.0) / sum(r)
    expected = []
    u_val = 1.0
    for i in range(nx):
        u_val -= J * r[i]
        expected.append(u_val)
    np.testing.assert_allclose(u, expected, atol=1e-9)
    # both halves are linear, with slope ratio D2/D1
    slope_l = np.diff(u[: nx // 2])
    slope_r = np.diff(u[nx // 2 :])
    np.testing.assert_allclose(slope_l, slope_l[0], rtol=1e-6)
    np.testing.assert_allclose(slope_r, slope_r[0], rtol=1e-6)
    np.testing.assert_allclose(slope_l[0] / slope_r[0], D2 / D1, rtol=1e-6)
