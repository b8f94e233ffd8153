"""Fused Pallas ADI diffusion kernels (interpret mode on CPU).

Gates the in-VMEM Wang-partition solve and the two-pass fused step against
the XLA ``ADIDiffusion`` backend, which is itself gated against the dense
unsplit-CN reference elsewhere (tests/test_diffusion.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
from qpsim_tpu.ops.pallas_adi import (
    _pick_chunks,
    build_pallas_adi_fused_step,
    build_pallas_adi_step,
    solve_lines_pallas,
)
from qpsim_tpu.ops.tridiag import tridiag_solve
from qpsim_tpu.solver.diffusion_backends import ADIDiffusion, choose_backend

_KINDS = ["reflective", "absorbing", "dirichlet", "neumann", "robin"]


def _random_operator(ny, nx, nb, *, masked, variable_d, seed=0, dx=0.7):
    rng = np.random.default_rng(seed)
    mask = np.ones((ny, nx), dtype=bool)
    if masked:
        mask[rng.random((ny, nx)) < 0.25] = False
        mask[0, :] = True
        mask[-1, :] = True
    edges = extract_edge_segments(mask)
    bcs = {}
    for i, e in enumerate(edges):
        kind = _KINDS[i % len(_KINDS)]
        bcs[e.edge_id] = BoundaryCondition(
            kind=kind,
            value=0.3 if kind in ("dirichlet", "neumann", "robin") else None,
            aux_value=0.1 if kind == "robin" else None,
        )
    if variable_d:
        D = rng.uniform(1.0, 3.0, (nb, ny, nx))
    else:
        D = rng.uniform(1.0, 3.0, nb)
    x_st, y_st = build_directional_stencils(mask, edges, bcs, dx)
    op = fold_diffusion(x_st, y_st, mask, dx, D)
    u0 = jnp.asarray(rng.uniform(0.0, 1.0, (nb, ny, nx)) * mask[None])
    return op, u0


def test_solve_lines_matches_tridiag():
    rng = np.random.default_rng(3)
    nb, n, batch = 3, 48, 40  # batch forces lane padding (40 % 128 != 0)
    lo = rng.uniform(-0.3, -0.1, (nb, n, batch))
    hi = rng.uniform(-0.3, -0.1, (nb, n, batch))
    di = rng.uniform(2.0, 3.0, (nb, n, batch))
    lo[:, 0] = 0.0
    hi[:, -1] = 0.0
    # decoupled interval boundary in the middle of a chunk
    lo[:, 17] = 0.0
    hi[:, 16] = 0.0
    rhs = rng.uniform(-1.0, 1.0, (nb, n, batch))
    alpha = 1.0  # coefficients passed pre-scaled; solve (I·0 + direct) form
    # Build the equivalent last-axis tridiagonal problem for tridiag_solve:
    # solve_lines uses (1 - alpha*s*di) on the diagonal and -alpha*s*lo/hi.
    scale = jnp.ones((nb,))
    got = solve_lines_pallas(
        jnp.asarray(rhs), jnp.asarray(lo), jnp.asarray(di), jnp.asarray(hi),
        scale, alpha=alpha, interpret=True,
    )
    ref = tridiag_solve(
        jnp.moveaxis(jnp.asarray(-alpha * lo), 1, -1),
        jnp.moveaxis(jnp.asarray(1.0 - alpha * di), 1, -1),
        jnp.moveaxis(jnp.asarray(-alpha * hi), 1, -1),
        jnp.moveaxis(jnp.asarray(rhs), 1, -1),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.moveaxis(ref, -1, 1)), rtol=0, atol=1e-11
    )


def test_pick_chunks_prefers_wide_vectors():
    assert _pick_chunks(1024) == 32
    assert _pick_chunks(256) == 32
    assert _pick_chunks(48) == 4  # largest K with M = n/K >= 8
    assert _pick_chunks(9) == 1  # falls back to plain Thomas


@pytest.mark.parametrize(
    "ny,nx,nb,masked,variable_d",
    [
        (32, 64, 3, True, False),
        (64, 32, 2, True, True),
        (16, 16, 1, False, False),
        (56, 40, 2, True, False),  # non-power-of-two: glue (non-fused) path
    ],
)
def test_pallas_adi_step_matches_xla_adi(ny, nx, nb, masked, variable_d):
    op, u0 = _random_operator(ny, nx, nb, masked=masked, variable_d=variable_d)
    dt = 0.05
    ref = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)(u0)
    got = build_pallas_adi_step(op, dt, jnp.float64, interpret=True)(u0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12)


@pytest.mark.parametrize(
    "ny,nx,nb,masked,variable_d",
    [
        (32, 64, 3, True, False),
        (64, 32, 2, True, True),
        (16, 16, 1, False, False),
        (128, 64, 2, True, False),
    ],
)
def test_fused_two_pass_step_matches_xla_adi(ny, nx, nb, masked, variable_d):
    op, u0 = _random_operator(ny, nx, nb, masked=masked, variable_d=variable_d, seed=1)
    dt = 0.05
    ref = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)(u0)
    got = build_pallas_adi_fused_step(op, dt, jnp.float64, interpret=True)(u0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12)


def test_fused_step_rejects_untileable_grids():
    op, _ = _random_operator(9, 14, 1, masked=False, variable_d=False)
    with pytest.raises(ValueError):
        build_pallas_adi_fused_step(op, 0.05, jnp.float64, interpret=True)


def test_choose_backend_pallas_contract():
    from qpsim_tpu.solver.diffusion_backends import PallasADI

    op, _ = _random_operator(16, 16, 1, masked=False, variable_d=False)
    assert jax.default_backend() != "tpu"  # conftest forces CPU
    # explicit request off-TPU must raise with the reason
    with pytest.raises(ValueError, match="pallas"):
        choose_backend(op, jnp.float32, "pallas")
    # and 'auto' must not select it off-TPU
    assert not isinstance(choose_backend(op, jnp.float32, "auto"), PallasADI)


@pytest.mark.slow
def test_fused_step_bf16_state_tracks_f32():
    """state_dtype=bfloat16: bf16 in HBM, f32 compute — result within bf16
    rounding of the full-f32 step, and the step's I/O contract is bf16."""
    op, u0 = _random_operator(32, 64, 3, masked=True, variable_d=False, seed=4)
    dt = 0.05
    f32 = build_pallas_adi_fused_step(op, dt, jnp.float32, interpret=True)
    bf16 = build_pallas_adi_fused_step(
        op, dt, jnp.float32, state_dtype=jnp.bfloat16, interpret=True
    )
    ref = np.asarray(f32(u0.astype(jnp.float32)), dtype=np.float64)
    got_b = bf16(u0.astype(jnp.bfloat16))
    assert got_b.dtype == jnp.bfloat16
    got = np.asarray(got_b.astype(jnp.float32), dtype=np.float64)
    scale = np.max(np.abs(ref)) + 1e-30
    # one bf16 rounding of the input + one of the output ≈ 2^-8 relative
    assert np.max(np.abs(got - ref)) / scale < 2e-2
    # multi-step stability: repeated bf16 steps stay near the f32 orbit
    uf, ub = u0.astype(jnp.float32), u0.astype(jnp.bfloat16)
    for _ in range(5):
        uf, ub = f32(uf), bf16(ub)
    d = np.max(np.abs(np.asarray(ub.astype(jnp.float32)) - np.asarray(uf)))
    assert d / (np.max(np.abs(np.asarray(uf))) + 1e-30) < 5e-2
