"""Separable prefactored-Wang fused ADI kernels (interpret mode on CPU).

Gates `ops.pallas_adi_sep` against the XLA ``ADIDiffusion`` backend (itself
gated against the dense unsplit-CN reference in tests/test_diffusion.py)
and against the general fused kernels, on full-rectangle geometries where
the separable fast path applies.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
from qpsim_tpu.ops.pallas_adi import build_pallas_adi_fused_step
from qpsim_tpu.ops.pallas_adi_sep import (
    build_pallas_adi_sep_step,
    separable_stencil_vectors,
)
from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

_FACE_KINDS = ["dirichlet", "neumann", "robin", "reflective"]


def _rect_operator(ny, nx, *, kinds=None, D=2.3, dx=0.6, seed=0):
    rng = np.random.default_rng(seed)
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    kinds = kinds or _FACE_KINDS
    bcs = {}
    for i, e in enumerate(edges):
        kind = kinds[i % len(kinds)]
        bcs[e.edge_id] = BoundaryCondition(
            kind=kind,
            value=0.4 if kind in ("dirichlet", "neumann", "robin") else None,
            aux_value=0.2 if kind == "robin" else None,
        )
    x_st, y_st = build_directional_stencils(mask, edges, bcs, dx)
    op = fold_diffusion(x_st, y_st, mask, dx, D)
    u0 = jnp.asarray(rng.uniform(0.0, 1.0, (1, ny, nx)))
    return op, u0


@pytest.mark.parametrize("ny,nx", [(32, 64), (64, 32), (16, 16), (128, 64)])
def test_sep_step_matches_xla_adi(ny, nx):
    op, u0 = _rect_operator(ny, nx, seed=ny + nx)
    dt = 0.05
    assert separable_stencil_vectors(op) is not None
    ref_step = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)
    got_step = build_pallas_adi_sep_step(op, dt, jnp.float64, interpret=True)
    ref, got = u0, u0
    for _ in range(3):  # multi-step: sources and BC couplings accumulate
        ref, got = ref_step(ref), got_step(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12)


def test_sep_step_matches_general_fused_no_source():
    op, u0 = _rect_operator(48, 96, kinds=["reflective"], seed=7)
    dt = 0.08
    a = build_pallas_adi_fused_step(op, dt, jnp.float64, interpret=True)(u0)
    b = build_pallas_adi_sep_step(op, dt, jnp.float64, interpret=True)(u0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=1e-13)


def test_sep_step_aux_protocol():
    op, u0 = _rect_operator(32, 32, seed=3)
    step_aux, aux = build_pallas_adi_sep_step(
        op, 0.05, jnp.float64, as_aux=True, interpret=True
    )
    ref = build_pallas_adi_sep_step(op, 0.05, jnp.float64, interpret=True)(u0)
    np.testing.assert_allclose(
        np.asarray(step_aux(u0, aux)), np.asarray(ref), rtol=0, atol=0
    )


def test_sep_rejects_nonseparable_and_multibin():
    rng = np.random.default_rng(5)
    mask = np.ones((32, 32), dtype=bool)
    mask[10:14, 10:20] = False  # interior hole breaks separability
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 2.0)
    assert separable_stencil_vectors(op) is None
    with pytest.raises(ValueError, match="separable"):
        build_pallas_adi_sep_step(op, 0.05, jnp.float64, interpret=True)

    op2, _ = _rect_operator(32, 32)
    assert separable_stencil_vectors(op2) is not None


def _multibin_operator(ny, nx, D_bins, *, kinds=None, dx=1.0):
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    kinds = kinds or _FACE_KINDS
    bcs = {}
    for i, e in enumerate(edges):
        kind = kinds[i % len(kinds)]
        bcs[e.edge_id] = BoundaryCondition(
            kind=kind,
            value=0.3 if kind in ("dirichlet", "neumann", "robin") else None,
            aux_value=0.15 if kind == "robin" else None,
        )
    x_st, y_st = build_directional_stencils(mask, edges, bcs, dx)
    return fold_diffusion(x_st, y_st, mask, dx, np.asarray(D_bins))


def test_sep_multibin_matches_xla_adi():
    """nb > 1 (bin-gridded per-bin factor packs) against the XLA backend."""
    D_bins = np.array([0.7, 2.3, 4.1])
    op = _multibin_operator(32, 64, D_bins)
    dt = 0.05
    assert separable_stencil_vectors(op) is not None
    ref_step = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)
    got_step = build_pallas_adi_sep_step(op, dt, jnp.float64, interpret=True)
    rng = np.random.default_rng(17)
    ref = got = jnp.asarray(rng.uniform(0.0, 1.0, (3, 32, 64)))
    for _ in range(3):
        ref, got = ref_step(ref), got_step(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-12)


def test_sep_multibin_matches_general_fused():
    D_bins = np.array([1.0, 3.0])
    op = _multibin_operator(48, 96, D_bins, kinds=["reflective"])
    dt = 0.08
    u0 = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (2, 48, 96)))
    a = build_pallas_adi_fused_step(op, dt, jnp.float64, interpret=True)(u0)
    b = build_pallas_adi_sep_step(op, dt, jnp.float64, interpret=True)(u0)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=0, atol=1e-13)


def test_sep_rejects_wrong_leading_dim():
    op, u0 = _rect_operator(32, 32, seed=3)
    step = build_pallas_adi_sep_step(op, 0.05, jnp.float64, interpret=True)
    with pytest.raises(ValueError, match="built for 1 bin"):
        step(jnp.concatenate([u0, u0], axis=0))
