"""On-chip ensemble sweeps: vmap over simulation parameters.

The reference runs one simulation per process; on TPU a parameter sweep
(e.g. 32 diffusion coefficients, or 32 pulse energies) is a single vmapped
program — the MXU sees a 32× larger batch for free.  Combined with the
``ensemble`` mesh axis this scales sweeps across chips with zero hot-loop
communication.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mask import extract_edge_segments
from ..models.params import BoundaryCondition
from ..ops.diffusion import build_directional_stencils, fold_diffusion
from ..ops.tridiag import tridiag_solve, tridiag_solve_along

__all__ = ["build_diffusion_sweep_step", "sweep_diffusion_decay"]


def build_diffusion_sweep_step(
    mask: np.ndarray,
    edges,
    edge_conditions: dict[str, BoundaryCondition],
    dx: float,
    dt: float,
    dtype=jnp.float32,
) -> Callable:
    """Return ``step(states, D_values)`` vmapped over ensemble members.

    ``states``: (B, NB, Ny, Nx); ``D_values``: (B,) member diffusion
    coefficients.  One Peaceman–Rachford step per call; the D-scaling is
    applied inside the vmap so every member shares the same unscaled stencil
    arrays (read once from HBM).
    """
    x_st, y_st = build_directional_stencils(mask, edges, edge_conditions, dx)
    unit = fold_diffusion(x_st, y_st, mask, dx, 1.0)
    ax_lo = jnp.asarray(unit.ax_lo, dtype=dtype)
    ax_hi = jnp.asarray(unit.ax_hi, dtype=dtype)
    ax_diag = jnp.asarray(unit.ax_diag, dtype=dtype)
    ay_lo = jnp.asarray(unit.ay_lo, dtype=dtype)
    ay_hi = jnp.asarray(unit.ay_hi, dtype=dtype)
    ay_diag = jnp.asarray(unit.ay_diag, dtype=dtype)
    src = jnp.asarray(unit.source_total(), dtype=dtype)
    alpha0 = 0.5 * float(dt)

    def apply_dir(u, a_lo, a_hi, diag, axis):
        return (
            a_lo * jnp.roll(u, 1, axis=axis)
            + a_hi * jnp.roll(u, -1, axis=axis)
            + diag * u
        )

    def one_member(u, d_val):
        a = alpha0 * d_val
        rhs = u + a * apply_dir(u, ay_lo, ay_hi, ay_diag, -2) + alpha0 * d_val * src
        u_star = tridiag_solve(
            jnp.broadcast_to(-a * ax_lo, rhs.shape),
            jnp.broadcast_to(1.0 - a * ax_diag, rhs.shape),
            jnp.broadcast_to(-a * ax_hi, rhs.shape),
            rhs,
        )
        rhs2 = u_star + a * apply_dir(u_star, ax_lo, ax_hi, ax_diag, -1) + alpha0 * d_val * src
        return tridiag_solve_along(
            -2,
            jnp.broadcast_to(-a * ay_lo, rhs2.shape),
            jnp.broadcast_to(1.0 - a * ay_diag, rhs2.shape),
            jnp.broadcast_to(-a * ay_hi, rhs2.shape),
            rhs2,
        )

    return jax.jit(jax.vmap(one_member, in_axes=(0, 0)))


def sweep_diffusion_decay(
    width: int = 64,
    height: int = 32,
    D_values: np.ndarray | None = None,
    steps: int = 50,
    dt: float = 0.05,
    dtype=jnp.float32,
) -> np.ndarray:
    """Convenience sweep: peak decay curves for a batch of D values.

    Returns (B, steps+1) center-pixel traces — the vmapped analogue of
    running the reference B times.
    """
    if D_values is None:
        D_values = np.linspace(1.0, 8.0, 8)
    mask = np.ones((height, width), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    step = build_diffusion_sweep_step(mask, edges, bcs, 1.0, dt, dtype)
    b = len(D_values)
    states = np.zeros((b, 1, height, width), dtype=np.float64)
    states[:, 0, height // 2, width // 2] = 1.0
    u = jnp.asarray(states, dtype=dtype)
    d = jnp.asarray(np.asarray(D_values), dtype=dtype)
    traces = [np.asarray(u[:, 0, height // 2, width // 2])]
    for _ in range(steps):
        u = step(u, d)
        traces.append(np.asarray(u[:, 0, height // 2, width // 2]))
    return np.stack(traces, axis=1)
