"""Batched tridiagonal solves for ADI sweeps (JAX).

``tridiag_solve`` runs the Thomas algorithm along the **last** axis, batched
over all leading axes — one ``lax.scan`` forward elimination and one reversed
back-substitution, each step a fused multiply-add over the whole batch, so a
(NE, Ny, Nx) sweep keeps the VPU busy with NE·Ny lanes per scan step.

Block-diagonal systems (masked geometries produce independent intervals in
one grid line) need no special casing: a zero sub-diagonal entry restarts the
forward recurrence and a zero super-diagonal entry terminates the backward
one, so interval boundaries decouple exactly.

A Pallas kernel with identical semantics can be substituted for the scans on
TPU via ``qpsim_tpu.ops.pallas_tridiag`` (optional fast path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve", "tridiag_solve_along"]


def tridiag_solve(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Solve T x = rhs with T tridiagonal along the last axis.

    ``sub[..., i]`` couples row i to i−1 (entry ignored at i=0) and
    ``sup[..., i]`` couples row i to i+1 (ignored at the last row).
    All arrays share one shape; batching is over the leading axes.
    """
    n = rhs.shape[-1]
    if n == 1:
        return rhs / diag

    a = jnp.moveaxis(sub, -1, 0)
    b = jnp.moveaxis(diag, -1, 0)
    c = jnp.moveaxis(sup, -1, 0)
    r = jnp.moveaxis(rhs, -1, 0)
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)

    def forward(carry, row):
        w_prev, g_prev = carry
        a_i, b_i, c_i, r_i = row
        inv = 1.0 / (b_i - a_i * w_prev)
        w_i = c_i * inv
        g_i = (r_i - a_i * g_prev) * inv
        return (w_i, g_i), (w_i, g_i)

    zeros = jnp.zeros_like(r[0])
    _, (w, g) = jax.lax.scan(forward, (zeros, zeros), (a, b, c, r))

    def backward(x_next, row):
        w_i, g_i = row
        x_i = g_i - w_i * x_next
        return x_i, x_i

    _, x = jax.lax.scan(backward, zeros, (w, g), reverse=True)
    return jnp.moveaxis(x, 0, -1)


def tridiag_solve_along(
    axis: int,
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Tridiagonal solve along an arbitrary axis (moves it last and back)."""
    if axis in (-1, rhs.ndim - 1):
        return tridiag_solve(sub, diag, sup, rhs)
    move = lambda t: jnp.moveaxis(t, axis, -1)
    out = tridiag_solve(move(sub), move(diag), move(sup), move(rhs))
    return jnp.moveaxis(out, -1, axis)
