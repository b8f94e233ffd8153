"""Pallas TPU kernel: batched Thomas tridiagonal solve.

Why a hand-written kernel: the ADI step's tridiagonal solves dominate the
HBM traffic.  The pure-XLA PCR path (``tridiag.tridiag_solve_pcr``) makes
⌈log₂N⌉ full passes over four coefficient arrays (~320 MB per 1024² solve);
the scan-based Thomas is dispatch-latency bound.  This kernel keeps one tile
of lines resident in VMEM and does the classic two-sweep Thomas elimination
sequentially *inside* the kernel — each input element is read from HBM
exactly once (~20 MB per 1024² solve).

Layout: lines are solved along the FIRST axis of a (N, B) block with the
batch on lanes, so every sweep step is a fused multiply-add over a
(1, B_TILE) vector.  The caller flattens/transposes (…, N) batches into
(N, B), pads B to the tile width with identity rows, and grids over batch
tiles.

Semantics identical to ``tridiag.tridiag_solve``: sub[...,0] / sup[...,-1]
are ignored, zero couplings decouple intervals exactly (masked geometries).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["tridiag_solve_pallas", "pallas_tridiag_available"]

_LANE_TILE = 256


def _thomas_kernel(a_ref, b_ref, c_ref, r_ref, x_ref, w_ref, g_ref):
    n = a_ref.shape[0]

    inv0 = 1.0 / b_ref[0, :]
    w0 = c_ref[0, :] * inv0
    g0 = r_ref[0, :] * inv0
    w_ref[0, :] = w0
    g_ref[0, :] = g0

    def forward(i, carry):
        w_prev, g_prev = carry
        a_i = a_ref[i, :]
        inv = 1.0 / (b_ref[i, :] - a_i * w_prev)
        w_i = c_ref[i, :] * inv
        g_i = (r_ref[i, :] - a_i * g_prev) * inv
        w_ref[i, :] = w_i
        g_ref[i, :] = g_i
        return w_i, g_i

    w_last, g_last = jax.lax.fori_loop(1, n, forward, (w0, g0))
    x_ref[n - 1, :] = g_last

    def backward(k, x_next):
        i = n - 2 - k
        x_i = g_ref[i, :] - w_ref[i, :] * x_next
        x_ref[i, :] = x_i
        return x_i

    jax.lax.fori_loop(0, n - 1, backward, g_last)


def _solve_nb(a, b, c, r, *, interpret: bool):
    """Core solve on (N, B) arrays, B a multiple of the lane tile."""
    n, batch = a.shape
    grid = (batch // _LANE_TILE,)
    spec = pl.BlockSpec((n, _LANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _thomas_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, batch), a.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, _LANE_TILE), a.dtype),
            pltpu.VMEM((n, _LANE_TILE), a.dtype),
        ],
        interpret=interpret,
    )(a, b, c, r)


@partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve_pallas(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Solve T x = rhs along the last axis (batched over leading axes)."""
    shape = rhs.shape
    n = shape[-1]
    if n == 1:
        return rhs / diag

    flat = lambda t: jnp.moveaxis(t.reshape(-1, n), -1, 0)  # (N, B)
    a, b, c, r = flat(sub), flat(diag), flat(sup), flat(rhs)
    a = a.at[0, :].set(0.0)
    c = c.at[-1, :].set(0.0)

    batch = a.shape[1]
    pad = (-batch) % _LANE_TILE
    if pad:
        # identity rows: b=1, a=c=r=0 → x=0 in the padding lanes
        a = jnp.pad(a, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, 0), (0, pad)), constant_values=1.0)
        c = jnp.pad(c, ((0, 0), (0, pad)))
        r = jnp.pad(r, ((0, 0), (0, pad)))

    x = _solve_nb(a, b, c, r, interpret=interpret)
    if pad:
        x = x[:, :batch]
    return jnp.moveaxis(x, 0, -1).reshape(shape)


def pallas_tridiag_available() -> bool:
    """True when the compiled (non-interpret) kernel can run here."""
    return jax.default_backend() == "tpu"
