"""External quasiparticle generation g_ext(E, x, y, t).

Two evaluation strategies (reference behaviour:
``/root/reference/qpsim/solver.py:878-964``):

* **Traced** — constant/pulse modes and most custom expressions lower
  straight into the jitted time step (the jax backend of the safe-eval DSL
  maps ``np.*`` onto ``jax.numpy``), so generation never forces a host
  round-trip per step.  Validity (finite, non-negative) is reduced on-device
  and surfaced through the step-stats channel.
* **Host** — custom expressions that cannot trace (rare: shape-dependent
  logic) are evaluated per step on the host with the reference's exact
  vectorised-then-scalar fallback and validation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..expr.safe_eval import compile_safe_expression
from ..fields import normalized_pixel_coords
from ..models.params import ExternalGenerationSpec

__all__ = ["GenerationProgram", "build_generation_program", "evaluate_generation_host"]


class GenerationProgram:
    """Either a traced ``fn(t) -> (NE, Ny, Nx)`` or a host-mode marker.

    ``scalar_amp_fn`` is set for the spatially/spectrally uniform modes
    (constant, pulse): ``fn(t) -> scalar`` with g(E, x, y, t) = amp(t)
    on every masked pixel.  Consumers (the engine's Pallas collision
    kernels) can then fuse the forward-Euler injection into the collision
    pass instead of paying a full state HBM round-trip on an XLA add.
    """

    def __init__(
        self,
        traced_fn: Callable[[jax.Array], jax.Array] | None,
        host_mode: bool,
        spec: ExternalGenerationSpec | None,
        scalar_amp_fn: Callable[[jax.Array], jax.Array] | None = None,
    ):
        self.traced_fn = traced_fn
        self.host_mode = host_mode
        self.spec = spec
        self.scalar_amp_fn = scalar_amp_fn

    @property
    def active(self) -> bool:
        return self.traced_fn is not None or self.host_mode


def build_generation_program(
    spec: ExternalGenerationSpec | None,
    E_bins: np.ndarray,
    mask: np.ndarray,
    dtype,
) -> GenerationProgram:
    if spec is None or spec.normalized_mode() == "none":
        return GenerationProgram(None, False, None)
    spec.validate()
    mode = spec.normalized_mode()
    m = np.asarray(mask, dtype=bool)
    ny, nx = m.shape
    ne = int(np.asarray(E_bins).size)
    mask_dev = jnp.asarray(m.astype(np.float64), dtype=dtype)

    if mode == "constant":
        rate = float(spec.rate)

        def const_fn(t):
            return jnp.full((ne, ny, nx), rate, dtype=dtype) * mask_dev

        return GenerationProgram(
            const_fn, False, spec,
            scalar_amp_fn=lambda t: jnp.asarray(rate, dtype=dtype),
        )

    if mode == "pulse":
        start, duration, rate = float(spec.pulse_start), float(spec.pulse_duration), float(spec.pulse_rate)

        def pulse_amp(t):
            inside = (t >= start) & (t < start + duration)
            return jnp.where(inside, rate, 0.0).astype(dtype)

        def pulse_fn(t):
            return pulse_amp(t) * jnp.ones((ne, ny, nx), dtype=dtype) * mask_dev

        return GenerationProgram(pulse_fn, False, spec, scalar_amp_fn=pulse_amp)

    # custom: attempt a traced program, falling back to host evaluation.
    body = spec.custom_body.strip() or "0.0"
    params = dict(spec.custom_params or {})
    x_norm, y_norm = normalized_pixel_coords(m)
    active = np.flatnonzero(m.ravel())
    x_flat = jnp.asarray(x_norm[m], dtype=dtype)
    y_flat = jnp.asarray(y_norm[m], dtype=dtype)
    e_col = jnp.asarray(np.asarray(E_bins, dtype=np.float64)[:, None], dtype=dtype)
    active_idx = jnp.asarray(active)

    try:
        fn = compile_safe_expression(
            body, variable_names=("E", "x", "y", "t", "params"), backend="jax"
        )

        def traced(t):
            vals = fn(E=e_col, x=x_flat[None, :], y=y_flat[None, :], t=t, params=params)
            vals = jnp.broadcast_to(jnp.asarray(vals, dtype=dtype), (ne, active.size))
            out = jnp.zeros((ne, ny * nx), dtype=dtype)
            out = out.at[:, active_idx].set(vals)
            return out.reshape(ne, ny, nx)

        # Probe the trace once; any failure (unsupported op under tracing,
        # shape logic) falls back to host mode.
        jax.eval_shape(traced, jnp.asarray(0.0, dtype=dtype))
        return GenerationProgram(traced, False, spec)
    except Exception:
        return GenerationProgram(None, True, spec)


def evaluate_generation_host(
    spec: ExternalGenerationSpec,
    E_bins: np.ndarray,
    n_spatial: int,
    t: float,
    mask: np.ndarray,
) -> np.ndarray | None:
    """Host-side generation over interior pixels → (NE, P), or None for 'none'.

    Validates shape, finiteness and non-negativity exactly like the
    reference; used for host-mode custom expressions and by tests.
    """
    mode = spec.normalized_mode()
    if mode == "none":
        return None
    ne = int(np.asarray(E_bins).size)

    def check(arr: np.ndarray) -> np.ndarray:
        if arr.shape != (ne, n_spatial):
            raise ValueError(
                f"External generation mode '{mode}' returned invalid shape "
                f"{arr.shape}; expected {(ne, n_spatial)}."
            )
        if not np.all(np.isfinite(arr)):
            raise ValueError(f"External generation mode '{mode}' produced non-finite values.")
        if np.any(arr < 0):
            raise ValueError(
                f"External generation mode '{mode}' produced negative values. "
                "Generation rates must be non-negative."
            )
        return arr

    if mode == "constant":
        return check(np.full((ne, n_spatial), spec.rate, dtype=np.float64))
    if mode == "pulse":
        if spec.pulse_start <= t < spec.pulse_start + spec.pulse_duration:
            return check(np.full((ne, n_spatial), spec.pulse_rate, dtype=np.float64))
        return check(np.zeros((ne, n_spatial), dtype=np.float64))
    if mode == "custom":
        fn = compile_safe_expression(
            spec.custom_body.strip() or "0.0",
            variable_names=("E", "x", "y", "t", "params"),
        )
        m = np.asarray(mask, dtype=bool)
        x_norm, y_norm = normalized_pixel_coords(m)
        xs, ys = x_norm[m], y_norm[m]
        params = dict(spec.custom_params or {})
        result = np.empty((ne, n_spatial), dtype=np.float64)
        e_arr = np.asarray(E_bins, dtype=np.float64)
        try:
            for i in range(ne):
                val = np.asarray(
                    fn(E=float(e_arr[i]), x=xs, y=ys, t=t, params=params), dtype=np.float64
                )
                if val.ndim == 0:
                    result[i] = float(val)
                else:
                    flat = val.ravel()
                    if flat.size != n_spatial:
                        raise ValueError(
                            "Vectorized custom generation must return a scalar or "
                            f"exactly {n_spatial} values per energy bin; got {flat.size}."
                        )
                    result[i] = flat
        except Exception:
            for i in range(ne):
                for px in range(n_spatial):
                    result[i, px] = float(
                        fn(E=float(e_arr[i]), x=float(xs[px]), y=float(ys[px]), t=t, params=params)
                    )
        return check(result)
    return None
