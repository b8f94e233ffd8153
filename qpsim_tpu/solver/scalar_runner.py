"""Scalar (energy-integrated) mode runner.

The reference's legacy branch (``/root/reference/qpsim/solver.py:1517-1587``):
one CN field, no collisions, optional fixed-temperature phonon scaffold.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.diffusion import build_directional_stencils, fold_diffusion
from .diffusion_backends import choose_backend
from .phonon_history import build_fixed_phonon_history, reconstruct_field
from .stepping import (
    _color_limits,
    _limits_from_running,
    _notify,
    _usable_resume_prefix,
)

__all__ = ["_run_scalar"]


def _run_scalar(
    *,
    mask,
    edges,
    edge_conditions,
    initial_field,
    diffusion_coefficient,
    dx,
    segments,
    enable_diffusion,
    bath_temperature,
    phonon_history_out,
    progress_callback,
    diffusion_backend,
    dtype,
    checkpointer=None,
    frame_sink=None,
):
    interior0 = initial_field[mask].astype(np.float64)
    ny, nx = mask.shape
    state_np = np.zeros((1, ny, nx), dtype=np.float64)
    state_np[0][mask] = interior0
    state = jnp.asarray(state_np, dtype=dtype)

    step_fns: dict[tuple[float, int], Callable] = {}
    backend = None
    if enable_diffusion:
        x_st, y_st = build_directional_stencils(mask, edges, edge_conditions, dx)
        op = fold_diffusion(x_st, y_st, mask, dx, float(diffusion_coefficient))
        backend = choose_backend(op, dtype, diffusion_backend)

    def segment_fn(seg_dt: float, length: int):
        key = (seg_dt, length)
        if key not in step_fns:
            if backend is None:
                step_fns[key] = jax.jit(lambda s: s)
            else:
                one, aux = backend.make_step_aux(seg_dt)
                # amortize the while-loop back-edge cost on large carries
                # (same rationale as the energy-resolved segment runner)
                u = 8 if int(mask.sum()) >= (1 << 18) else 1

                def run(s, a):
                    return jax.lax.scan(
                        lambda c, _: (one(c, a), None), s, None, length=length,
                        unroll=min(u, length),
                    )[0]

                jit_run = jax.jit(run)
                step_fns[key] = lambda s, _aux=aux: jit_run(s, _aux)
        return step_fns[key]

    def snapshot(q_host: np.ndarray):
        values = q_host[0][mask]
        return reconstruct_field(mask, values), float(np.sum(values) * dx * dx)

    times: list[float] = []
    frames: list[np.ndarray] = []
    mass: list[float] = []
    running_limits = [float("inf"), float("-inf")]  # streaming-mode color limits
    current_time = 0.0
    step_counter = 0
    stored_idx = 0
    completed_steps = 0

    def emit(t: float, frame: np.ndarray, m: float) -> np.ndarray:
        # one stored snapshot: stream it or keep it, never both
        idx = len(times)
        times.append(float(t))
        mass.append(m)
        if frame_sink is not None:
            running_limits[0] = min(running_limits[0], float(np.nanmin(frame)))
            running_limits[1] = max(running_limits[1], float(np.nanmax(frame)))
            frame_sink.write(idx, float(t), frame=frame, mass=m)
        else:
            frames.append(frame)
        return frame

    replay = _usable_resume_prefix(checkpointer, segments) if checkpointer is not None else []
    if replay:
        # Rebuild the stored history from checkpoints and continue from the
        # last aligned one — results match an uninterrupted run exactly.
        for payload in replay:
            frame, m = snapshot(np.asarray(payload["q"], dtype=np.float64))
            emit(payload["time_ns"], frame, m)
        resume = replay[-1]
        state = jnp.asarray(resume["q"], dtype=dtype)
        completed_steps = resume["step"]
        step_counter = completed_steps
        current_time = resume["time_ns"]
    else:
        frame0 = emit(
            0.0, reconstruct_field(mask, interior0), float(np.sum(interior0) * dx * dx)
        )
        _notify(progress_callback, 0.0, frame0)
        if checkpointer is not None:
            checkpointer.save_step(0, step=0, time_ns=0.0, q=state_np)

    cumulative = 0
    for seg in segments:
        if cumulative + seg.length <= completed_steps:
            cumulative += seg.length
            if seg.stored:
                stored_idx += 1
            continue
        cumulative += seg.length
        state = segment_fn(seg.dt, seg.length)(state)
        step_counter += seg.length
        current_time += seg.dt * seg.length
        if seg.stored:
            stored_idx += 1
            q_host = np.asarray(state, dtype=np.float64)
            frame, m = snapshot(q_host)
            emit(current_time, frame, m)
            _notify(progress_callback, current_time, frame)
            if checkpointer is not None:
                checkpointer.save_step(
                    stored_idx, step=step_counter, time_ns=float(current_time), q=q_host
                )

    if checkpointer is not None:
        checkpointer.finalize()

    if phonon_history_out is not None:
        # the scalar scaffold is synthetic (fixed bath temperature, not
        # evolved state) so it is never streamed — it stays in the dict
        # even when a frame_sink is active
        ph_frames, ph_energy, ph_bins, ph_meta = build_fixed_phonon_history(
            mask=mask,
            times=times,
            bath_temperature=bath_temperature,
            phonon_energy_bins=None,
        )
        phonon_history_out.update(
            {
                "phonon_frames": ph_frames,
                "phonon_energy_frames": ph_energy,
                "phonon_energy_bins": ph_bins,
                "phonon_metadata": ph_meta,
            }
        )
    if frame_sink is not None:
        return times, [], mass, _limits_from_running(running_limits), None, None
    return times, frames, mass, _color_limits(frames), None, None


