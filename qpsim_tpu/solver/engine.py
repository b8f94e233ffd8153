"""The simulation engine: jit-compiled Strang-split time stepping.

This is the TPU-native replacement for the reference's
``run_2d_crank_nicolson`` (``/root/reference/qpsim/solver.py:999-1587``) with
the same call signature, semantics and return contract:

    (times, frames, mass, [vmin, vmax], energy_frames | None, E_bins | None)

Architecture differences (the TPU-first design):

* State is dense ``(NE, Ny, Nx)`` (+ phonons ``(NW, Ny, Nx)``) with a static
  mask — no compact pixel indexing on device; masked cells are inert zeros.
* The per-step loop is a ``lax.scan`` over whole snapshot segments, jitted
  once per (dt, segment length); collisions, diffusion, generation and the
  Pauli statistics all fuse into one device program.  Only a handful of
  scalars per step (Pauli/generation validity stats) and one state snapshot
  per stored segment cross the device→host boundary.
* Diffusion is a pluggable backend (exact dense-spectral CN or scalable
  ADI — see ``qpsim_tpu.solver.diffusion_backends``).
* Collisions are the vectorised Fischer–Catelani integrator
  (``qpsim_tpu.ops.collisions``), replacing the reference's Python loop over
  pixels.
* Host work per run: operator/kernel precompute (float64 numpy), snapshot
  NaN-masking, Pauli policy enforcement, storage.

Strang composition per step (reference solver.py:1454-1477):
  0) external generation, forward-Euler:  n += dt·g(t)
  1) C(dt/2) → D(dt) → C(dt/2) when both enabled, else one full step each
  2) Pauli check
  3) snapshot every ``store_every`` steps and always on the final step.
A non-multiple ``total_time`` adds one remainder step with its own compiled
operators (reference solver.py:1085-1089).
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import (
    build_initial_phonon_energy_state,
    build_initial_qp_energy_state,
)
from ..models.params import (
    BoundaryCondition,
    EdgeSegment,
    ExternalGenerationSpec,
    InitialConditionSpec,
    normalize_collision_solver_name,
)
from ..ops.collisions import (
    DEFAULT_PIXEL_CHUNK,
    build_collision_plan_arrays,
    make_collision_step,
)
from ..ops.diffusion import build_directional_stencils, fold_diffusion
from ..ops.dos import (
    diffusion_coefficient_of_energy,
    dynes_density_of_states,
    dynes_density_of_states_per_pixel,
    thermal_phonon_occupation,
)
from ..ops.energy_grid import build_energy_grid, integration_widths_from_centers
from ..ops.generation import build_generation_program, evaluate_generation_host
from ..ops.kernels import recombination_kernel_base, scattering_kernel_base
from ..io.stream import widen_color_limits
from ..ops.phonon_map import build_phonon_frequency_map
from ..utils.compile_cache import maybe_enable_persistent_cache
from .diffusion_backends import choose_backend
from .pauli import PauliEnforcer, make_pauli_stats_fn
from .phonon_history import build_fixed_phonon_history, reconstruct_field

__all__ = [
    "run_2d_crank_nicolson",
    "reconstruct_field",
    "default_dtype",
    "clear_engine_program_cache",
    "engine_trace_count",
]


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _split_time(total_time: float, dt: float) -> tuple[int, float, int]:
    full_steps = int(np.floor(total_time / dt + 1e-12))
    remainder_dt = float(total_time - full_steps * dt)
    if remainder_dt < 1e-12:
        remainder_dt = 0.0
    total_steps = full_steps + (1 if remainder_dt > 0.0 else 0)
    return full_steps, remainder_dt, total_steps


@dataclass
class _Segment:
    length: int
    dt: float
    stored: bool


def _plan_segments(full_steps: int, remainder_dt: float, dt: float, store_every: int):
    segments: list[_Segment] = []
    whole, tail = divmod(full_steps, store_every)
    segments += [_Segment(store_every, dt, True)] * whole
    if tail:
        # tail is stored only when it ends the run (no remainder step follows)
        segments.append(_Segment(tail, dt, remainder_dt == 0.0))
    if remainder_dt > 0.0:
        segments.append(_Segment(1, remainder_dt, True))
    return segments


def run_2d_crank_nicolson(
    mask: np.ndarray,
    edges: list[EdgeSegment],
    edge_conditions: dict[str, BoundaryCondition],
    initial_field: np.ndarray,
    diffusion_coefficient: float,
    dt: float,
    total_time: float,
    dx: float,
    store_every: int = 1,
    energy_gap: float = 0.0,
    energy_min_factor: float = 1.0,
    energy_max_factor: float = 10.0,
    num_energy_bins: int = 50,
    energy_weights: np.ndarray | None = None,
    enable_diffusion: bool = True,
    enable_recombination: bool = False,
    enable_scattering: bool = False,
    dynes_gamma: float = 0.0,
    collision_solver: str = "fischer_catelani_local",
    tau_0: float = 440.0,
    tau_s: float | None = None,
    tau_r: float | None = None,
    T_c: float = 1.2,
    bath_temperature: float = 0.1,
    external_generation: ExternalGenerationSpec | None = None,
    initial_condition_spec: InitialConditionSpec | None = None,
    gap_expression: str = "",
    precomputed: dict | None = None,
    pauli_warn_threshold: float | None = 0.5,
    pauli_error_threshold: float | None = 1.0,
    enforce_pauli: bool = True,
    pauli_density_floor: float = 1e-18,
    freeze_phonon_dynamics: bool = False,
    phonon_history_out: dict[str, Any] | None = None,
    progress_callback: Callable[[float, np.ndarray], None] | None = None,
    *,
    diffusion_backend: str = "auto",
    dtype=None,
    pixel_chunk: int = DEFAULT_PIXEL_CHUNK,
    checkpointer=None,
    collision_backend: str = "auto",
    strang_mode: str = "auto",
    mesh=None,
    mesh_y_solve: str | None = None,
    frame_sink=None,
    snapshot_detail: str = "full",
) -> tuple:
    """Run an (optionally energy-resolved) masked 2D diffusion–collision sim.

    Reference-compatible entry point; see module docstring.  TPU-specific
    keyword-only extras: ``diffusion_backend`` ('auto'|'dense'|'adi'|'cg'|'wang'|'pallas'),
    ``dtype`` (defaults to f64 under x64, else f32), ``pixel_chunk``
    (collision chunking), ``mesh`` (a ``jax.sharding.Mesh`` with a 'space'
    axis: the hot loop is routed through the spatially sharded multi-chip
    step from :func:`qpsim_tpu.parallel.sharded.build_sharded_step` —
    ppermute halos + all_to_all pencil transposes — while snapshots,
    checkpoints, Pauli monitoring and generation keep their single-chip
    semantics; requires energy-resolved mode, ``enable_diffusion=True``
    and a grid divisible by the 'space' axis in both dimensions; all
    ``strang_mode`` values apply, merged composing the sharded step's
    pieces with one pixel-local collision substep per step) and
    ``strang_mode``:

    * ``"auto"`` (default) — ``"merged"`` wherever it applies (coupled
      diffusion+collision runs whose generation, if any, traces), else
      ``"exact"``.  Merged stepping costs ~60% of exact at production sizes
      for the same O(dt²) splitting order; reference-parity comparisons at
      1e-10 tolerances pin ``strang_mode="exact"`` explicitly (the parity
      tier), the same way f64 oracles pin ``dtype``.
    * ``"exact"`` — the reference's stepping, C(dt/2) D(dt) C(dt/2)
      every step (``/root/reference/qpsim/solver.py:1466-1475``).
    * ``"merged"`` — first-same-as-last fusion of adjacent collision
      half-steps *within each stored segment*: C(dt/2) [D C(dt)]^(L−1) D
      C(dt/2).  Same formal O(dt²) splitting order and identical cost at
      store_every=1, but ~half the collision work for long unstored
      stretches.  Snapshot states differ from ``"exact"`` only through the
      collision integrator's own O(dt²) sub-splitting error.  External
      generation composes: each g_ext(t_k)·dt is applied at its step's
      merged seam (just before the fused C(dt) the exact composition would
      split around), preserving the reference's per-step forward-Euler
      contract (``/root/reference/qpsim/solver.py:1459-1475``) to the same
      O(dt²) the merge already accepts — every step still injects exactly
      dt·g(t_k), evaluated at the exact-mode times, so pulse windows and
      injected totals match ``"exact"`` bit-for-bit; only the operator
      ordering differs.  Host-evaluated custom expressions (the rare
      non-traceable ones) still require ``strang_mode='exact'`` and raise
      ``ValueError``.

    ``frame_sink`` enables bounded-memory streaming of stored snapshots:
    every stored frame is handed to ``frame_sink.write(index, time_ns,
    frame=..., mass=..., energy_frames=..., phonon_frame=...,
    phonon_energy_frames=...)`` the moment it leaves the device (see
    :class:`qpsim_tpu.io.stream.FrameStreamWriter`) and is NOT kept in
    host memory: the return tuple then carries ``frames=[]`` and
    ``energy_frames=None`` (times, mass and color limits are still
    returned — they are tiny), and ``phonon_history_out`` receives empty
    frame lists with ``phonon_metadata['streamed']=True`` (energy-resolved
    mode; the scalar fixed-temperature scaffold is synthetic, not evolved
    state, and stays in the dict).  The reference
    has no equivalent — it holds every stored frame in RAM
    (``/root/reference/qpsim/solver.py:1479-1494``), which at production
    sizes forbids long frequently-stored runs outright.

    ``snapshot_detail="integrated"`` (energy-resolved mode) computes each
    stored snapshot's observables ON DEVICE — the energy-integrated 2D
    frame, per-bin pixel sums and the width-weighted phonon occupation
    frame — and pulls only those to the host instead of the full
    ``(NE, ny, nx)`` state (+ phonons): ~NE× less device→host traffic per
    snapshot (64 MB → ~8 MB at 1024²×16), which is what makes
    ``store_every=1`` live monitoring viable over slow links.  Per-bin
    frame histories are then not recorded (``energy_frames`` returns
    ``None``; ``phonon_history_out`` carries integrated frames only,
    ``phonon_metadata['detail']='integrated'``); a ``frame_sink`` receives
    ``energy_bin_sums``/``phonon_bin_sums`` vectors in place of per-bin
    frames, which is exactly what energy bookkeeping needs.  Values match
    the ``"full"`` snapshot reduction to roundoff in the REDUCTION dtype:
    f64 runs agree to f64 roundoff; f32 (TPU production) runs reduce on
    device in f32, so sums over ~10⁶ pixels differ from the full path's
    host-side f64 reduction at the f32 tree-reduction level (~1e-6
    relative — diagnostics-grade, not a solver input).  Checkpointing
    still pulls the full state — it IS the resume data.
    """
    if dt <= 0 or total_time <= 0:
        raise ValueError("dt and total_time must be positive.")
    if enable_diffusion and diffusion_coefficient <= 0:
        raise ValueError("Diffusion coefficient must be positive.")
    # on-disk compile cache: the in-process program cache below only helps
    # within one interpreter; Mosaic kernel compiles (28-129 s at 48-64 bins)
    # must be paid once per MACHINE, not per process
    maybe_enable_persistent_cache()
    if strang_mode not in ("auto", "exact", "merged"):
        raise ValueError(
            f"Unknown strang_mode: {strang_mode!r} (use 'auto', 'exact' or 'merged')"
        )
    if snapshot_detail not in ("full", "integrated"):
        raise ValueError(
            f"Unknown snapshot_detail: {snapshot_detail!r} (use 'full' or 'integrated')"
        )
    # explicit merged + host-evaluated generation is rejected at program
    # build time (only there is it known whether a custom expression traces);
    # 'auto' falls back to exact there instead
    if mesh is not None:
        if energy_gap <= 0.0:
            raise ValueError(
                "mesh= requires energy-resolved mode (energy_gap > 0); the "
                "scalar path is single-chip (use the ensemble API for "
                "data-parallel scalar sweeps)."
            )
        if not enable_diffusion:
            raise ValueError(
                "mesh= requires enable_diffusion=True: pure collision "
                "physics is pixel-local and needs no spatial sharding "
                "(use qpsim_tpu.parallel.ensemble for data parallelism)."
            )
        # strang_mode applies to the mesh path too: 'auto' resolves after
        # the generation program is built (same rule as single-chip), and
        # 'merged' composes the sharded step's pieces — one collision
        # substep per step, identical communication.
        if mesh_y_solve is None:
            mesh_y_solve = os.environ.get("QPSIM_MESH_Y_SOLVE", "pencil")
        if mesh_y_solve not in ("pencil", "wang"):
            raise ValueError(
                f"Unknown mesh_y_solve: {mesh_y_solve!r} (use 'pencil' or "
                "'wang'; also settable via QPSIM_MESH_Y_SOLVE)."
            )
    if store_every <= 0:
        store_every = 1
    mask = np.asarray(mask, dtype=bool)
    if initial_field.shape != mask.shape:
        raise ValueError("Initial field shape must match mask shape.")
    n_spatial = int(mask.sum())
    if n_spatial == 0:
        raise ValueError("Geometry mask has no interior points.")
    if phonon_history_out is not None:
        phonon_history_out.clear()
    tau_s_eff = float(tau_s if tau_s is not None else tau_0)
    tau_r_eff = float(tau_r if tau_r is not None else tau_0)
    if enable_scattering and tau_s_eff <= 0:
        raise ValueError("tau_s must be positive when scattering is enabled.")
    if enable_recombination and tau_r_eff <= 0:
        raise ValueError("tau_r must be positive when recombination is enabled.")
    if external_generation is not None:
        external_generation.validate()
    if dtype is None:
        dtype = default_dtype()

    full_steps, remainder_dt, total_steps = _split_time(total_time, dt)
    segments = _plan_segments(full_steps, remainder_dt, dt, store_every)

    if energy_gap > 0.0:
        return _run_energy_resolved(
            mask=mask,
            edges=edges,
            edge_conditions=edge_conditions,
            initial_field=initial_field,
            diffusion_coefficient=diffusion_coefficient,
            dt=dt,
            dx=dx,
            segments=segments,
            total_steps=total_steps,
            energy_gap=energy_gap,
            energy_min_factor=energy_min_factor,
            energy_max_factor=energy_max_factor,
            num_energy_bins=num_energy_bins,
            energy_weights=energy_weights,
            enable_diffusion=enable_diffusion,
            enable_recombination=enable_recombination,
            enable_scattering=enable_scattering,
            dynes_gamma=dynes_gamma,
            collision_solver=collision_solver,
            tau_s_eff=tau_s_eff,
            tau_r_eff=tau_r_eff,
            T_c=T_c,
            bath_temperature=bath_temperature,
            external_generation=external_generation,
            initial_condition_spec=initial_condition_spec,
            gap_expression=gap_expression,
            precomputed=precomputed,
            pauli_warn_threshold=pauli_warn_threshold,
            pauli_error_threshold=pauli_error_threshold,
            enforce_pauli=enforce_pauli,
            pauli_density_floor=pauli_density_floor,
            freeze_phonon_dynamics=freeze_phonon_dynamics,
            phonon_history_out=phonon_history_out,
            progress_callback=progress_callback,
            diffusion_backend=diffusion_backend,
            dtype=dtype,
            pixel_chunk=pixel_chunk,
            checkpointer=checkpointer,
            collision_backend=collision_backend,
            strang_mode=strang_mode,
            mesh=mesh,
            mesh_y_solve=mesh_y_solve,
            frame_sink=frame_sink,
            snapshot_detail=snapshot_detail,
        )

    # scalar mode: the state IS the integrated field, so "integrated" and
    # "full" coincide — the flag is validated above and needs no plumbing
    return _run_scalar(
        mask=mask,
        edges=edges,
        edge_conditions=edge_conditions,
        initial_field=initial_field,
        diffusion_coefficient=diffusion_coefficient,
        dx=dx,
        segments=segments,
        enable_diffusion=enable_diffusion,
        bath_temperature=bath_temperature,
        phonon_history_out=phonon_history_out,
        progress_callback=progress_callback,
        diffusion_backend=diffusion_backend,
        dtype=dtype,
        checkpointer=checkpointer,
        frame_sink=frame_sink,
    )


def _notify(progress_callback, t: float, frame: np.ndarray) -> None:
    if progress_callback is None:
        return
    try:
        progress_callback(float(t), np.array(frame, copy=True))
    except Exception:
        pass


def _color_limits(frames: list[np.ndarray]) -> list[float]:
    return widen_color_limits(
        float(np.nanmin(np.stack(frames))), float(np.nanmax(np.stack(frames)))
    )


def _limits_from_running(limits: list[float]) -> list[float]:
    """Color limits from a streaming-mode running [vmin, vmax] pair."""
    return widen_color_limits(limits[0], limits[1])


def _usable_resume_prefix(checkpointer, segments) -> list[dict]:
    """Checkpoints this run's segment plan can replay: the aligned prefix.

    A run interrupted at a horizon that is not a store_every multiple wrote
    a forced final-step snapshot (the always-store-the-final-step contract,
    ``/root/reference/qpsim/solver.py:1479``) at a step the longer-horizon
    resume would never store.  Naively replaying it desynchronizes the
    segment skip logic — snapshots land off their boundaries and part of a
    segment is integrated twice.  Only the prefix whose steps match this
    plan's stored boundaries is usable; everything past it is discarded
    (and recomputed by the continuing run).
    """
    steps = checkpointer.all_steps()
    if not steps:
        return []
    boundaries = [0]
    cum = 0
    for seg in segments:
        cum += seg.length
        if seg.stored:
            boundaries.append(cum)
    # restore lazily, stopping at the first misalignment: checkpoints past
    # the break (possibly dozens of full device states) are discarded
    # without ever being read
    usable: list[dict] = []
    for i, s in enumerate(steps):
        if s != i or i >= len(boundaries):
            break
        payload = checkpointer.restore(s)
        if payload["step"] != boundaries[i]:
            break
        usable.append(payload)
    checkpointer.discard_from(len(usable))
    return usable


# --------------------------------------------------------------------------
# scalar (energy-integrated) mode
# --------------------------------------------------------------------------


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


# --------------------------------------------------------------------------
# energy-resolved mode
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# energy-resolved mode: cross-call compiled-program cache
# --------------------------------------------------------------------------
#
# ``run_2d_crank_nicolson`` used to rebuild (and therefore re-jit) its
# segment runners on every call — minutes of remote-TPU compile per call at
# 1024²×16 (the reference GUI runs the same setup again and again,
# /root/reference/qpsim/ui/main_app.py:1873).  The compiled program depends
# only on the *configuration* (geometry, BCs, energy grid, kernels, toggles,
# dtype), not on the initial state or run length, so it is cached at module
# level keyed on a fingerprint of exactly those inputs; a second run with
# the same setup compiles nothing (tests/test_engine.py asserts zero new
# traces via ``engine_trace_count``).

_TRACE_EVENTS = 0  # incremented whenever a segment/step body is traced


def engine_trace_count() -> int:
    """Number of segment-runner traces since import (test/diagnostic hook)."""
    return _TRACE_EVENTS


@dataclass
class _EngineProgram:
    pmap: Any
    segment_runner: Callable  # (seg_dt, length) -> compiled segment fn
    single_step: Callable  # (seg_dt,) -> compiled one-step fn
    pauli_stats_jit: Callable
    host_gen: bool
    q_sharding: Any = None  # set in mesh mode: expected state placement
    ph_sharding: Any = None


_PROGRAM_CACHE: "OrderedDict[str, _EngineProgram]" = OrderedDict()
_PROGRAM_CACHE_MAX = 4
_PROGRAM_CACHE_LOCK = threading.Lock()


def clear_engine_program_cache() -> None:
    """Drop all cached compiled programs (frees their captured device arrays)."""
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE.clear()


def _hash_update_array(h, a) -> None:
    a = np.ascontiguousarray(a)
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(a.tobytes())


def _engine_program_key(
    *,
    mask,
    edges,
    edge_conditions,
    dx,
    dtype,
    gap,
    E_bins,
    dE,
    num_energy_bins,
    diffusion_coefficient,
    enable_diffusion,
    diffusion_backend,
    precomputed,
    nonuniform_gap,
    enable_recombination,
    enable_scattering,
    dynes_gamma,
    tau_s_eff,
    tau_r_eff,
    T_c,
    freeze_phonon_dynamics,
    collision_backend,
    pixel_chunk,
    external_generation,
    pauli_density_floor,
    strang_mode,
    mesh=None,
    mesh_y_solve="pencil",
) -> str:
    h = hashlib.sha256()

    def put(*vals):
        h.update(repr(vals).encode())

    put(
        "engine-program-v1",
        jax.default_backend(),
        str(jnp.dtype(dtype)),
        bool(jax.config.jax_enable_x64),
        mask.shape,
        float(dx),
        float(gap),
        float(dE),
        int(num_energy_bins),
        float(diffusion_coefficient),
        bool(enable_diffusion),
        str(diffusion_backend),
        bool(nonuniform_gap),
        bool(enable_recombination),
        bool(enable_scattering),
        float(dynes_gamma),
        float(tau_s_eff),
        float(tau_r_eff),
        float(T_c),
        bool(freeze_phonon_dynamics),
        str(collision_backend),
        int(pixel_chunk),
        float(pauli_density_floor),
        str(strang_mode),
    )
    if mesh is not None:
        put(
            "mesh",
            tuple(mesh.shape.items()),
            tuple((int(d.id), str(d.platform)) for d in np.asarray(mesh.devices).flat),
            str(mesh_y_solve),
        )
    _hash_update_array(h, np.packbits(np.asarray(mask, dtype=bool)))
    _hash_update_array(h, np.asarray(E_bins, dtype=np.float64))
    for e in edges:
        put(
            e.edge_id,
            e.x0,
            e.y0,
            e.x1,
            e.y1,
            e.normal,
            tuple((f.row, f.col, f.direction) for f in e.faces),
        )
    for eid in sorted(edge_conditions):
        bc = edge_conditions[eid]
        put(eid, bc.kind, bc.value, bc.aux_value)
    if external_generation is not None:
        put(
            external_generation.mode,
            external_generation.rate,
            external_generation.pulse_start,
            external_generation.pulse_duration,
            external_generation.pulse_rate,
            external_generation.custom_body,
        )
        for k in sorted(external_generation.custom_params):
            v = external_generation.custom_params[k]
            if isinstance(v, np.ndarray):
                put("param-array", k)
                _hash_update_array(h, v)
            else:
                put(k, v)
    if precomputed is not None:
        put("precomputed", bool(np.asarray(precomputed.get("is_uniform", True)).reshape(-1)[0]))
        _hash_update_array(h, np.asarray(precomputed["D_array"], dtype=np.float64))
        if "gap_values" in precomputed:
            _hash_update_array(h, np.asarray(precomputed["gap_values"], dtype=np.float64))
    return h.hexdigest()


def _get_engine_program(**kw) -> _EngineProgram:
    key = _engine_program_key(**kw)
    with _PROGRAM_CACHE_LOCK:
        prog = _PROGRAM_CACHE.get(key)
        if prog is not None:
            _PROGRAM_CACHE.move_to_end(key)
            return prog
    prog = _build_engine_program(**kw)
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE[key] = prog
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    return prog


def _build_engine_program(
    *,
    mask,
    edges,
    edge_conditions,
    dx,
    dtype,
    gap,
    E_bins,
    dE,
    num_energy_bins,
    diffusion_coefficient,
    enable_diffusion,
    diffusion_backend,
    precomputed,
    nonuniform_gap,
    enable_recombination,
    enable_scattering,
    dynes_gamma,
    tau_s_eff,
    tau_r_eff,
    T_c,
    freeze_phonon_dynamics,
    collision_backend,
    pixel_chunk,
    external_generation,
    pauli_density_floor,
    strang_mode,
    mesh=None,
    mesh_y_solve="pencil",
) -> _EngineProgram:
    ny, nx = mask.shape
    n_spatial = int(mask.sum())
    has_precomp = precomputed is not None
    if has_precomp:
        D_array = np.asarray(precomputed["D_array"], dtype=np.float64)  # (NE, P)
    else:
        D_array = diffusion_coefficient_of_energy(diffusion_coefficient, E_bins, gap)[
            :, None
        ] * np.ones((1, n_spatial))

    # --- diffusion backend -------------------------------------------------
    backend = None
    if enable_diffusion:
        x_st, y_st = build_directional_stencils(mask, edges, edge_conditions, dx)
        if nonuniform_gap:
            D_dense = np.zeros((num_energy_bins, ny, nx), dtype=np.float64)
            D_dense[:, mask] = D_array
            op = fold_diffusion(x_st, y_st, mask, dx, D_dense)
        else:
            op = fold_diffusion(x_st, y_st, mask, dx, D_array[:, 0])
        # mesh mode builds its own local solves inside the sharded step
        backend = None if mesh is not None else choose_backend(op, dtype, diffusion_backend)

    # --- collision data ------------------------------------------------------
    pmap = build_phonon_frequency_map(E_bins)
    omega_bins = pmap.omega_bins
    collisions_on = bool(enable_recombination or enable_scattering)

    if nonuniform_gap:
        gap_values = np.asarray(
            precomputed.get("gap_values", np.full(n_spatial, gap)), dtype=np.float64
        )
    else:
        gap_values = np.full(n_spatial, gap, dtype=np.float64)
    unique_gaps = np.unique(gap_values)
    gap_lookup = np.searchsorted(unique_gaps, gap_values)
    gap_id = np.zeros((ny, nx), dtype=np.int32)
    gap_id[mask] = gap_lookup.astype(np.int32)

    # --- collision backend dispatch (decided early: the analytic-gap kernel
    # makes the (G, NE, NE) per-gap stacks and the XLA gather plan
    # unnecessary, and for continuous gap maps they would not fit) ---------
    use_pallas_collisions = False
    use_analytic_collisions = False
    if collisions_on and collision_backend in ("auto", "pallas"):
        from ..ops.pallas_collisions import (
            pallas_analytic_collisions_supported,
            pallas_collisions_supported,
        )

        on_tpu = jax.default_backend() == "tpu"
        # Mosaic has no practical f64 support — an x64 run forced onto TPU
        # stays on the XLA integrator (f64 there is already emulated/slow)
        dtype_ok = jnp.dtype(dtype) != jnp.float64 or jax.default_backend() != "tpu"
        supported = pallas_collisions_supported(E_bins, int(unique_gaps.size))
        # continuous gap maps (G beyond the table-blend bound): exact
        # per-pixel kernels evaluated from Δ² in the analytic kernel
        # (pair-unrolled ≤ 64 bins, block-gridded beyond — the latter's
        # envelope is prechecked exactly so the dispatch never falls back
        # to the (G≈Npix, NE, NE) per-unique-gap stacks)
        from ..ops.pallas_collisions_blocked import pallas_blocked_analytic_supported

        analytic_ok = int(unique_gaps.size) > 8 and (
            pallas_analytic_collisions_supported(E_bins)
            or pallas_blocked_analytic_supported(E_bins, pmap)
        )
        if collision_backend == "pallas" and not ((supported or analytic_ok) and dtype_ok):
            reason = (
                "float64 on TPU is not supported by the kernel"
                if supported or analytic_ok
                else "the configuration is outside the kernel's envelope "
                "(needs a uniform energy grid, 2-256 bins; >8 unique gaps "
                "additionally needs unsplit ω diagonals above 64 bins)"
            )
            raise ValueError(f"collision_backend='pallas' requested but {reason}")
        use_pallas_collisions = (
            (collision_backend == "pallas" or on_tpu) and dtype_ok and supported
        )
        use_analytic_collisions = (
            (collision_backend == "pallas" or on_tpu)
            and dtype_ok
            and not supported
            and analytic_ok
        )
    elif collision_backend not in ("auto", "pallas", "xla"):
        raise ValueError(f"Unknown collision backend: {collision_backend!r}")

    if use_analytic_collisions:
        # continuous gap maps: G ~ Npix, so the per-unique-gap stacks would
        # loop for seconds and hold (G, NE, NE) arrays; the analytic kernel
        # needs none of them, and the Pauli ρ plane comes from the
        # vectorized per-pixel DOS instead
        rho_by_gap = None
        rho_per_pixel = dynes_density_of_states_per_pixel(
            E_bins, gap_values, dynes_gamma
        )
        K_r0_by_gap = K_s0_by_gap = None
        plan = None
    else:
        # The gather path materialises one (NE, NE) table per unique gap
        # and per channel — for continuous gap maps G ≈ Npix and the stacks
        # explode (the reference's unique-gap cache, solver.py:1203-1232,
        # has the same blow-up).  Refuse with guidance instead of thrashing.
        n_channels = 1 + int(enable_recombination) + int(enable_scattering)
        stack_bytes = int(unique_gaps.size) * num_energy_bins * num_energy_bins * 8 * n_channels
        if collisions_on and stack_bytes > 4 << 30:
            raise ValueError(
                f"{unique_gaps.size} unique gap values x {num_energy_bins} "
                f"bins needs ~{stack_bytes / 2**30:.0f} GB of per-gap kernel "
                "tables on the XLA collision path. Continuous gap maps "
                "should use the analytic Pallas kernels instead: run on TPU "
                "or pass collision_backend='pallas' (needs a uniform energy "
                "grid; above 64 bins also unsplit ω diagonals)."
            )
        rho_by_gap = np.stack(
            [dynes_density_of_states(E_bins, float(g), dynes_gamma) for g in unique_gaps]
        )
        rho_per_pixel = rho_by_gap[gap_lookup].T
        K_r0_by_gap = (
            np.stack(
                [recombination_kernel_base(E_bins, float(g), tau_r_eff, T_c) for g in unique_gaps]
            )
            if enable_recombination
            else None
        )
        K_s0_by_gap = (
            np.stack(
                [scattering_kernel_base(E_bins, float(g), tau_s_eff, T_c) for g in unique_gaps]
            )
            if enable_scattering
            else None
        )

        plan = build_collision_plan_arrays(
            dE=dE,
            rho_by_gap=rho_by_gap,
            K_r0_by_gap=K_r0_by_gap,
            K_s0_by_gap=K_s0_by_gap,
            gap_id=gap_id,
            pmap=pmap,
            enable_recombination=enable_recombination,
            enable_scattering=enable_scattering,
            update_phonons=not freeze_phonon_dynamics,
            dtype=dtype,
            pixel_chunk=pixel_chunk,
        )
    rho_state_np = np.zeros((num_energy_bins, ny, nx), dtype=np.float64)
    rho_state_np[:, mask] = rho_per_pixel
    pauli_stats_fn, pauli_aux = make_pauli_stats_fn(
        jnp.asarray(rho_state_np, dtype=dtype), pauli_density_floor
    )
    # --- generation --------------------------------------------------------------
    gen = build_generation_program(external_generation, E_bins, mask, dtype)
    if strang_mode == "auto":
        # merged wherever it applies; the segment runner itself degenerates
        # to the exact composition when there are no collisions, no
        # diffusion, or single-step segments
        strang_mode = "exact" if gen.host_mode else "merged"
    if strang_mode == "merged" and gen.host_mode:
        raise ValueError(
            "strang_mode='merged' cannot be combined with a host-evaluated "
            "custom generation expression: the fused segment has no per-step "
            "host boundary to evaluate it at.  Use strang_mode='exact' (or a "
            "traceable expression)."
        )
    # Spatially/spectrally uniform traced generation (constant/pulse) fuses
    # into the pallas collision kernel's VMEM pre-add (gen_input=True):
    # the reference's forward-Euler n += dt·g (solver.py:1459-1464) lands on
    # the already-resident tile instead of paying a full state HBM
    # round-trip as a standalone XLA add (~0.27 ms at 1024²×16).
    fuse_gen_wanted = (
        gen.scalar_amp_fn is not None
        and collisions_on
        and (use_pallas_collisions or use_analytic_collisions)
    )
    gen_mask_plane = jnp.asarray(mask, dtype=dtype)

    def make_gen_helpers(seg_dt: float):
        """One pair of dt·g helpers shared by the single-chip and mesh
        segment runners (they must never diverge).  ``gaux`` is the dtype
        mask plane, a jit ARGUMENT per the remote-TPU aux rule — closing
        over a device array would embed it as an MLIR constant and pay a
        host fetch per segment compile."""

        def gen_plane(t, gaux):
            """dt·g as a (Ny, Nx) plane + validity flags (scalar-amp modes).

            Scalar-mode flags are equivalent to the array-mode ones: the
            masked array is amp·mask, so any nonfinite/negative masked cell
            ⇔ nonfinite/negative amp (the mask is never empty)."""
            amp = jnp.asarray(seg_dt, dtype) * gen.scalar_amp_fn(t)
            return amp * gaux, ~jnp.isfinite(amp), amp < 0

        def gen_add(qq, t, gaux):
            """Forward-Euler g_ext injection + on-device validity flags."""
            g = gen.traced_fn(t)
            g_masked = jnp.where(gaux > 0, g, 0.0)
            return (
                qq + seg_dt * g,
                ~jnp.all(jnp.isfinite(g_masked)),
                jnp.any(g_masked < 0),
            )

        return gen_plane, gen_add

    def make_col(dt_col: float, gen_input: bool = False):
        if not collisions_on:
            return None
        if use_pallas_collisions:
            from ..ops.pallas_collisions import build_pallas_collision_step

            single = int(unique_gaps.size) == 1
            step = build_pallas_collision_step(
                E_bins=E_bins,
                dE=dE,
                rho=rho_by_gap[0] if single else rho_by_gap,
                K_s0=(
                    None
                    if K_s0_by_gap is None
                    else (K_s0_by_gap[0] if single else K_s0_by_gap)
                ),
                K_r0=(
                    None
                    if K_r0_by_gap is None
                    else (K_r0_by_gap[0] if single else K_r0_by_gap)
                ),
                pmap=pmap,
                dt=dt_col,
                update_phonons=not freeze_phonon_dynamics,
                interpret=jax.default_backend() != "tpu",
                gap_id=None if single else gap_id,
                gen_input=gen_input,
            )
            if step is not None:
                return step
        if use_analytic_collisions:
            from ..ops.pallas_collisions import build_pallas_collision_step_analytic

            gap_plane = np.full((ny, nx), gap, dtype=np.float64)
            gap_plane[mask] = gap_values
            step = build_pallas_collision_step_analytic(
                E_bins=E_bins,
                dE=dE,
                gap_plane=gap_plane,
                pmap=pmap,
                dt=dt_col,
                tau_s=tau_s_eff if enable_scattering else None,
                tau_r=tau_r_eff if enable_recombination else None,
                T_c=T_c,
                dynes_gamma=dynes_gamma,
                update_phonons=not freeze_phonon_dynamics,
                interpret=jax.default_backend() != "tpu",
                gen_input=gen_input,
            )
            if step is not None:
                return step
            # NE > 64: the block-gridded analytic kernel carries the same
            # Δ²-affine identity beyond the pair-unroll envelope
            from ..ops.pallas_collisions_blocked import (
                build_pallas_collision_step_blocked_analytic,
            )

            step = build_pallas_collision_step_blocked_analytic(
                E_bins=E_bins,
                dE=dE,
                gap_plane=gap_plane,
                pmap=pmap,
                dt=dt_col,
                tau_s=tau_s_eff if enable_scattering else None,
                tau_r=tau_r_eff if enable_recombination else None,
                T_c=T_c,
                dynes_gamma=dynes_gamma,
                update_phonons=not freeze_phonon_dynamics,
                interpret=jax.default_backend() != "tpu",
            )
            if step is not None:
                return step
        if plan is None:  # analytic dispatch never falls through in-envelope
            raise RuntimeError(
                "Internal error: no collision integrator available for this "
                "configuration (analytic kernel unavailable and no XLA plan)."
            )
        return make_collision_step(plan, dt_col)

    # --- compiled segment runners -------------------------------------------------
    # TPU while-loops pay a fixed per-iteration cost that scales with the
    # carry size (back-edge buffer copies: ~2.9 ms at 1024²×16 QP+phonon
    # carries); unrolling the scan body amortizes it — measured collision
    # substeps 4.8 → 2.3 ms and full coupled steps 7.6 → 5.2 ms at
    # unroll=8 on 1024²×16.  Gated on carry size so small-grid (CPU test)
    # compile times are unaffected.
    # measured optimum shifts with carry size: 32 at 1024²-class carries
    # (5.01 vs 5.27 ms/step at 8 — the residual F/u keeps shrinking and
    # XLA's cached kernels make the extra unroll cheap to compile),
    # 4 at 256²-class (unroll=8 regresses there — 0.374 vs 0.302 ms/step)
    _carry_elems = n_spatial * (num_energy_bins + pmap.num_omega)
    scan_unroll = (
        32 if _carry_elems >= (1 << 24) else (4 if _carry_elems >= (1 << 20) else 1)
    )
    seg_cache: dict[tuple[float, int], Callable] = {}

    if mesh is not None:
        # --- multi-chip: route the hot loop through the sharded step --------
        # Same C(dt/2) D(dt) C(dt/2) composition (ppermute halos +
        # all_to_all pencil transposes over the 'space' axis); generation
        # and Pauli statistics stay in the scan body as plain jnp ops, which
        # GSPMD partitions against the sharded state automatically.
        from ..parallel.sharded import build_sharded_step

        if collisions_on:
            if int(unique_gaps.size) == 1:
                mesh_collisions = dict(
                    E_bins=E_bins, dE=dE, rho=rho_by_gap[0], pmap=pmap,
                    K_r0=None if K_r0_by_gap is None else K_r0_by_gap[0],
                    K_s0=None if K_s0_by_gap is None else K_s0_by_gap[0],
                    enable_recombination=enable_recombination,
                    enable_scattering=enable_scattering,
                    update_phonons=not freeze_phonon_dynamics,
                    pixel_chunk=pixel_chunk,
                )
            else:
                gap_plane = np.full((ny, nx), gap, dtype=np.float64)
                gap_plane[mask] = gap_values
                mesh_collisions = dict(
                    E_bins=E_bins, dE=dE, pmap=pmap, gap_plane=gap_plane,
                    tau_s=tau_s_eff, tau_r=tau_r_eff, T_c=T_c,
                    dynes_gamma=dynes_gamma,
                    enable_recombination=enable_recombination,
                    enable_scattering=enable_scattering,
                    update_phonons=not freeze_phonon_dynamics,
                    pixel_chunk=pixel_chunk,
                )
        else:
            mesh_collisions = None

        sharded_cache: dict[float, Any] = {}
        # uniform traced generation (constant/pulse) injects inside the
        # shard: fused into the collision kernels where they take a gen
        # input, an in-shard pre-add otherwise — either way the grow plane
        # is computed from the scalar amp per step, not a full g array
        fuse_gen_mesh = gen.scalar_amp_fn is not None
        # merged Strang over the mesh composes the sharded step's pieces
        # (C(dt/2) [D C(dt)]^(L−1) D C(dt/2)): one pixel-local collision
        # substep per step instead of two, communication unchanged
        merged_mesh = strang_mode == "merged" and collisions_on

        # cross-shard y-sweep strategy (validated at the engine surface):
        # 'pencil' (all_to_all transposes, the measured-on-hardware
        # default) or 'wang' (distributed Wang partition, ~40x less ICI
        # traffic by the model — opt-in until a real multi-chip slice can
        # arbitrate)

        def get_sharded(seg_dt: float):
            if seg_dt not in sharded_cache:
                sharded_cache[seg_dt] = build_sharded_step(
                    mesh, op, seg_dt, dx=dx, collisions=mesh_collisions,
                    dtype=dtype, gen_input=fuse_gen_mesh, pieces=merged_mesh,
                    y_solve=mesh_y_solve,
                )
            return sharded_cache[seg_dt]

        def segment_runner_mesh(seg_dt: float, length: int):
            key = (seg_dt, length)
            if key in seg_cache:
                return seg_cache[key]
            sh = get_sharded(seg_dt)
            merged_m = (
                merged_mesh and length > 1 and sh.apply_diffuse is not None
            )

            gen_plane, gen_add = make_gen_helpers(seg_dt)

            def run(qq, pp, t_start, paux, shaux, gaux):
                global _TRACE_EVENTS
                _TRACE_EVENTS += 1
                no = jnp.asarray(False)

                def body(carry, idx):
                    qq, pp, t0 = carry
                    t = t0 + idx.astype(t0.dtype) * seg_dt
                    gen_nonfinite = no
                    gen_negative = no
                    if fuse_gen_mesh:
                        grow, gen_nonfinite, gen_negative = gen_plane(t, gaux)
                        qq, pp, _mass = sh.apply(qq, pp, grow, *shaux)
                    else:
                        if gen.traced_fn is not None:
                            qq, gen_nonfinite, gen_negative = gen_add(qq, t, gaux)
                        qq, pp, _mass = sh.apply(qq, pp, *shaux)
                    stats = pauli_stats_fn(qq, paux)
                    return (qq, pp, t0), stats + (gen_nonfinite, gen_negative)

                def run_merged(qq, pp, t_start):
                    # same seam semantics as the single-chip merged runner:
                    # step k's dt·g(t_k) injects just before its collision
                    # substep, evaluated at the exact-mode times
                    raw, src = shaux
                    gnf0 = gng0 = no
                    if fuse_gen_mesh:
                        grow0, gnf0, gng0 = gen_plane(t_start, gaux)
                        qq, pp = sh.apply_col_half_gen(qq, pp, grow0, raw)
                    elif gen.traced_fn is not None:
                        qq, gnf0, gng0 = gen_add(qq, t_start, gaux)
                        qq, pp = sh.apply_col_half(qq, pp, raw)
                    else:
                        qq, pp = sh.apply_col_half(qq, pp, raw)

                    def body_m(carry, idx):
                        qq, pp, t0 = carry
                        qq = sh.apply_diffuse(qq, raw, src)
                        gnf = gng = no
                        if fuse_gen_mesh:
                            t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                            grow, gnf, gng = gen_plane(t, gaux)
                            qq, pp = sh.apply_col_full_gen(qq, pp, grow, raw)
                        elif gen.traced_fn is not None:
                            t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                            qq, gnf, gng = gen_add(qq, t, gaux)
                            qq, pp = sh.apply_col_full(qq, pp, raw)
                        else:
                            qq, pp = sh.apply_col_full(qq, pp, raw)
                        stats = pauli_stats_fn(qq, paux)
                        return (qq, pp, t0), stats + (gnf, gng)

                    (qq, pp, _), stats = jax.lax.scan(
                        body_m, (qq, pp, t_start), jnp.arange(length - 1),
                        unroll=min(scan_unroll, length - 1),
                    )
                    qq = sh.apply_diffuse(qq, raw, src)
                    qq, pp = sh.apply_col_half(qq, pp, raw)
                    last = pauli_stats_fn(qq, paux) + (no, no)
                    stats = list(
                        jnp.concatenate([s, jnp.asarray(l)[None]])
                        for s, l in zip(stats, last)
                    )
                    stats[4] = stats[4].at[0].set(stats[4][0] | gnf0)
                    stats[5] = stats[5].at[0].set(stats[5][0] | gng0)
                    return qq, pp, tuple(stats)

                if merged_m:
                    return run_merged(qq, pp, t_start)

                (qq, pp, _), stats = jax.lax.scan(
                    body, (qq, pp, t_start), jnp.arange(length), length=length,
                    unroll=min(scan_unroll, length),
                )
                return qq, pp, stats

            jit_run = jax.jit(run)
            seg_cache[key] = lambda qq, pp, t: jit_run(
                qq, pp, t, pauli_aux, sh.aux, gen_mask_plane
            )
            return seg_cache[key]

        single_step_cache_m: dict[float, Callable] = {}

        def single_step_mesh(seg_dt: float):
            if seg_dt not in single_step_cache_m:
                sh = get_sharded(seg_dt)

                def one(qq, pp, paux, shaux):
                    global _TRACE_EVENTS
                    _TRACE_EVENTS += 1
                    qq, pp, _mass = sh.apply(qq, pp, *shaux)
                    return qq, pp, pauli_stats_fn(qq, paux)

                jit_one = jax.jit(one)
                single_step_cache_m[seg_dt] = (
                    lambda qq, pp: jit_one(qq, pp, pauli_aux, sh.aux)
                )
            return single_step_cache_m[seg_dt]

        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import SPACE_AXIS

        rows_sharding = NamedSharding(mesh, P(None, SPACE_AXIS, None))
        return _EngineProgram(
            pmap=pmap,
            segment_runner=segment_runner_mesh,
            single_step=single_step_mesh,
            pauli_stats_jit=(lambda _j: (lambda q: _j(q, pauli_aux)))(jax.jit(pauli_stats_fn)),
            host_gen=gen.host_mode,
            q_sharding=rows_sharding,
            ph_sharding=rows_sharding,
        )

    def segment_runner(seg_dt: float, length: int):
        key = (seg_dt, length)
        if key in seg_cache:
            return seg_cache[key]
        col_half = make_col(0.5 * seg_dt)
        col_full = make_col(seg_dt)
        # fusion only holds if the gen-enabled build stays on a kernel that
        # takes a gen input (NE beyond the pair-unroll cap dispatches to the
        # blocked kernel, which doesn't) — probe with the half-step build
        # before paying for the full-step variant
        col_half_gen = make_col(0.5 * seg_dt, gen_input=True) if fuse_gen_wanted else None
        fuse_gen = fuse_gen_wanted and getattr(col_half_gen, "takes_gen", False)
        col_full_gen = make_col(seg_dt, gen_input=True) if fuse_gen else None
        if backend is not None:
            # aux holds backend data too large for the compile payload
            # (e.g. prefactored solves); it crosses the jit boundary as an
            # argument and rides the scan as a loop invariant.
            diff_step, diff_aux = backend.make_step_aux(seg_dt)
        else:
            diff_step, diff_aux = None, ()

        merged = (
            strang_mode == "merged"
            and collisions_on
            and backend is not None
            and length > 1
        )

        gen_fused_plane, gen_apply = make_gen_helpers(seg_dt)

        def run(qq, pp, t_start, daux, paux, gaux):
            global _TRACE_EVENTS
            _TRACE_EVENTS += 1
            def body(carry, idx):
                qq, pp, t0 = carry
                t = t0 + idx.astype(t0.dtype) * seg_dt
                gen_nonfinite = jnp.asarray(False)
                gen_negative = jnp.asarray(False)
                if fuse_gen:
                    grow, gen_nonfinite, gen_negative = gen_fused_plane(t, gaux)
                    if diff_step is not None:
                        qq, pp = col_half_gen(qq, pp, grow)
                        qq = diff_step(qq, daux)
                        qq, pp = col_half(qq, pp)
                    else:
                        qq, pp = col_full_gen(qq, pp, grow)
                    stats = pauli_stats_fn(qq, paux)
                    return (qq, pp, t0), stats + (gen_nonfinite, gen_negative)
                if gen.traced_fn is not None:
                    qq, gen_nonfinite, gen_negative = gen_apply(qq, t, gaux)
                if collisions_on and diff_step is not None:
                    qq, pp = col_half(qq, pp)
                    qq = diff_step(qq, daux)
                    qq, pp = col_half(qq, pp)
                elif collisions_on:
                    qq, pp = col_full(qq, pp)
                elif diff_step is not None:
                    qq = diff_step(qq, daux)
                stats = pauli_stats_fn(qq, paux)
                return (qq, pp, t0), stats + (gen_nonfinite, gen_negative)

            def run_merged(qq, pp, t_start):
                # C(dt/2) [D C(dt)]^(L-1) D C(dt/2): the trailing half-step of
                # each Strang step is fused with the next step's leading half.
                # Generation (if traced) injects dt·g(t_k) at the exact-mode
                # times; step k>1's injection rides its seam — just before the
                # fused C(dt) the exact composition would split around it,
                # an O(dt²) reordering of the same operators.
                no = jnp.asarray(False)
                gnf0 = gng0 = no
                if fuse_gen:
                    grow0, gnf0, gng0 = gen_fused_plane(t_start, gaux)
                    qq, pp = col_half_gen(qq, pp, grow0)
                elif gen.traced_fn is not None:
                    qq, gnf0, gng0 = gen_apply(qq, t_start, gaux)
                    qq, pp = col_half(qq, pp)
                else:
                    qq, pp = col_half(qq, pp)

                def body_m(carry, idx):
                    qq, pp, t0 = carry
                    qq = diff_step(qq, daux)
                    gnf = gng = no
                    if fuse_gen:
                        t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                        grow, gnf, gng = gen_fused_plane(t, gaux)
                        qq, pp = col_full_gen(qq, pp, grow)
                    elif gen.traced_fn is not None:
                        t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                        qq, gnf, gng = gen_apply(qq, t, gaux)
                        qq, pp = col_full(qq, pp)
                    else:
                        qq, pp = col_full(qq, pp)
                    stats = pauli_stats_fn(qq, paux)
                    return (qq, pp, t0), stats + (gnf, gng)

                (qq, pp, _), stats = jax.lax.scan(
                    body_m, (qq, pp, t_start), jnp.arange(length - 1),
                    unroll=min(scan_unroll, length - 1),
                )
                qq = diff_step(qq, daux)
                qq, pp = col_half(qq, pp)
                last = pauli_stats_fn(qq, paux) + (no, no)
                stats = list(
                    jnp.concatenate([s, jnp.asarray(l)[None]])
                    for s, l in zip(stats, last)
                )
                # fold the pre-loop (step-1) generation flags into slot 0
                stats[4] = stats[4].at[0].set(stats[4][0] | gnf0)
                stats[5] = stats[5].at[0].set(stats[5][0] | gng0)
                return qq, pp, tuple(stats)

            if merged:
                return run_merged(qq, pp, t_start)

            (qq, pp, _), stats = jax.lax.scan(
                body, (qq, pp, t_start), jnp.arange(length), length=length,
                unroll=min(scan_unroll, length),
            )
            return qq, pp, stats

        jit_run = jax.jit(run)
        seg_cache[key] = lambda qq, pp, t: jit_run(
            qq, pp, t, diff_aux, pauli_aux, gen_mask_plane
        )
        return seg_cache[key]

    single_step_cache: dict[float, Callable] = {}

    def single_step(seg_dt: float):
        if seg_dt not in single_step_cache:
            col_half = make_col(0.5 * seg_dt)
            col_full = make_col(seg_dt)
            if backend is not None:
                diff_step, diff_aux = backend.make_step_aux(seg_dt)
            else:
                diff_step, diff_aux = None, ()

            def one(qq, pp, daux, paux):
                global _TRACE_EVENTS
                _TRACE_EVENTS += 1
                if collisions_on and diff_step is not None:
                    qq, pp = col_half(qq, pp)
                    qq = diff_step(qq, daux)
                    qq, pp = col_half(qq, pp)
                elif collisions_on:
                    qq, pp = col_full(qq, pp)
                elif diff_step is not None:
                    qq = diff_step(qq, daux)
                return qq, pp, pauli_stats_fn(qq, paux)

            jit_one = jax.jit(one)
            single_step_cache[seg_dt] = lambda qq, pp: jit_one(qq, pp, diff_aux, pauli_aux)
        return single_step_cache[seg_dt]
    return _EngineProgram(
        pmap=pmap,
        segment_runner=segment_runner,
        single_step=single_step,
        pauli_stats_jit=(lambda _j: (lambda q: _j(q, pauli_aux)))(jax.jit(pauli_stats_fn)),
        host_gen=gen.host_mode,
    )


def _run_energy_resolved(
    *,
    mask,
    edges,
    edge_conditions,
    initial_field,
    diffusion_coefficient,
    dt,
    dx,
    segments,
    total_steps,
    energy_gap,
    energy_min_factor,
    energy_max_factor,
    num_energy_bins,
    energy_weights,
    enable_diffusion,
    enable_recombination,
    enable_scattering,
    dynes_gamma,
    collision_solver,
    tau_s_eff,
    tau_r_eff,
    T_c,
    bath_temperature,
    external_generation,
    initial_condition_spec,
    gap_expression,
    precomputed,
    pauli_warn_threshold,
    pauli_error_threshold,
    enforce_pauli,
    pauli_density_floor,
    freeze_phonon_dynamics,
    phonon_history_out,
    progress_callback,
    diffusion_backend,
    dtype,
    pixel_chunk,
    checkpointer=None,
    collision_backend="auto",
    strang_mode="exact",
    mesh=None,
    mesh_y_solve="pencil",
    frame_sink=None,
    snapshot_detail="full",
):
    gap = float(energy_gap)
    ny, nx = mask.shape
    n_spatial = int(mask.sum())
    E_bins, dE = build_energy_grid(gap, energy_min_factor, energy_max_factor, num_energy_bins)
    normalize_collision_solver_name(collision_solver)

    custom_qp_state = None
    if initial_condition_spec is not None:
        custom_qp_state = build_initial_qp_energy_state(mask, E_bins, initial_condition_spec)

    # Auto-precompute diffusion arrays when a gap map is requested.
    if precomputed is None and str(gap_expression or "").strip():
        from ..io.precompute import precompute_arrays
        from ..models.params import SimulationParameters

        auto_params = SimulationParameters(
            diffusion_coefficient=diffusion_coefficient,
            dt=dt,
            total_time=max(dt, dt * max(1, total_steps)),
            mesh_size=dx,
            energy_gap=energy_gap,
            energy_min_factor=energy_min_factor,
            energy_max_factor=energy_max_factor,
            num_energy_bins=num_energy_bins,
            dynes_gamma=dynes_gamma,
            gap_expression=gap_expression,
            tau_0=0.5 * (tau_s_eff + tau_r_eff),
            tau_s=tau_s_eff,
            tau_r=tau_r_eff,
            T_c=T_c,
            bath_temperature=bath_temperature,
        )
        precomputed = precompute_arrays(
            mask, edges, edge_conditions, auto_params, include_collision_kernels=False
        )

    has_precomp = precomputed is not None
    nonuniform_gap = has_precomp and not bool(
        np.asarray(precomputed.get("is_uniform", True)).reshape(-1)[0]
    )

    # --- compiled program (module-level cross-call cache) -------------------
    prog = _get_engine_program(
        mask=mask,
        edges=edges,
        edge_conditions=edge_conditions,
        dx=dx,
        dtype=dtype,
        gap=gap,
        E_bins=E_bins,
        dE=dE,
        num_energy_bins=num_energy_bins,
        diffusion_coefficient=diffusion_coefficient,
        enable_diffusion=enable_diffusion,
        diffusion_backend=diffusion_backend,
        precomputed=precomputed,
        nonuniform_gap=nonuniform_gap,
        enable_recombination=enable_recombination,
        enable_scattering=enable_scattering,
        dynes_gamma=dynes_gamma,
        tau_s_eff=tau_s_eff,
        tau_r_eff=tau_r_eff,
        T_c=T_c,
        freeze_phonon_dynamics=freeze_phonon_dynamics,
        collision_backend=collision_backend,
        pixel_chunk=pixel_chunk,
        external_generation=external_generation,
        pauli_density_floor=pauli_density_floor,
        strang_mode=strang_mode,
        mesh=mesh,
        mesh_y_solve=mesh_y_solve,
    )
    pmap = prog.pmap
    omega_bins = pmap.omega_bins
    segment_runner = prog.segment_runner
    single_step = prog.single_step
    host_gen = prog.host_gen
    # --- initial states ------------------------------------------------------
    if custom_qp_state is not None:
        state_flat = np.asarray(custom_qp_state, dtype=np.float64)
        if state_flat.shape != (num_energy_bins, n_spatial):
            raise ValueError(
                "Full custom quasiparticle profile must have shape "
                f"({num_energy_bins}, {n_spatial}); got {state_flat.shape}."
            )
        if not np.all(np.isfinite(state_flat)):
            raise ValueError("Full custom quasiparticle profile produced non-finite values.")
        if np.any(state_flat < 0):
            raise ValueError("Full custom quasiparticle profile must be non-negative.")
    else:
        spatial_values = initial_field[mask].astype(np.float64)
        if energy_weights is not None:
            raw_w = np.asarray(energy_weights, dtype=np.float64)
            if raw_w.ndim != 1:
                raise ValueError("energy_weights must be a 1D array.")
            if raw_w.shape[0] != num_energy_bins:
                raise ValueError(
                    f"energy_weights must have length {num_energy_bins}, got {raw_w.shape[0]}."
                )
            if not np.all(np.isfinite(raw_w)):
                raise ValueError("energy_weights must contain only finite values.")
            if np.any(raw_w < 0):
                raise ValueError("energy_weights must be non-negative.")
            integral = float(np.sum(raw_w) * dE)
            weights = raw_w / integral if integral > 0 else np.full(
                num_energy_bins, 1.0 / (num_energy_bins * dE)
            )
        else:
            rho_w = dynes_density_of_states(E_bins, gap, dynes_gamma)
            integral = float(np.sum(rho_w) * dE)
            weights = rho_w / integral if integral > 0 else np.full(
                num_energy_bins, 1.0 / (num_energy_bins * dE)
            )
        state_flat = weights[:, None] * spatial_values[None, :]

    if initial_condition_spec is not None:
        phonon_flat = build_initial_phonon_energy_state(
            mask, omega_bins, initial_condition_spec, bath_temperature
        )
    else:
        phonon_flat = thermal_phonon_occupation(omega_bins, bath_temperature)[:, None] * np.ones(
            (1, n_spatial)
        )

    nw = omega_bins.size
    q_np = np.zeros((num_energy_bins, ny, nx), dtype=np.float64)
    q_np[:, mask] = state_flat
    ph_np = np.zeros((nw, ny, nx), dtype=np.float64)
    ph_np[:, mask] = phonon_flat
    q = jnp.asarray(q_np, dtype=dtype)
    ph = jnp.asarray(ph_np, dtype=dtype)
    if prog.q_sharding is not None:  # mesh mode: shard the state up front
        q = jax.device_put(q, prog.q_sharding)
        ph = jax.device_put(ph, prog.ph_sharding)

    # --- Pauli monitoring (stats fn lives in the cached program) ---------------
    enforcer = PauliEnforcer(
        E_bins=E_bins,
        grid_shape=(ny, nx),
        enforce=enforce_pauli,
        warn_threshold=pauli_warn_threshold,
        error_threshold=pauli_error_threshold,
    )
    init_stats = prog.pauli_stats_jit(q)
    enforcer.check(
        0,
        0.0,
        float(init_stats[0]),
        int(init_stats[1]),
        bool(init_stats[2]),
        int(init_stats[3]),
    )
    # --- snapshot bookkeeping -----------------------------------------------------
    record_phonons = phonon_history_out is not None
    phonon_widths = (
        integration_widths_from_centers(omega_bins, fallback_width=dE) if record_phonons else None
    )
    phonon_frames_hist: list[np.ndarray] = []
    phonon_energy_frames_hist: list[list[np.ndarray]] = []

    def compute_phonon_snapshot(ph_host: np.ndarray):
        interior = ph_host[:, mask]
        eframes = [reconstruct_field(mask, interior[i]) for i in range(nw)]
        integrated_occ = np.sum(interior * phonon_widths[:, None], axis=0)
        return reconstruct_field(mask, integrated_occ), eframes

    def snapshot(q_host: np.ndarray):
        interior = q_host[:, mask]
        integrated = np.sum(interior, axis=0) * dE
        frame = reconstruct_field(mask, integrated)
        energy_frame = [reconstruct_field(mask, interior[i]) for i in range(num_energy_bins)]
        m = float(np.sum(integrated) * dx * dx)
        return frame, energy_frame, m

    times: list[float] = []
    frames: list[np.ndarray] = []
    energy_frames: list[list[np.ndarray]] = []
    mass: list[float] = []
    running_limits = [float("inf"), float("-inf")]  # streaming-mode color limits
    current_time = 0.0
    step_counter = 0
    stored_idx = 0
    completed_steps = 0

    # --- light ("integrated") snapshots -----------------------------------------
    # the stored observables are reduced ON DEVICE and only the reductions
    # cross to the host: integrated 2D frame (already ×dE), per-bin pixel
    # sums, and — when recorded — the width-weighted phonon occupation
    # frame + per-ω pixel sums.  The mask rides along as a jit ARGUMENT
    # (a closed-over device array would be fetched back to host at
    # .lower() time — minutes over a remote tunnel).
    light = snapshot_detail == "integrated"
    if light:
        mask_f = jnp.asarray(mask, dtype=dtype)
        phw_f = (
            jnp.asarray(phonon_widths, dtype=dtype)[:, None, None] if record_phonons else None
        )

        @jax.jit
        def light_stats(q_dev, ph_dev, mask_a, phw_a):
            qm = q_dev * mask_a  # anything outside the mask must not leak in
            integrated = jnp.sum(qm, axis=0) * dE
            bin_sums = jnp.sum(qm, axis=(1, 2))
            if phw_a is None:
                return integrated, bin_sums, None, None
            phm = ph_dev * mask_a
            ph_int = jnp.sum(phm * phw_a, axis=0)
            ph_bin_sums = jnp.sum(phm, axis=(1, 2))
            return integrated, bin_sums, ph_int, ph_bin_sums

        def light_from_device(q_dev, ph_dev):
            return light_stats(q_dev, ph_dev, mask_f, phw_f)

        def light_from_host(q_host, ph_host):
            interior = q_host[:, mask]
            integrated = reconstruct_field(mask, np.sum(interior, axis=0) * dE)
            bin_sums = np.sum(interior, axis=1)
            ph_int = ph_bin_sums = None
            if record_phonons and ph_host is not None:
                ph_interior = ph_host[:, mask]
                ph_int = reconstruct_field(
                    mask, np.sum(ph_interior * phonon_widths[:, None], axis=0)
                )
                ph_bin_sums = np.sum(ph_interior, axis=1)
            return integrated, bin_sums, ph_int, ph_bin_sums

    def emit_light(t: float, vals) -> np.ndarray:
        integrated, bin_sums, ph_int, ph_bin_sums = vals
        idx = len(times)
        integrated = np.asarray(integrated, dtype=np.float64)
        bin_sums = np.asarray(bin_sums, dtype=np.float64)
        frame = np.where(mask, integrated, np.nan)
        m = float(np.sum(bin_sums) * dE * dx * dx)
        times.append(float(t))
        mass.append(m)
        ph_frame = (
            np.where(mask, np.asarray(ph_int, dtype=np.float64), np.nan)
            if ph_int is not None
            else None
        )
        if frame_sink is not None:
            running_limits[0] = min(running_limits[0], float(np.nanmin(frame)))
            running_limits[1] = max(running_limits[1], float(np.nanmax(frame)))
            frame_sink.write(
                idx,
                float(t),
                frame=frame,
                mass=m,
                phonon_frame=ph_frame,
                energy_bin_sums=bin_sums,
                phonon_bin_sums=(
                    np.asarray(ph_bin_sums, dtype=np.float64)
                    if ph_bin_sums is not None
                    else None
                ),
            )
        else:
            frames.append(frame)
            if ph_frame is not None:
                phonon_frames_hist.append(ph_frame)
        return frame

    def emit(t: float, q_host: np.ndarray, ph_host: np.ndarray | None) -> np.ndarray:
        # one stored snapshot: stream it to the sink or keep it, never both
        if light:
            return emit_light(t, light_from_host(q_host, ph_host))
        idx = len(times)
        frame, energy_frame, m = snapshot(q_host)
        times.append(float(t))
        mass.append(m)
        ph_frame, ph_eframes = (
            compute_phonon_snapshot(ph_host)
            if (record_phonons and ph_host is not None)
            else (None, None)
        )
        if frame_sink is not None:
            running_limits[0] = min(running_limits[0], float(np.nanmin(frame)))
            running_limits[1] = max(running_limits[1], float(np.nanmax(frame)))
            frame_sink.write(
                idx,
                float(t),
                frame=frame,
                mass=m,
                energy_frames=energy_frame,
                phonon_frame=ph_frame,
                phonon_energy_frames=ph_eframes,
            )
        else:
            frames.append(frame)
            energy_frames.append(energy_frame)
            if ph_frame is not None:
                phonon_frames_hist.append(ph_frame)
                phonon_energy_frames_hist.append(ph_eframes)
        return frame

    replay = _usable_resume_prefix(checkpointer, segments) if checkpointer is not None else []
    if replay:
        # Rebuild the stored history from checkpoints and continue the loop
        # from the last aligned one — results match an uninterrupted run
        # exactly.
        for payload in replay:
            emit(
                payload["time_ns"],
                np.asarray(payload["q"], dtype=np.float64),
                np.asarray(payload["ph"], dtype=np.float64) if "ph" in payload else None,
            )
        resume = replay[-1]
        q = jnp.asarray(resume["q"], dtype=dtype)
        if "ph" in resume:
            ph = jnp.asarray(resume["ph"], dtype=dtype)
        if prog.q_sharding is not None:
            q = jax.device_put(q, prog.q_sharding)
            ph = jax.device_put(ph, prog.ph_sharding)
        completed_steps = resume["step"]
        step_counter = completed_steps
        current_time = resume["time_ns"]
        # stored_idx advances through the skipped segments below, reaching
        # resume["stored_idx"] exactly when the replay is complete.
    else:
        frame0 = emit(0.0, q_np, ph_np)
        _notify(progress_callback, 0.0, frame0)
        if checkpointer is not None:
            checkpointer.save_step(0, step=0, time_ns=0.0, q=q_np, ph=ph_np)

    # --- main loop --------------------------------------------------------------
    # Segments are drained one behind their dispatch (depth-1 pipeline): the
    # next segment's scan is enqueued on the device BEFORE the previous
    # segment's stats/snapshot values are pulled to the host, so snapshot
    # extraction (a full-state device→host transfer per stored frame — over
    # a remote tunnel the dominant cost at small store_every) overlaps the
    # next segment's compute instead of serializing into the hot loop.
    # Drain order is program order, so frames/callbacks/checkpoints keep the
    # reference's exact sequence (/root/reference/qpsim/solver.py:1375-1379);
    # Pauli/generation errors still raise before the run returns, at their
    # recorded step numbers.
    gen_mode = external_generation.normalized_mode() if external_generation else "none"
    cumulative = 0

    def store_snapshot(t, step, q_dev, ph_dev, light_vals=None) -> None:
        nonlocal stored_idx
        stored_idx += 1
        if light:
            if light_vals is None:
                light_vals = light_from_device(q_dev, ph_dev)
            frame = emit_light(t, light_vals)
            _notify(progress_callback, t, frame)
            if checkpointer is not None:
                # the full state IS the resume data — light mode saves the
                # snapshot traffic, not the checkpoint traffic
                checkpointer.save_step(
                    stored_idx,
                    step=step,
                    time_ns=float(t),
                    q=np.asarray(q_dev, dtype=np.float64),
                    ph=np.asarray(ph_dev, dtype=np.float64),
                )
            return
        q_host = np.asarray(q_dev, dtype=np.float64)
        ph_host = np.asarray(ph_dev, dtype=np.float64)
        frame = emit(t, q_host, ph_host)
        _notify(progress_callback, t, frame)
        if checkpointer is not None:
            checkpointer.save_step(
                stored_idx, step=step, time_ns=float(t), q=q_host, ph=ph_host
            )

    def drain(p) -> None:
        stats_np = [np.asarray(s) for s in p["stats"]]
        t = p["t_start"]
        for i in range(p["seg"].length):
            t += p["seg"].dt
            if bool(stats_np[4][i]):
                raise ValueError(
                    f"External generation mode '{gen_mode}' produced non-finite values."
                )
            if bool(stats_np[5][i]):
                raise ValueError(
                    f"External generation mode '{gen_mode}' produced negative values. "
                    "Generation rates must be non-negative."
                )
            enforcer.check(
                p["step_start"] + i + 1,
                t,
                float(stats_np[0][i]),
                int(stats_np[1][i]),
                bool(stats_np[2][i]),
                int(stats_np[3][i]),
            )
        if p["seg"].stored:
            store_snapshot(
                t, p["step_start"] + p["seg"].length, p["q"], p["ph"], p.get("light")
            )

    pending = None
    for seg in segments:
        if cumulative + seg.length <= completed_steps:
            cumulative += seg.length
            if seg.stored:
                stored_idx += 1
            continue
        cumulative += seg.length
        if host_gen:
            # host-evaluated generation needs the host between every step —
            # inherently sequential, no pipelining
            for _ in range(seg.length):
                g_host = evaluate_generation_host(
                    external_generation, E_bins, n_spatial, current_time, mask
                )
                if g_host is not None:
                    g_dense = np.zeros((num_energy_bins, ny, nx), dtype=np.float64)
                    g_dense[:, mask] = g_host
                    q = q + seg.dt * jnp.asarray(g_dense, dtype=dtype)
                q, ph, stats = single_step(seg.dt)(q, ph)
                step_counter += 1
                current_time += seg.dt
                enforcer.check(
                    step_counter,
                    current_time,
                    float(stats[0]),
                    int(stats[1]),
                    bool(stats[2]),
                    int(stats[3]),
                )
            if seg.stored:
                store_snapshot(current_time, step_counter, q, ph)
            continue
        q, ph, stats = segment_runner(seg.dt, seg.length)(
            q, ph, jnp.asarray(current_time, dtype=dtype)
        )
        new_pending = {
            "seg": seg,
            "stats": stats,
            "q": q,
            "ph": ph,
            "step_start": step_counter,
            "t_start": current_time,
        }
        # kick the device->host transfers off now (they complete behind the
        # next segment's compute); drain() then finds the bytes already here.
        # Light mode dispatches the on-device snapshot reduction here too and
        # transfers only the reduced arrays (plus the full state when a
        # checkpointer needs it).
        if seg.stored and light:
            new_pending["light"] = light_from_device(q, ph)
            pull = [x for x in new_pending["light"] if x is not None]
            if checkpointer is not None:
                pull += [q, ph]
        else:
            pull = [q, ph] if seg.stored else []
        for leaf in (*stats, *pull):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # non-jax leaf (e.g. interpret mode)
                pass
        step_counter += seg.length
        for _ in range(seg.length):  # sequential adds: bit-identical times
            current_time += seg.dt
        if pending is not None:
            drain(pending)
        pending = new_pending
    if pending is not None:
        drain(pending)

    if checkpointer is not None:
        checkpointer.finalize()

    if phonon_history_out is not None:
        phonon_history_out.clear()
        phonon_history_out.update(
            {
                "phonon_frames": phonon_frames_hist,
                "phonon_energy_frames": phonon_energy_frames_hist,
                "phonon_energy_bins": np.asarray(omega_bins, dtype=np.float64).copy(),
                "phonon_metadata": {
                    "mode": "dynamic_local_coupled",
                    "field_units": "integrated_occupation",
                    "energy_frame_units": "occupation",
                    **({"streamed": True} if frame_sink is not None else {}),
                    **({"detail": "integrated"} if light else {}),
                },
            }
        )
    if frame_sink is not None:
        return times, [], mass, _limits_from_running(running_limits), None, E_bins
    return times, frames, mass, _color_limits(frames), (None if light else energy_frames), E_bins
