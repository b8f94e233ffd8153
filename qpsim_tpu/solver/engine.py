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

The implementation is split by responsibility (each piece importable on its
own; this module is the stable public surface):

* stepping        -- segment planner + shared host helpers
* scalar_runner   -- legacy scalar (energy-integrated) mode
* program_cache   -- cross-call compiled-program cache
* program_build   -- jit-compiled segment/step runner construction
* spectral_runner -- energy-resolved run orchestration
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np

from ..models.params import (
    BoundaryCondition,
    EdgeSegment,
    ExternalGenerationSpec,
    InitialConditionSpec,
    PhotonDriveSpec,
)
from ..ops.collisions import DEFAULT_PIXEL_CHUNK
from ..utils.compile_cache import maybe_enable_persistent_cache
from .phonon_history import reconstruct_field
from .program_cache import clear_engine_program_cache, engine_trace_count
from .scalar_runner import _run_scalar
from .spectral_runner import _run_energy_resolved
from .stepping import _plan_segments, _split_time, default_dtype

__all__ = [
    "run_2d_crank_nicolson",
    "reconstruct_field",
    "default_dtype",
    "clear_engine_program_cache",
    "engine_trace_count",
]


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
    photon_drive: PhotonDriveSpec | None = None,
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
            # 'wang' default since r4: the distributed Wang partition beat
            # the pencil transposes even WITHOUT communication to save
            # (0.284 vs 0.303 ms/step, 1-dev 256²×16 hardware capture,
            # BENCH_CAPTURED_r04.json) and the comm model favors it ~40x
            # at 8 chips (ROADMAP).  QPSIM_MESH_Y_SOLVE=pencil flips back.
            mesh_y_solve = os.environ.get("QPSIM_MESH_Y_SOLVE", "wang")
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
    if photon_drive is not None:
        from ..models.params import photon_drive_specs

        if photon_drive_specs(photon_drive) and energy_gap <= 0.0:
            raise ValueError(
                "photon_drive needs the energy-resolved mode (energy_gap > 0)."
            )
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
            photon_drive=photon_drive,
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

