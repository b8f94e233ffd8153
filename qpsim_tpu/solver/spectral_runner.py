"""Energy-resolved mode runner.

Hosts the run orchestration around the cached compiled program: initial
state assembly, Pauli policy enforcement, snapshot pipeline (full and
on-device "integrated" detail), checkpoint replay, host-generation
fallback, and the depth-1 segment pipeline that overlaps device→host
snapshot extraction with the next segment's compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import (
    build_initial_phonon_energy_state,
    build_initial_qp_energy_state,
)
from ..models.params import normalize_collision_solver_name
from ..ops.dos import dynes_density_of_states, thermal_phonon_occupation
from ..ops.energy_grid import build_energy_grid, integration_widths_from_centers
from ..ops.generation import evaluate_generation_host
from .pauli import PauliEnforcer
from .phonon_history import reconstruct_field
from .program_cache import _get_engine_program
from .stepping import (
    _color_limits,
    _limits_from_running,
    _notify,
    _usable_resume_prefix,
)

__all__ = ["_run_energy_resolved"]


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
    photon_drive=None,
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
        photon_drive=photon_drive,
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
                q, ph, stats = single_step(seg.dt)(q, ph, current_time)
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
