"""Engine program builder: the jit-compiled segment/step runners.

Builds one :class:`~qpsim_tpu.solver.program_cache._EngineProgram` per
configuration fingerprint — diffusion backend, collision integrator
dispatch (XLA gather plan / pair-unrolled Pallas / analytic / blocked),
generation fusion, Pauli statistics, and the single-chip or mesh-sharded
segment runners (exact and merged Strang compositions).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.collisions import build_collision_plan_arrays, make_collision_step
from ..ops.diffusion import build_directional_stencils, fold_diffusion
from ..ops.dos import (
    diffusion_coefficient_of_energy,
    dynes_density_of_states,
    dynes_density_of_states_per_pixel,
)
from ..ops.generation import build_generation_program
from ..ops.kernels import recombination_kernel_base, scattering_kernel_base
from ..ops.phonon_map import build_phonon_frequency_map
from .diffusion_backends import choose_backend
from .pauli import make_pauli_stats_fn
from .program_cache import _bump_trace, _EngineProgram

__all__ = ["_build_engine_program"]


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
    photon_drive=None,
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
        backend = (
            None
            if mesh is not None
            else choose_backend(
                op,
                dtype,
                diffusion_backend,
                # collision kernels share the compiled program with the
                # diffusion step — Pallas ADI must use its coupled VMEM budget
                coupled=bool(enable_recombination or enable_scattering),
            )
        )

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
    # one device copy shared by the Pauli stats and the gap-map photon
    # drive (both take it as a jit ARGUMENT per the remote-TPU aux rule)
    rho_state_dev = jnp.asarray(rho_state_np, dtype=dtype)
    pauli_stats_fn, pauli_aux = make_pauli_stats_fn(
        rho_state_dev, pauli_density_floor
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
    # --- photon drive (Fischer 2024 pair-breaking photons) -----------------
    # A per-step exponential photon substep Ph(dt) applied after the
    # generation injection and before the leading collision half — the same
    # first-order placement the reference gives external generation.  A
    # sequence of specs is a multi-tone drive (readout + pump): the modes
    # apply sequentially in order, each its own exponential substep with
    # its own window — each alone is an exact thermal fixed point, so the
    # composition preserves detailed balance.
    from ..models.params import photon_drive_specs

    photon_specs = photon_drive_specs(photon_drive)
    photon_on = bool(photon_specs)
    photon_aux: tuple = ()
    if photon_on:
        # mesh mode needs no special casing: the substep is elementwise
        # over pixels with shifts along the (unsharded) energy axis, so
        # GSPMD partitions it against the rows-sharded state with zero
        # extra communication — same treatment as the traced generation.
        uniform_drive = int(unique_gaps.size) == 1
        photon_plans = []  # [(plan, window_start, window_end)]
        for spec in photon_specs:
            if uniform_drive:
                from ..ops.photon_drive import (
                    build_photon_drive_plan,
                    make_photon_substep,
                )

                ph_plan = build_photon_drive_plan(
                    E_bins=E_bins,
                    dE=dE,
                    gap=gap,
                    rho=rho_by_gap[0],
                    omega=spec.photon_energy,
                    coupling=spec.coupling,
                    occupancy=spec.occupancy,
                    include_scattering=spec.include_scattering,
                    include_pair_breaking=spec.include_pair_breaking,
                )
            else:
                # gap maps: the coherence factors are affine in Δ² (same
                # identity as the analytic collision kernels), so a per-pixel
                # Δ² plane + the Pauli ρ state replace the coefficient rows;
                # the ω > 2Δ(x) pair-breaking threshold is applied per pixel.
                from ..ops.photon_drive import (
                    build_photon_drive_plan_analytic,
                    make_photon_substep_per_pixel,
                )

                ph_plan = build_photon_drive_plan_analytic(
                    E_bins=E_bins,
                    dE=dE,
                    omega=spec.photon_energy,
                    coupling=spec.coupling,
                    occupancy=spec.occupancy,
                    include_scattering=spec.include_scattering,
                    include_pair_breaking=spec.include_pair_breaking,
                )
            if ph_plan.k_offset == 0 and ph_plan.s_index < 0:
                # both channels snapped off-grid: the substep would be the
                # identity while still disabling gen-fusion — surface the
                # configuration error instead of running slower AND inert
                raise ValueError(
                    f"photon drive at omega={spec.photon_energy:g} µeV is "
                    "inert: the scattering offset round(omega/dE) is 0 or "
                    "beyond the grid, and the pair-breaking channel is "
                    "closed (omega <= 2*gap) or its anti-diagonal misses "
                    f"the grid (needs 2*E0 <= omega <= 2*E_max; grid "
                    f"[{E_bins[0]:g}, {E_bins[-1]:g}] µeV, dE={dE:g}). "
                    "Adjust omega or the energy grid, or disable the drive."
                )
            w0 = spec.window_start
            w1 = None if w0 is None else w0 + float(spec.window_duration)
            photon_plans.append((ph_plan, w0, w1))
        if not uniform_drive:
            delta2_np = np.zeros((ny, nx), dtype=np.float64)
            delta2_np[mask] = gap_values**2
            photon_aux = (jnp.asarray(delta2_np, dtype=dtype), rho_state_dev)

        def make_photon_apply(seg_dt: float):
            if uniform_drive:
                subs = [
                    (make_photon_substep(plan, seg_dt, dtype), w0, w1)
                    for plan, w0, w1 in photon_plans
                ]
            else:
                subs = [
                    (make_photon_substep_per_pixel(plan, seg_dt, dtype), w0, w1)
                    for plan, w0, w1 in photon_plans
                ]

            def apply(qq, t, gaux, phaux):
                for sub, w0, w1 in subs:
                    if w0 is None:
                        amp = jnp.asarray(1.0, dtype)
                    else:
                        amp = ((t >= w0) & (t < w1)).astype(dtype)
                    if uniform_drive:
                        qq = sub(qq, amp, gaux)
                    else:
                        qq = sub(qq, amp, gaux, *phaux)
                return qq

            return apply
    else:
        make_photon_apply = None

    # Spatially/spectrally uniform traced generation (constant/pulse) fuses
    # into the pallas collision kernel's VMEM pre-add (gen_input=True):
    # the reference's forward-Euler n += dt·g (solver.py:1459-1464) lands on
    # the already-resident tile instead of paying a full state HBM
    # round-trip as a standalone XLA add (~0.27 ms at 1024²×16).
    # The photon substep sits BETWEEN the gen add and the collision half, so
    # the fusion (which buries the add inside the collision kernel) is
    # disabled when the drive is active to keep the operator order strict.
    fuse_gen_wanted = (
        gen.scalar_amp_fn is not None
        and collisions_on
        and (use_pallas_collisions or use_analytic_collisions)
        and not photon_on
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
        fuse_gen_mesh = gen.scalar_amp_fn is not None and not photon_on
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
            photon_apply_mesh = (
                make_photon_apply(seg_dt) if make_photon_apply else None
            )

            def run(qq, pp, t_start, paux, shaux, gaux, phaux):
                _bump_trace()
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
                        if make_photon_apply is not None:
                            qq = photon_apply_mesh(qq, t, gaux, phaux)
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
                    else:
                        if gen.traced_fn is not None:
                            qq, gnf0, gng0 = gen_add(qq, t_start, gaux)
                        if make_photon_apply is not None:
                            qq = photon_apply_mesh(qq, t_start, gaux, phaux)
                        qq, pp = sh.apply_col_half(qq, pp, raw)

                    def body_m(carry, idx):
                        qq, pp, t0 = carry
                        qq = sh.apply_diffuse(qq, raw, src)
                        gnf = gng = no
                        if fuse_gen_mesh:
                            t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                            grow, gnf, gng = gen_plane(t, gaux)
                            qq, pp = sh.apply_col_full_gen(qq, pp, grow, raw)
                        else:
                            t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                            if gen.traced_fn is not None:
                                qq, gnf, gng = gen_add(qq, t, gaux)
                            if make_photon_apply is not None:
                                qq = photon_apply_mesh(qq, t, gaux, phaux)
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
                qq, pp, t, pauli_aux, sh.aux, gen_mask_plane, photon_aux
            )
            return seg_cache[key]

        single_step_cache_m: dict[float, Callable] = {}

        def single_step_mesh(seg_dt: float):
            if seg_dt not in single_step_cache_m:
                sh = get_sharded(seg_dt)
                photon_one = (
                    make_photon_apply(seg_dt) if make_photon_apply else None
                )

                def one(qq, pp, t, paux, shaux, gaux, phaux):
                    _bump_trace()
                    # host-gen callers add dt·g before this; the photon
                    # substep follows it, before the collision half —
                    # same order as the scan-path runners
                    if photon_one is not None:
                        qq = photon_one(qq, t, gaux, phaux)
                    qq, pp, _mass = sh.apply(qq, pp, *shaux)
                    return qq, pp, pauli_stats_fn(qq, paux)

                jit_one = jax.jit(one)
                single_step_cache_m[seg_dt] = lambda qq, pp, t: jit_one(
                    qq,
                    pp,
                    jnp.asarray(t, dtype),
                    pauli_aux,
                    sh.aux,
                    gen_mask_plane,
                    photon_aux,
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
        photon_apply = make_photon_apply(seg_dt) if make_photon_apply else None

        def run(qq, pp, t_start, daux, paux, gaux, phaux):
            _bump_trace()
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
                if photon_apply is not None:
                    qq = photon_apply(qq, t, gaux, phaux)
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
                    if photon_apply is not None:
                        qq = photon_apply(qq, t_start, gaux, phaux)
                    qq, pp = col_half(qq, pp)
                else:
                    if photon_apply is not None:
                        qq = photon_apply(qq, t_start, gaux, phaux)
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
                        if photon_apply is not None:
                            qq = photon_apply(qq, t, gaux, phaux)
                        qq, pp = col_full(qq, pp)
                    else:
                        if photon_apply is not None:
                            t = t0 + (idx + 1).astype(t0.dtype) * seg_dt
                            qq = photon_apply(qq, t, gaux, phaux)
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
            qq, pp, t, diff_aux, pauli_aux, gen_mask_plane, photon_aux
        )
        return seg_cache[key]

    single_step_cache: dict[float, Callable] = {}

    def single_step(seg_dt: float):
        if seg_dt not in single_step_cache:
            col_half = make_col(0.5 * seg_dt)
            col_full = make_col(seg_dt)
            photon_one = make_photon_apply(seg_dt) if make_photon_apply else None
            if backend is not None:
                diff_step, diff_aux = backend.make_step_aux(seg_dt)
            else:
                diff_step, diff_aux = None, ()

            def one(qq, pp, t, daux, paux, gaux, phaux):
                _bump_trace()
                # host-gen callers add dt·g before this; the photon substep
                # follows it, before the leading collision half — same
                # operator order as the scan-path runners
                if photon_one is not None:
                    qq = photon_one(qq, t, gaux, phaux)
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
            single_step_cache[seg_dt] = lambda qq, pp, t: jit_one(
                qq,
                pp,
                jnp.asarray(t, dtype),
                diff_aux,
                pauli_aux,
                gen_mask_plane,
                photon_aux,
            )
        return single_step_cache[seg_dt]
    return _EngineProgram(
        pmap=pmap,
        segment_runner=segment_runner,
        single_step=single_step,
        pauli_stats_jit=(lambda _j: (lambda q: _j(q, pauli_aux)))(jax.jit(pauli_stats_fn)),
        host_gen=gen.host_mode,
    )


