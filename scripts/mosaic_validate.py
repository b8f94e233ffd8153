#!/usr/bin/env python
"""Hardware (Mosaic) parity validation of the round-3/4 device paths.

Interpret-clean is NOT Mosaic-clean on this repo's record (dynamic
pltpu.roll silently mis-compiles; 8-alignment instruction-selection —
CLAUDE.md), so every device path added since the last hardware run is
compiled ON THE REAL CHIP here and compared against the XLA integrator:

  1. gen-fused pair-unrolled collision kernel (gen_input=True)
  2. gen-fused analytic-gap collision kernel
  3. sharded step with gen_input=True (1-device TPU mesh)
  4. light-snapshot on-device reductions (snapshot_detail='integrated')
  5. mesh-merged pieces on a 1-device TPU mesh
  6. r4 op-reduced kernels (hoisted 1+D rows, single-exp epilogue) vs XLA

Tolerances follow the r2 hardware-parity precedent: f32 kernels vs the f32
XLA path at scaled-absolute ~2.5e-7 for QPs (f32 ulp-scale differences in
weight assembly), 1e-6 relative on phonons.  Prints one JSON dict; nonzero
exit if any check fails.  One TPU client at a time.
"""

from __future__ import annotations

import json
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

if os.environ.get("QPSIM_FORCE_CPU") == "1":
    # wiring checks must not touch the axon tunnel (one client at a time);
    # only the in-process config update selects CPU here (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")

RESULTS: dict = {}


def _scaled_max_err(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    scale = max(1e-30, float(np.max(np.abs(b))))
    return float(np.max(np.abs(a - b))) / scale


def check(name: str, fn, tol: float) -> None:
    import jax

    try:
        err = fn()
        ok = err <= tol
        RESULTS[name] = {"err": err, "tol": tol, "ok": ok}
        print(f"{name}: err={err:.3e} tol={tol:.0e} {'OK' if ok else 'FAIL'}", file=sys.stderr)
    except Exception as exc:
        RESULTS[name] = {"error": f"{type(exc).__name__}: {exc}", "ok": False}
        traceback.print_exc()


def main() -> int:
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import (
        build_pallas_collision_step,
        build_pallas_collision_step_analytic,
    )
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.utils.compile_cache import maybe_enable_persistent_cache

    maybe_enable_persistent_cache()
    # CPU fallback (interpret mode) exists so the script's API usage stays
    # testable without the tunnel; the hardware answer needs the real chip.
    interpret = jax.default_backend() != "tpu"
    if interpret:
        print("WARNING: not on TPU - interpret-mode dry run only", file=sys.stderr)
    RESULTS["backend"] = {"ok": True, "backend": jax.default_backend()}
    dtype = jnp.float32
    gap, tau, tc, tbath = 180.0, 440.0, 1.2, 0.2
    # interpret mode is ~1000x slower per element: the dry run only needs
    # the API surface to execute, so it shrinks the grid
    ny, nx, ne = (8, 128, 8) if interpret else (64, 256, 16)
    dt = 0.05

    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    Ks0 = scattering_kernel_base(E, gap, tau, tc)
    Kr0 = recombination_kernel_base(E, gap, tau, tc)
    mask = np.ones((ny, nx), dtype=bool)
    gap_id = np.zeros((ny, nx), dtype=np.int32)

    rng = np.random.default_rng(7)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], dtype=dtype)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy()
        * (1.0 + 0.1 * rng.uniform(size=(pm.num_omega, ny, nx))),
        dtype=dtype,
    )
    gen_plane = jnp.asarray(
        dt * 2e-6 * (1.0 + rng.uniform(size=(ny, nx))), dtype=dtype
    )

    # XLA oracle (same dtype): gen pre-add then collision substep
    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=rho[None],
        K_r0_by_gap=Kr0[None],
        K_s0_by_gap=Ks0[None],
        gap_id=gap_id,
        pmap=pm,
        enable_recombination=True,
        enable_scattering=True,
        update_phonons=True,
        dtype=dtype,
        pixel_chunk=ny * nx,
    )
    xla_col = make_collision_step(plan, dt)
    q_gen = q0 + gen_plane[None]
    q_ref, ph_ref = jax.jit(xla_col)(q_gen, ph0)
    q_ref, ph_ref = np.asarray(q_ref), np.asarray(ph_ref)

    # 1 + 6: r4 pair-unrolled kernel, gen-fused
    def pair_gen():
        col = build_pallas_collision_step(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm, dt=dt,
            update_phonons=True, interpret=interpret, gen_input=True,
        )
        assert getattr(col, "takes_gen", False)
        q1, ph1 = jax.jit(col)(q0, ph0, gen_plane)
        return max(_scaled_max_err(q1, q_ref), _scaled_max_err(ph1, ph_ref))

    check("pair_unrolled_gen_fused_r4", pair_gen, 5e-7)

    # plain (no gen) r4 kernel — validates the op-reduction rewrite alone
    def pair_plain():
        col = build_pallas_collision_step(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm, dt=dt,
            update_phonons=True, interpret=interpret,
        )
        q1, ph1 = jax.jit(col)(q_gen, ph0)
        return max(_scaled_max_err(q1, q_ref), _scaled_max_err(ph1, ph_ref))

    check("pair_unrolled_r4_opcut", pair_plain, 5e-7)

    # 2: analytic-gap kernel, gen-fused (continuous gap plane)
    def analytic_gen():
        gap_plane = np.full((ny, nx), gap) * (1.0 + 1e-3 * rng.uniform(size=(ny, nx)))
        # XLA oracle with per-pixel gaps: unique-gap stacked tables
        # keep the XLA oracle tractable: quantize to 16 unique gaps
        qs = np.quantile(gap_plane, np.linspace(0, 1, 16))
        gid = np.clip(np.searchsorted(qs, gap_plane) - 1, 0, 14).astype(np.int32)
        gp_q = qs[gid + 1]
        rho_g = np.stack([dynes_density_of_states(E, g, 0.0) for g in qs[1:]])
        Ks_g = np.stack([scattering_kernel_base(E, g, tau, tc) for g in qs[1:]])
        Kr_g = np.stack([recombination_kernel_base(E, g, tau, tc) for g in qs[1:]])
        plan_g = build_collision_plan_arrays(
            dE=dE, rho_by_gap=rho_g, K_r0_by_gap=Kr_g, K_s0_by_gap=Ks_g,
            gap_id=gid, pmap=pm, enable_recombination=True,
            enable_scattering=True, update_phonons=True, dtype=dtype,
            pixel_chunk=ny * nx,
        )
        qg_ref, phg_ref = jax.jit(make_collision_step(plan_g, dt))(q_gen, ph0)
        col = build_pallas_collision_step_analytic(
            E_bins=E, dE=dE, gap_plane=gp_q, pmap=pm, dt=dt, tau_s=tau,
            tau_r=tau, T_c=tc, dynes_gamma=0.0, update_phonons=True,
            interpret=interpret, gen_input=True,
        )
        assert col is not None and getattr(col, "takes_gen", False)
        q1, ph1 = jax.jit(col)(q0, ph0, gen_plane)
        return max(
            _scaled_max_err(q1, np.asarray(qg_ref)),
            _scaled_max_err(ph1, np.asarray(phg_ref)),
        )

    check("analytic_gap_gen_fused", analytic_gen, 5e-6)

    # 3 + 5: sharded step on a 1-device TPU mesh, gen-fused and merged pieces
    def sharded_checks():
        from jax.sharding import Mesh

        from qpsim_tpu.geometry.mask import extract_edge_segments
        from qpsim_tpu.models.params import BoundaryCondition
        from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
        from qpsim_tpu.ops.dos import diffusion_coefficient_of_energy
        from qpsim_tpu.parallel.mesh import ENSEMBLE_AXIS, SPACE_AXIS
        from qpsim_tpu.parallel.sharded import build_sharded_step

        edges = extract_edge_segments(mask)
        bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
        x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
        op = fold_diffusion(
            x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(6.0, E, gap)
        )
        mesh = Mesh(
            np.asarray(jax.devices()[:1]).reshape(1, 1), (ENSEMBLE_AXIS, SPACE_AXIS)
        )
        collisions = dict(
            E_bins=E, dE=dE, rho=rho, pmap=pm, K_r0=Kr0, K_s0=Ks0,
            enable_recombination=True, enable_scattering=True,
            update_phonons=True, pixel_chunk=ny * nx,
        )
        sh = build_sharded_step(
            mesh, op, dt, dx=1.0, collisions=collisions, dtype=dtype,
            gen_input=True, pieces=True,
        )
        # single-chip oracle: C(dt/2) D C(dt/2) with the XLA collision path
        from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

        col_half = make_collision_step(
            build_collision_plan_arrays(
                dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr0[None],
                K_s0_by_gap=Ks0[None], gap_id=gap_id, pmap=pm,
                enable_recombination=True, enable_scattering=True,
                update_phonons=True, dtype=dtype, pixel_chunk=ny * nx,
            ),
            0.5 * dt,
        )
        diff_step, daux = ADIDiffusion(op, dtype).make_step_aux(dt)

        @jax.jit
        def oracle(q, ph, daux):
            q = q + gen_plane[None]
            q, ph = col_half(q, ph)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return q, ph

        qo, pho = oracle(q0, ph0, daux)
        q1, ph1, _mass = jax.jit(
            lambda q, ph, g, *aux: sh.apply(q, ph, g, *aux)
        )(q0, ph0, gen_plane, *sh.aux)
        err_full = max(
            _scaled_max_err(q1, np.asarray(qo)), _scaled_max_err(ph1, np.asarray(pho))
        )
        RESULTS["sharded_gen_fused_1dev"] = {
            "err": err_full, "tol": 2e-5, "ok": err_full <= 2e-5
        }
        print(f"sharded_gen_fused_1dev: err={err_full:.3e}", file=sys.stderr)

        # merged pieces: C(dt/2) at the seam == oracle half-step composition
        raw, src = sh.aux

        @jax.jit
        def pieces_once(q, ph, g, raw, src):
            q, ph = sh.apply_col_half_gen(q, ph, g, raw)
            q = sh.apply_diffuse(q, raw, src)
            q, ph = sh.apply_col_half(q, ph, raw)
            return q, ph

        q2, ph2 = pieces_once(q0, ph0, gen_plane, raw, src)
        err_pieces = max(
            _scaled_max_err(q2, np.asarray(qo)), _scaled_max_err(ph2, np.asarray(pho))
        )
        RESULTS["mesh_merged_pieces_1dev"] = {
            "err": err_pieces, "tol": 2e-5, "ok": err_pieces <= 2e-5
        }
        print(f"mesh_merged_pieces_1dev: err={err_pieces:.3e}", file=sys.stderr)
        return 0.0

    check("sharded_block", sharded_checks, 1.0)

    # 4: light-snapshot on-device reductions through the engine surface
    def light_snapshots():
        from qpsim_tpu.geometry.mask import extract_edge_segments
        from qpsim_tpu.models.params import BoundaryCondition
        from qpsim_tpu.solver.engine import run_2d_crank_nicolson

        m = np.ones((16, 128) if not interpret else (4, 32), dtype=bool)
        edges = extract_edge_segments(m)
        bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
        init = np.zeros(m.shape)
        init[m] = 1e-5
        kw = dict(
            mask=m, edges=edges, edge_conditions=bcs, initial_field=init,
            diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
            store_every=4, energy_gap=gap, energy_max_factor=4.0,
            num_energy_bins=8, enable_recombination=True,
            enable_scattering=True, bath_temperature=0.2, dtype=dtype,
        )
        full = run_2d_crank_nicolson(**kw, snapshot_detail="full")
        light = run_2d_crank_nicolson(**kw, snapshot_detail="integrated")
        errs = [
            _scaled_max_err(lf[np.isfinite(lf)], ff[np.isfinite(ff)])
            for lf, ff in zip(light[1], full[1])
        ]
        errs.append(_scaled_max_err(light[2], full[2]))
        return float(np.max(errs))

    check("light_snapshot_reductions", light_snapshots, 5e-6)

    # 7 (r5): separable prefactored-Wang ADI kernel — the nb==1 scalar-mode
    # default since late r4 — against the general fused kernel on the
    # headline 1024² shape with all five BC kinds exercised via sources.
    def sep_adi():
        from qpsim_tpu.geometry.mask import extract_edge_segments
        from qpsim_tpu.models.params import BoundaryCondition
        from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
        from qpsim_tpu.ops.pallas_adi import build_pallas_adi_fused_step
        from qpsim_tpu.ops.pallas_adi_sep import build_pallas_adi_sep_step

        n = 128 if interpret else 1024
        m = np.ones((n, n), dtype=bool)
        edges = extract_edge_segments(m)
        kinds = ["dirichlet", "neumann", "robin", "reflective"]
        bcs = {}
        for i, e in enumerate(edges):
            kind = kinds[i % len(kinds)]
            bcs[e.edge_id] = BoundaryCondition(
                kind=kind,
                value=0.4 if kind in ("dirichlet", "neumann", "robin") else None,
                aux_value=0.2 if kind == "robin" else None,
            )
        x_st, y_st = build_directional_stencils(m, edges, bcs, 0.6)
        op = fold_diffusion(x_st, y_st, m, 0.6, 2.3)
        rng2 = np.random.default_rng(11)
        u0 = jnp.asarray(rng2.uniform(0.0, 1.0, (1, n, n)), dtype=dtype)
        dt_d = 0.05
        ref_step = jax.jit(build_pallas_adi_fused_step(op, dt_d, dtype, interpret=interpret))
        sep_step = jax.jit(build_pallas_adi_sep_step(op, dt_d, dtype, interpret=interpret))
        steps = 3 if interpret else 50
        ref = got = u0
        for _ in range(steps):
            ref, got = ref_step(ref), sep_step(got)
        return _scaled_max_err(np.asarray(got), np.asarray(ref))

    check("sep_adi_prefactored_wang", sep_adi, 5e-6)

    # 8 (r5): ensemble super-grid composition — member independence on the
    # real chip (the packed multi-member step vs the same member stepped
    # alone; any guard-row leak or tile-boundary artifact breaks equality).
    def ensemble_independence():
        from qpsim_tpu.parallel.ensemble import build_film_ensemble

        n_members, member, ne_e = 3, ((8, 32) if interpret else (32, 128)), 8
        steps = 2 if interpret else 5

        def run(n_mem, q_members, baths):
            ens = build_film_ensemble(
                n_members=n_mem, member_shape=member, num_energy_bins=ne_e,
                dt=0.05, dtype=dtype,
            )
            ph_members = ens.thermal_phonons(baths)
            q, ph = ens.pack(q_members, ph_members)
            step = jax.jit(lambda q, ph: ens.step(q, ph))
            q, ph = jnp.asarray(q, dtype), jnp.asarray(ph, dtype)
            for _ in range(steps):
                q, ph = step(q, ph)
            return ens.unpack(q, ph)

        rng3 = np.random.default_rng(23)
        q_members = rng3.uniform(0, 1e-5, (n_members, ne_e, *member))
        baths = np.linspace(0.15, 0.35, n_members)
        q_all, ph_all = run(n_members, q_members, baths)
        errs = []
        for k in range(n_members):
            q_one, ph_one = run(1, q_members[k:k + 1], baths[k:k + 1])
            errs.append(_scaled_max_err(np.asarray(q_all)[k], np.asarray(q_one)[0]))
            errs.append(_scaled_max_err(np.asarray(ph_all)[k], np.asarray(ph_one)[0]))
        return float(np.max(errs))

    check("ensemble_supergrid_independence", ensemble_independence, 1e-5)

    # 9 (r5): rematerialized backward — remat+chunked gradients vs the
    # plain (no-remat) backward on the real chip.
    def diffgrad_remat():
        from qpsim_tpu.diff import make_differentiable_sim

        n = 8 if interpret else 16
        m = np.ones((n, n), dtype=bool)
        kw = dict(
            mask=m, num_energy_bins=6, dt=0.05, n_steps=24, n0=1e-4,
            bath_temperature=0.2, dtype=dtype,
        )
        params = {
            "D0": jnp.asarray(6.0, dtype),
            "tau_s": jnp.asarray(440.0, dtype),
            "tau_r": jnp.asarray(440.0, dtype),
        }

        def grad_of(**over):
            sim = make_differentiable_sim(**kw, **over)
            return jax.jit(jax.grad(lambda p: sim(p)["total"][-1]))(params)

        g_plain = grad_of(remat=False)
        g_remat = grad_of(remat=True, remat_chunk=6)
        # Compare the LOG-SPACE gradient vector (g·θ), not per-component:
        # ∂/∂D0 is ~1e-10-scale here — inside f32 re-association noise for
        # both modes (CPU f32 shows the same ~8% per-component scatter) —
        # while the θ-scaled vector is dominated by the well-conditioned
        # components.  A Mosaic miscompile would corrupt those too.
        v_p = np.array([float(g_plain[k]) * float(params[k]) for k in params])
        v_r = np.array([float(g_remat[k]) * float(params[k]) for k in params])
        return float(
            np.linalg.norm(v_r - v_p) / max(1e-30, np.linalg.norm(v_p))
        )

    check("diffgrad_remat_backward", diffgrad_remat, 1e-3)

    # 10 (r5): photon-drive substep (Fischer 2024) composed with the Pallas
    # collision kernels in ONE engine program — the scoped-VMEM coupling
    # precedent says compositions can fail even when the pieces pass.  Both
    # the uniform plan and the gap-map (Δ²-affine per-pixel) path, against
    # the XLA collision backend with the identical photon substep.
    def photon_engine():
        from qpsim_tpu.geometry.mask import extract_edge_segments
        from qpsim_tpu.models.params import BoundaryCondition, PhotonDriveSpec
        from qpsim_tpu.solver.engine import run_2d_crank_nicolson

        m = np.ones((4, 32) if interpret else (16, 128), dtype=bool)
        edges2 = extract_edge_segments(m)
        bcs2 = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges2}
        init = np.zeros(m.shape)
        init[m] = 1e-6
        kw = dict(
            mask=m, edges=edges2, edge_conditions=bcs2, initial_field=init,
            diffusion_coefficient=6.0, dt=0.05, total_time=0.5, dx=1.0,
            store_every=4, energy_max_factor=4.0,
            num_energy_bins=8, enable_recombination=True,
            enable_scattering=True, bath_temperature=0.2, dtype=dtype,
            strang_mode="exact",
        )
        errs = []
        for extra in (
            dict(energy_gap=gap),  # uniform plan
            dict(  # per-pixel Δ² path (2-gap map; Δ stays below bin 0)
                energy_gap=170.0,
                gap_expression="return 170.0 + 8.0 * (x > 0.5)",
            ),
        ):
            drive = PhotonDriveSpec(
                mode="photon", photon_energy=2.5 * extra["energy_gap"],
                occupancy=1.0, coupling=1e-4,
                window_start=0.1, window_duration=0.3,
            )
            a = run_2d_crank_nicolson(**kw, **extra, photon_drive=drive)
            b = run_2d_crank_nicolson(
                **kw, **extra, photon_drive=drive, collision_backend="xla"
            )
            errs += [
                _scaled_max_err(np.nan_to_num(x), np.nan_to_num(y))
                for x, y in zip(a[1], b[1])
            ]
            errs.append(_scaled_max_err(a[2], b[2]))
            assert a[2][-1] > 1.5 * a[2][0], "photon drive did not fire"
        return float(np.max(errs))

    check("photon_drive_engine_composition", photon_engine, 2e-5)

    ok = all(v.get("ok") for v in RESULTS.values())
    print(json.dumps({"ok": ok, "checks": RESULTS}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
