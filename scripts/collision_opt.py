#!/usr/bin/env python
"""Collision-kernel optimization sweep (run on real TPU, tunnel up).

Measures the pair-unrolled collision substep at the flagship config
(1024²×16, f32) across lane-tile sizes, plus the exact-tier coupled step
(C(dt/2) D C(dt/2)) — the VERDICT r3 item 3 arbitration: does the r4
op-count reduction (hoisted 1+D rows, shared symmetric scattering blend,
single-exp relaxation epilogue) close the 4.0 ms exact bar, and which tile
is optimal for the reduced op mix?

Writes one JSON dict to stdout; progress to stderr.  Strictly one TPU
client at a time (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import (
        V5E_VPU_F32_OPS_PER_S,
        _best_diffusion,
        _sync,
        _timed_chunk,
        collision_vpu_op_model,
        log,
    )
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.ops.dos import (
        diffusion_coefficient_of_energy,
        dynes_density_of_states,
        thermal_phonon_occupation,
    )
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.utils.compile_cache import maybe_enable_persistent_cache

    maybe_enable_persistent_cache()
    dtype = jnp.float32
    ny = nx = 1024
    ne = 16
    dt = 0.05
    length = 400
    gap, tau, tc, tbath, d0 = 180.0, 440.0, 1.2, 0.2, 6.0

    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    Ks0 = scattering_kernel_base(E, gap, tau, tc)
    Kr0 = recombination_kernel_base(E, gap, tau, tc)

    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], dtype=dtype)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        dtype=dtype,
    )

    # throwaway first compile (fresh-process compiles are flaky-slow)
    jax.block_until_ready(jax.jit(lambda x: x * 2.0)(q0))

    out: dict = {"config": f"{ny}x{nx}x{ne} f32 dt={dt}"}

    def substep_time(tile: int) -> float:
        col = build_pallas_collision_step(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm,
            dt=0.5 * dt, update_phonons=True, tile=tile,
            interpret=jax.default_backend() != "tpu",
        )

        @jax.jit
        def chunk(state):
            def body(c, _):
                return col(*c), None
            return jax.lax.scan(body, state, None, length=length, unroll=32)[0]

        t0 = time.time()
        per, _ = _timed_chunk(chunk, (q0, ph0), length, f"collision tile={tile}")
        out[f"compile_s_tile_{tile}"] = round(time.time() - t0, 1)
        return per

    tiles = [1024, 2048, 4096, 8192]
    best_tile, best = None, float("inf")
    for tile in tiles:
        try:
            per = substep_time(tile)
        except Exception as exc:  # VMEM / compiler limits at big tiles
            log(f"tile {tile} failed: {type(exc).__name__}: {exc}")
            out[f"collision_substep_ms_tile_{tile}"] = None
            continue
        out[f"collision_substep_ms_tile_{tile}"] = per * 1e3
        if per < best:
            best, best_tile = per, tile
    out["best_tile"] = best_tile
    out["collision_substep_ms"] = best * 1e3
    ops = collision_vpu_op_model(ne) * ny * nx / best
    out["vpu_peak_fraction_r3_model"] = ops / V5E_VPU_F32_OPS_PER_S

    # exact-tier coupled step with the best tile: C(dt/2) D C(dt/2)
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(d0, E, gap))
    diff_step, diff_aux = _best_diffusion(op, dtype, coupled=True).make_step_aux(dt)
    col_half = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm,
        dt=0.5 * dt, update_phonons=True, tile=best_tile,
        interpret=jax.default_backend() != "tpu",
    )

    @jax.jit
    def exact_chunk(state, daux):
        def body(c, _):
            q, ph = c
            q, ph = col_half(q, ph)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return (q, ph), None
        return jax.lax.scan(body, state, None, length=length, unroll=32)[0]

    per_exact, _ = _timed_chunk(
        lambda s: exact_chunk(s, diff_aux), (q0, ph0), length, "exact coupled step"
    )
    out["coupled_exact_ms_per_step"] = per_exact * 1e3
    out["exact_bar_4ms_met"] = per_exact * 1e3 <= 4.0

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
