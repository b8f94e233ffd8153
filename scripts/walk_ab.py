#!/usr/bin/env python
"""Pair-walk emission-order A/B (run on real TPU, tunnel up).

The collision kernels at 1024²×16 hold ~0.78 of the modeled VPU issue peak;
the residual is presumed register-allocator spill traffic from ω-row live
ranges spanning the whole unrolled body.  The diagonal-major walk
(``walk="diag"``, ops/pallas_collisions.py) compacts each ω row's live
range to its own Toeplitz/Hankel diagonal at identical op count.  This
script arbitrates pair vs diag on hardware:

  - unrolled kernel 1024²×16 at tiles {1024, 2048, 4096} for diag
    (register pressure differs, so the tile optimum may shift) vs the
    pair-walk best (tile 2048, 1.97 ms — collision_opt_r4.json)
  - analytic-gap kernel 256²×16 pair vs diag
  - exact-tier coupled step (C(dt/2) D C(dt/2)) with the winner —
    the VERDICT r3 item-3 bar is 4.0 ms

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
    from qpsim_tpu.ops.pallas_collisions import (
        build_pallas_collision_step,
        build_pallas_collision_step_analytic,
    )
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.utils.compile_cache import maybe_enable_persistent_cache

    maybe_enable_persistent_cache()
    dtype = jnp.float32
    ny = nx = 1024
    ne = 16
    dt = 0.05
    length = 400
    gap, tau, tc, tbath, d0 = 180.0, 440.0, 1.2, 0.2, 6.0
    interp = jax.default_backend() != "tpu"

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

    def substep_time(walk: str, tile: int, parity_ref=None) -> float:
        col = build_pallas_collision_step(
            E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm,
            dt=0.5 * dt, update_phonons=True, tile=tile,
            interpret=interp, walk=walk,
        )
        if parity_ref is not None:
            qa, pa = jax.jit(col)(q0, ph0)
            qb, pb = parity_ref
            err = max(
                float(jnp.max(jnp.abs(qa - qb)) / jnp.max(jnp.abs(qb))),
                float(jnp.max(jnp.abs(pa - pb)) / jnp.max(jnp.abs(pb))),
            )
            out[f"parity_{walk}_tile_{tile}"] = err
            log(f"walk={walk} tile={tile} parity vs pair: {err:.2e}")

        @jax.jit
        def chunk(state):
            def body(c, _):
                return col(*c), None
            return jax.lax.scan(body, state, None, length=length, unroll=32)[0]

        t0 = time.time()
        per, _ = _timed_chunk(chunk, (q0, ph0), length, f"collision walk={walk} tile={tile}")
        out[f"compile_s_{walk}_tile_{tile}"] = round(time.time() - t0, 1)
        return per

    # pair-walk baseline at its known-best tile, then single-step parity ref
    pair_col = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm,
        dt=0.5 * dt, update_phonons=True, tile=2048, interpret=interp, walk="pair",
    )
    ref = jax.jit(pair_col)(q0, ph0)
    jax.block_until_ready(ref)

    per_pair = substep_time("pair", 2048)
    out["collision_substep_ms_pair"] = per_pair * 1e3

    best_walk, best_tile, best = "pair", 2048, per_pair
    for tile in (1024, 2048, 4096):
        try:
            per = substep_time("diag", tile, parity_ref=ref)
        except Exception as exc:
            log(f"diag tile {tile} failed: {type(exc).__name__}: {exc}")
            out[f"collision_substep_ms_diag_tile_{tile}"] = None
            continue
        out[f"collision_substep_ms_diag_tile_{tile}"] = per * 1e3
        if per < best:
            best, best_tile, best_walk = per, tile, "diag"
    out["best"] = {"walk": best_walk, "tile": best_tile, "ms": best * 1e3}
    ops = collision_vpu_op_model(ne) * ny * nx / best
    out["vpu_peak_fraction_best"] = ops / V5E_VPU_F32_OPS_PER_S

    # analytic-gap kernel 256²×16: pair vs diag
    ny2 = nx2 = 256
    q2 = jnp.asarray(
        rng.uniform(0, 1e-5, (ne, ny2, nx2)) * rho[:, None, None], dtype=dtype
    )
    ph2 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
            (pm.num_omega, ny2, nx2),
        ).copy(),
        dtype=dtype,
    )
    gap_plane = np.full((ny2, nx2), gap) + rng.uniform(-5, 5, (ny2, nx2))
    for walk in ("pair", "diag"):
        ana = build_pallas_collision_step_analytic(
            E_bins=E, dE=dE, gap_plane=gap_plane, pmap=pm, dt=0.5 * dt,
            tau_s=tau, tau_r=tau, T_c=tc, update_phonons=True,
            interpret=interp, walk=walk,
        )

        @jax.jit
        def chunk2(state, ana=ana):
            def body(c, _):
                return ana(*c), None
            return jax.lax.scan(body, state, None, length=length, unroll=32)[0]

        per, _ = _timed_chunk(chunk2, (q2, ph2), length, f"analytic walk={walk}")
        out[f"analytic_substep_ms_{walk}"] = per * 1e3

    # exact-tier coupled step with the overall winner
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(d0, E, gap))
    diff_step, diff_aux = _best_diffusion(op, dtype, coupled=True).make_step_aux(dt)
    col_half = build_pallas_collision_step(
        E_bins=E, dE=dE, rho=rho, K_s0=Ks0, K_r0=Kr0, pmap=pm,
        dt=0.5 * dt, update_phonons=True, tile=best_tile,
        interpret=interp, walk=best_walk,
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
