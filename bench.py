"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline (driver-defined north star, BASELINE.json): cell-steps/sec for 2D
Crank–Nicolson on a 1024² grid, single chip.  Secondary fields report the
10k-step MKID-pulse wall-clock (1D wire, energy-resolved coupled physics)
and the collision-step throughput.

Baselines (``vs_baseline`` denominators) were measured on this machine
against the reference implementation (scipy SuperLU CN + per-pixel Python
collisions, .dev/measure_reference.py):

  scalar 1024² CN . . . . 3.404e6 cell-steps/s  (0.308 s/step after 47 s LU)
  coupled collisions  . . 7.497e3 pixel-collisions/s at 16 energy bins

Run on the default backend (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_SCALAR_1024_CELL_STEPS_PER_S = 3.404e6
REFERENCE_COLLISION_PIXELS_PER_S = 7.497e3


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_scalar_cn_1024(steps: int = 50) -> float:
    """Headline: 2D CN (PR-ADI + PCR tridiagonal) on a full 1024² film."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

    n = 1024
    mask = np.ones((n, n), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 6.0)
    one = ADIDiffusion(op, dtype=jnp.float32).make_step(0.1)

    @jax.jit
    def run_chunk(u):
        return jax.lax.scan(lambda c, _: (one(c), None), u, None, length=steps)[0]

    u = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, n, n)), dtype=jnp.float32)
    t0 = time.time()
    u = run_chunk(u)
    jax.block_until_ready(u)
    log(f"scalar 1024^2: compile+first chunk {time.time() - t0:.1f}s")
    t0 = time.time()
    u = run_chunk(u)
    jax.block_until_ready(u)
    elapsed = time.time() - t0
    per_step = elapsed / steps
    rate = n * n / per_step
    log(f"scalar 1024^2: {per_step * 1e3:.2f} ms/step -> {rate:.3e} cell-steps/s")
    return rate


def bench_mkid_pulse(total_steps: int = 10_000, nx: int = 1024, ne: int = 16) -> dict:
    """10k-step MKID pulse: 1D wire, coupled scattering+recombination+pulse."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.ops.dos import (
        diffusion_coefficient_of_energy,
        dynes_density_of_states,
        thermal_phonon_occupation,
    )
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

    gap, tau, tc, tbath, d0, dt = 180.0, 440.0, 1.2, 0.2, 6.0, 0.01
    dtype = jnp.float32
    mask = np.ones((1, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(d0, E, gap))
    plan = build_collision_plan_arrays(
        dE=dE,
        rho_by_gap=dynes_density_of_states(E, gap, 0.0)[None],
        K_r0_by_gap=recombination_kernel_base(E, gap, tau, tc)[None],
        K_s0_by_gap=scattering_kernel_base(E, gap, tau, tc)[None],
        gap_id=np.zeros((1, nx), np.int32),
        pmap=pm,
        enable_recombination=True,
        enable_scattering=True,
        update_phonons=True,
        dtype=dtype,
    )
    col_half = make_collision_step(plan, 0.5 * dt)
    diff = ADIDiffusion(op, dtype=dtype).make_step(dt)
    pulse_rate, pulse_end = 1e-5, 2.0

    def step(carry, i):
        q, ph = carry
        t = i.astype(dtype) * dt
        q = q + jnp.where(t < pulse_end, dt * pulse_rate, 0.0)
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return (q, ph), None

    chunk = 1000

    @jax.jit
    def run_chunk(q, ph, i0):
        (q, ph), _ = jax.lax.scan(step, (q, ph), i0 + jnp.arange(chunk))
        return q, ph

    q = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1e-5, (ne, 1, nx)), dtype=dtype
    )
    ph = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
            (pm.num_omega, 1, nx),
        ).copy(),
        dtype=dtype,
    )
    t0 = time.time()
    q1, ph1 = run_chunk(q, ph, jnp.asarray(0))
    jax.block_until_ready(q1)
    log(f"mkid pulse: compile+first {chunk} steps {time.time() - t0:.1f}s")
    t0 = time.time()
    done = chunk
    q, ph = q1, ph1
    while done < total_steps:
        q, ph = run_chunk(q, ph, jnp.asarray(done))
        done += chunk
    jax.block_until_ready(q)
    wall = time.time() - t0
    wall_10k = wall * (total_steps / max(1, (done - chunk)))
    pixel_collisions_per_s = 2 * (done - chunk) * nx / wall  # two half-steps per step
    log(
        f"mkid pulse: {wall:.2f}s for {done - chunk} steps -> "
        f"{wall_10k:.2f}s per 10k, {pixel_collisions_per_s:.3e} pixel-collisions/s"
    )
    return {
        "mkid_pulse_10k_steps_wallclock_s": wall_10k,
        "collision_pixels_per_s": pixel_collisions_per_s,
        "collision_vs_reference": pixel_collisions_per_s / REFERENCE_COLLISION_PIXELS_PER_S,
    }


def main() -> None:
    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rate = bench_scalar_cn_1024()
    extras = bench_mkid_pulse()
    payload = {
        "metric": "cell-steps/sec (2D CN, 1024^2 grid)",
        "value": rate,
        "unit": "cell-steps/s",
        "vs_baseline": rate / REFERENCE_SCALAR_1024_CELL_STEPS_PER_S,
        **extras,
    }
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
