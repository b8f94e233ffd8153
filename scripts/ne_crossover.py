#!/usr/bin/env python
"""Blocked-vs-unrolled collision-kernel crossover sweep (VERDICT r2 item 4).

For NE in {48, 56, 64} at 256² f32, measures for each kernel:
  - Mosaic compile wall-time (first dispatch, warm process: a throwaway
    small kernel compiles first so the fresh-process tunnel flakiness
    (100-340 s, CLAUDE.md) is NOT charged to variant #1)
  - per-substep time (fused lax.scan chunk, honest scalar sync)

Writes one JSON object to .dev/ne_crossover.json and prints it.  Run only
when the tunnel is up (scripts/tpu_probe.py).  The persistent compile cache
is disabled so compile numbers are honest colds.
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ["QPSIM_PERSISTENT_CACHE"] = "0"

import jax
import jax.numpy as jnp
import numpy as np

from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
from qpsim_tpu.ops.pallas_collisions_blocked import build_pallas_collision_step_blocked
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

NY = NX = int(os.environ.get("QPSIM_XOVER_GRID", "256"))
NES = tuple(
    int(s) for s in os.environ.get("QPSIM_XOVER_NES", "48,56,64").split(",")
)
GAP, TAU, TC, DT = 180.0, 440.0, 1.2, 0.025
INTERPRET = jax.default_backend() != "tpu"


def _physics(ne: int):
    E, dE = build_energy_grid(GAP, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, GAP, 0.0)
    kw = dict(
        E_bins=E,
        dE=dE,
        rho=rho,
        K_s0=scattering_kernel_base(E, GAP, TAU, TC),
        K_r0=recombination_kernel_base(E, GAP, TAU, TC),
        pmap=pm,
        dt=DT,
        interpret=INTERPRET,
    )
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, NY, NX)) * rho[:, None, None], jnp.float32)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, NY, NX),
        ).copy(),
        jnp.float32,
    )
    return kw, q0, ph0


def _sync(tree) -> float:
    return sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(tree))


def _measure(col, q0, ph0, length: int) -> tuple[float, float]:
    """(compile_s, per_substep_s)"""

    @jax.jit
    def chunk(state):
        return jax.lax.scan(
            lambda c, _: (col(*c), None), state, None, length=length, unroll=8
        )[0]

    t0 = time.time()
    out = chunk((q0, ph0))
    _sync(out)
    compile_s = time.time() - t0
    t0 = time.time()
    out = chunk((q0, ph0))
    _sync(out)
    per = (time.time() - t0) / length
    return compile_s, per


def main() -> None:
    # throwaway: absorb the fresh-process first-compile flakiness
    kw, q0, ph0 = _physics(12)
    col = build_pallas_collision_step(**kw)
    _measure(col, q0, ph0, 4)
    print("warmup done", flush=True)

    results: dict = {"grid": f"{NY}x{NX}", "backend": jax.default_backend()}
    for ne in NES:
        kw, q0, ph0 = _physics(ne)
        length = 600 if not INTERPRET else 2
        row: dict = {}
        col_u = build_pallas_collision_step(**kw)
        if col_u is not None:
            c, p = _measure(col_u, q0, ph0, length)
            row["unrolled_compile_s"] = round(c, 1)
            row["unrolled_ms"] = round(p * 1e3, 3)
            print(f"NE={ne} unrolled: compile {c:.1f}s, {p*1e3:.3f} ms", flush=True)
        col_b = build_pallas_collision_step_blocked(**kw)
        if col_b is not None:
            c, p = _measure(col_b, q0, ph0, length)
            row["blocked_compile_s"] = round(c, 1)
            row["blocked_ms"] = round(p * 1e3, 3)
            print(f"NE={ne} blocked:  compile {c:.1f}s, {p*1e3:.3f} ms", flush=True)
        results[f"ne{ne}"] = row

    out = pathlib.Path(__file__).resolve().parent.parent / ".dev" / "ne_crossover.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
