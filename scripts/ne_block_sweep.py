#!/usr/bin/env python
"""Block-size / row-gating sweep for the NE>64 blocked collision kernel.

VERDICT r4 weak #2: the NE 65-256 tier is a ~9x performance cliff (NE=100
at 11.04 ms/substep vs the sub-64 trend), and the blocked kernel's
``block=8`` was sized under the old libtpu's compile cliff, which r4 proved
has collapsed (43.8 s at a full 64-wide unroll).  This sweep measures, at
NE=100 on a 256² f32 grid:

  - block in {8, 16, 32, 64} x row_gating in {off, on} for the table
    kernel (uniform gap), each with a one-step parity check against the
    XLA integrator (Mosaic miscompile guard);
  - the analytic-gap variant over the same blocks;
  - the winner re-timed at NE=192 (the clamp tier above).

Writes one JSON object to stdout; run only when the tunnel is up.  The
persistent compile cache is disabled so compile numbers are honest colds.
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

if os.environ.get("QPSIM_FORCE_CPU") == "1":
    # wiring checks must not touch the axon tunnel (one client at a time);
    # only the in-process config update selects CPU here (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
from qpsim_tpu.ops.pallas_collisions_blocked import (
    build_pallas_collision_step_blocked,
    build_pallas_collision_step_blocked_analytic,
)
from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

NY = NX = int(os.environ.get("QPSIM_BLKSWEEP_GRID", "256"))
NE_MAIN = int(os.environ.get("QPSIM_BLKSWEEP_NE", "100"))
BLOCKS = tuple(
    int(s) for s in os.environ.get("QPSIM_BLKSWEEP_BLOCKS", "8,16,32,64").split(",")
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
    q0 = jnp.asarray(
        rng.uniform(0, 1e-5, (ne, NY, NX)) * rho[:, None, None], jnp.float32
    )
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, NY, NX),
        ).copy(),
        jnp.float32,
    )
    return kw, q0, ph0


def _oracle(kw, q0, ph0):
    plan = build_collision_plan_arrays(
        dE=kw["dE"],
        rho_by_gap=kw["rho"][None],
        K_r0_by_gap=kw["K_r0"][None],
        K_s0_by_gap=kw["K_s0"][None],
        gap_id=np.zeros((NY, NX), np.int32),
        pmap=kw["pmap"],
        enable_recombination=True,
        enable_scattering=True,
        update_phonons=True,
        dtype=jnp.float32,
        pixel_chunk=NY * NX,
    )
    q1, p1 = jax.jit(make_collision_step(plan, DT))(q0, ph0)
    return np.asarray(q1, np.float64), np.asarray(p1, np.float64)


def _err(a, ref) -> float:
    a = np.asarray(a, np.float64)
    return float(np.max(np.abs(a - ref)) / max(1e-30, np.max(np.abs(ref))))


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
    _sync(chunk((q0, ph0)))
    compile_s = time.time() - t0
    t0 = time.time()
    _sync(chunk((q0, ph0)))
    per = (time.time() - t0) / length
    return compile_s, per


def main() -> None:
    # throwaway: absorb the fresh-process first-compile flakiness
    kw, q0, ph0 = _physics(12)
    _measure(build_pallas_collision_step(**kw), q0, ph0, 4)
    print("warmup done", file=sys.stderr, flush=True)

    results: dict = {
        "grid": f"{NY}x{NX}", "ne": NE_MAIN, "backend": jax.default_backend(),
    }
    kw, q0, ph0 = _physics(NE_MAIN)
    q_ref, ph_ref = _oracle(kw, q0, ph0)
    length = 400 if not INTERPRET else 2
    best = (None, float("inf"))
    for gating in (False, True):
        for b in BLOCKS:
            name = f"block{b}{'_gated' if gating else ''}"
            try:
                col = build_pallas_collision_step_blocked(
                    **kw, block=b, row_gating=gating
                )
                if col is None:
                    results[name] = {"skipped": "outside envelope"}
                    continue
                q1, p1 = jax.jit(col)(q0, ph0)
                err = max(_err(q1, q_ref), _err(p1, ph_ref))
                c, p = _measure(col, q0, ph0, length)
                results[name] = {
                    "compile_s": round(c, 1),
                    "ms_per_substep": round(p * 1e3, 3),
                    "parity_vs_xla": err,
                    "parity_ok": err < 5e-5,
                }
                print(
                    f"{name}: compile {c:.1f}s, {p*1e3:.3f} ms, err {err:.2e}",
                    file=sys.stderr, flush=True,
                )
                if err < 5e-5 and p < best[1]:
                    best = ((b, gating), p)
            except Exception as exc:  # noqa: BLE001 — isolate per variant
                results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                print(f"{name} FAILED: {exc}", file=sys.stderr, flush=True)

    # analytic-gap variant over the same blocks (continuous-map tier)
    gap_plane = np.full((NY, NX), GAP) * (
        1.0 + 1e-3 * np.random.default_rng(3).uniform(size=(NY, NX))
    )
    for b in BLOCKS:
        name = f"analytic_block{b}"
        try:
            col = build_pallas_collision_step_blocked_analytic(
                E_bins=kw["E_bins"], dE=kw["dE"], gap_plane=gap_plane,
                pmap=kw["pmap"], dt=DT, tau_s=TAU, tau_r=TAU, T_c=TC,
                interpret=INTERPRET, block=b,
            )
            if col is None:
                results[name] = {"skipped": "outside envelope"}
                continue
            c, p = _measure(col, q0, ph0, length)
            results[name] = {
                "compile_s": round(c, 1), "ms_per_substep": round(p * 1e3, 3),
            }
            print(
                f"{name}: compile {c:.1f}s, {p*1e3:.3f} ms",
                file=sys.stderr, flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"{name} FAILED: {exc}", file=sys.stderr, flush=True)

    # winner re-timed at NE=192 (the tile-128 clamp tier)
    if best[0] is not None and not INTERPRET:
        b, gating = best[0]
        results["winner"] = {"block": b, "row_gating": gating}
        try:
            kw2, q2, ph2 = _physics(192)
            col = build_pallas_collision_step_blocked(
                **kw2, block=b, row_gating=gating
            )
            if col is not None:
                c, p = _measure(col, q2, ph2, 100)
                results["ne192_winner"] = {
                    "compile_s": round(c, 1), "ms_per_substep": round(p * 1e3, 3),
                }
                print(
                    f"ne192 winner: compile {c:.1f}s, {p*1e3:.3f} ms",
                    file=sys.stderr, flush=True,
                )
        except Exception as exc:  # noqa: BLE001
            results["ne192_winner"] = {"error": f"{type(exc).__name__}: {exc}"[:300]}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
