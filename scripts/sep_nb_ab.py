#!/usr/bin/env python
"""nb>1 separable-prefactoring A/B (VERDICT r4 weak #3 / next #5).

The general fused ADI kernel has sat at 0.43-0.46 of HBM roofline for two
rounds at 1024²×16; the one untried formulation lever is per-bin factor
packs (the separable prefactored-Wang form extended over a (bin, tile)
grid) trading in-kernel re-elimination work for ~5 planes of pack DMA per
half-step.  This measures, at 1024²×16 f32 on a full rectangle:

  - parity: one sep-MB step vs the general fused kernel;
  - ms/step: general fused (auto) vs sep-MB at tile/chunks combos;

and at 256²×16 as the small-grid checkpoint.  One JSON object to stdout.
Run only when the tunnel is up; compile cache left ON (we time steps, not
compiles).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("QPSIM_FORCE_CPU") == "1":
    # wiring checks must not touch the axon tunnel (one client at a time);
    # only the in-process config update selects CPU here (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition
from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
from qpsim_tpu.ops.dos import diffusion_coefficient_of_energy
from qpsim_tpu.ops.energy_grid import build_energy_grid
from qpsim_tpu.ops.pallas_adi import build_pallas_adi_fused_step
from qpsim_tpu.ops.pallas_adi_sep import build_pallas_adi_sep_step
from qpsim_tpu.utils.compile_cache import maybe_enable_persistent_cache

GAP, NE, DT = 180.0, 16, 0.05
INTERPRET = jax.default_backend() != "tpu"


def _sync(x) -> float:
    return float(jnp.sum(x))


def _operator(n: int):
    mask = np.ones((n, n), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, _ = build_energy_grid(GAP, 1.0, 4.0, NE)
    D_bins = diffusion_coefficient_of_energy(6.0, E, GAP)
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    return fold_diffusion(xs, ys, mask, 1.0, D_bins)


def _time_step(step_aux, aux, u0, length: int) -> float:
    @jax.jit
    def chunk(u, *aux):
        return jax.lax.scan(
            lambda c, _: (step_aux(c, aux), None), u, None,
            length=length, unroll=16,
        )[0]

    _sync(chunk(u0, *aux))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _sync(chunk(u0, *aux))
        best = min(best, (time.time() - t0) / length)
    return best


def main() -> None:
    maybe_enable_persistent_cache()
    results: dict = {"backend": jax.default_backend(), "ne": NE}
    for n in ((64,) if INTERPRET else (256, 1024)):
        op = _operator(n)
        rng = np.random.default_rng(5)
        u0 = jnp.asarray(rng.uniform(0, 1e-4, (NE, n, n)), jnp.float32)
        length = 2 if INTERPRET else (200 if n <= 256 else 60)
        row: dict = {}

        # the fused baseline itself can OOM scoped VMEM on newer libtpus
        # (observed 2026-08-21: standalone tile-256 charged 22.12 MB at
        # 1024²×16) — fall back to the conservative coupled budget so the
        # A/B still lands with a valid reference
        try:
            fused_aux = build_pallas_adi_fused_step(
                op, DT, jnp.float32, as_aux=True, interpret=INTERPRET
            )
            ref = jax.jit(lambda u, *a: fused_aux[0](u, a))(u0, *fused_aux[1])
            _sync(ref)
            row["fused_auto_ms"] = round(_time_step(*fused_aux, u0, length) * 1e3, 4)
            row["fused_config"] = "standalone-budget"
        except Exception as exc:  # noqa: BLE001
            print(
                f"n={n} fused standalone budget FAILED ({exc}); retrying "
                "with the coupled budget",
                file=sys.stderr, flush=True,
            )
            fused_aux = build_pallas_adi_fused_step(
                op, DT, jnp.float32, as_aux=True, interpret=INTERPRET,
                coupled=True,
            )
            ref = jax.jit(lambda u, *a: fused_aux[0](u, a))(u0, *fused_aux[1])
            _sync(ref)
            row["fused_auto_ms"] = round(_time_step(*fused_aux, u0, length) * 1e3, 4)
            row["fused_config"] = f"coupled-budget (standalone OOMed: {exc})"[:200]

        for tile, chunks in ((None, None), (128, 32), (256, 16), (256, 32)):
            name = "sep_auto" if tile is None else f"sep_t{tile}_k{chunks}"
            try:
                sep_fn, sep_aux = build_pallas_adi_sep_step(
                    op, DT, jnp.float32, as_aux=True, interpret=INTERPRET,
                    tile=tile, chunks=chunks,
                )
                got = jax.jit(lambda u, *a: sep_fn(u, a))(u0, *sep_aux)
                err = float(
                    jnp.max(jnp.abs(got - ref)) / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-30)
                )
                ms = _time_step(sep_fn, sep_aux, u0, length) * 1e3
                row[name] = {"ms": round(ms, 4), "parity_vs_fused": err}
                print(f"n={n} {name}: {ms:.4f} ms err {err:.2e}", file=sys.stderr, flush=True)
            except Exception as exc:  # noqa: BLE001 — isolate per variant
                row[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
                print(f"n={n} {name} FAILED: {exc}", file=sys.stderr, flush=True)
        results[f"grid{n}"] = row

    print(json.dumps(results))


if __name__ == "__main__":
    main()
