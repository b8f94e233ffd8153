"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline (driver-defined north star, BASELINE.json): cell-steps/sec for 2D
Crank–Nicolson on a 1024² grid, single chip.  Secondary fields report the
10k-step MKID-pulse wall-clock (1D wire, energy-resolved coupled physics),
the 2D energy-resolved coupled-step throughput (256²×16 bins, Pallas
collision kernel), and collision throughput.

Timing methodology: the axon TPU tunnel's ``block_until_ready`` does not
reliably synchronise, so every timed region ends by forcing a scalar value
off the device.  Work is issued as one fused ``lax.scan`` chunk per timing
bracket (per-dispatch tunnel latency is ~30 ms and would otherwise dominate);
chunk lengths are sized so that amortized tunnel latency stays under ~2%
of the reported per-step number (measured: ~29 ms fixed per bracket, so
L ≳ 29 ms / (0.02 · t_step) — e.g. 20000 steps for the ~76 µs scalar ADI
step).  Wall-clock metrics (MKID pulse, engine store runs) keep the fixed
cost: a real user's single dispatch pays it too.

Baselines (``vs_baseline`` denominators) measured against the reference
implementation on this machine (scipy SuperLU CN + per-pixel Python
collisions, .dev/measure_reference.py):

  scalar 1024² CN . . . . 3.404e6 cell-steps/s  (0.308 s/step after 47 s LU)
  coupled collisions  . . 7.497e3 pixel-collisions/s at 16 energy bins
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

REFERENCE_SCALAR_1024_CELL_STEPS_PER_S = 3.404e6
REFERENCE_COLLISION_PIXELS_PER_S = 7.497e3

# --- roofline constants (TPU v5e datasheet-level) ---------------------------
# VPU: 8 sublanes × 128 lanes × 4 ALU slots at the ~940 MHz core clock.
# HBM: 16 GB @ ~819 GB/s.  These anchor the machine-checked peak fractions
# below; if the part changes, update here and every fraction follows.
V5E_VPU_F32_OPS_PER_S = 8 * 128 * 4 * 0.94e9  # ≈ 3.85e12
V5E_HBM_BYTES_PER_S = 8.19e11


def collision_vpu_op_model(ne: int) -> float:
    """Modeled VPU ops per pixel per substep for the unrolled collision
    kernel (G=1, scattering+recombination+phonon updates).

    Counted from the r4 kernel body (ops/pallas_collisions.py — hoisted
    1+D diagonal rows, shared symmetric scattering constant, single-exp
    relaxation epilogue, one merged gain accumulator per bin):
      partner assembly          4·NE
      off-diagonal pairs        30·NE(NE−1)/2   (14 scattering + 16 recomb)
      diagonal pairs            12·NE
      1+D row hoists            1·NE
      QP exponential update     16·NE           (one exp; Taylor small-x)
      phonon-row updates        26·(3NE−2)
    → 15·NE² + 96·NE − 52.  (The pre-r4 kernel modeled
    15.5·NE² + 102.5·NE − 52.)  The achieved fraction of
    ``V5E_VPU_F32_OPS_PER_S`` is the scoreboard for the kernel's
    "percent of VPU issue peak" claims (ROADMAP.md).
    """
    return 15.0 * ne * ne + 96.0 * ne - 52.0


def adi_traffic_bytes_model(nb: int, ny: int, nx: int) -> float:
    """Modeled HBM bytes per fused-ADI step (uniform-gap production config).

    Each half-step moves the state once each way (read + write, nb planes)
    plus the shared geometry planes (3 stencil coefficients + source per
    direction, single-plane, revisited across bins but DMA'd once):
    4·nb + 8 plane crossings of 4-byte elements.  The achieved fraction of
    ``V5E_HBM_BYTES_PER_S`` is the scoreboard for the diffusion-floor
    claims (ROADMAP.md "Fused-ADI diffusion floor").
    """
    return 4.0 * (4 * nb + 8) * ny * nx


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _sync(tree) -> float:
    """Force a device value — the only reliable sync over the axon tunnel."""
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(tree)[0]))


def _timed_chunk(fn, state, length: int, label: str):
    out = fn(state)
    _sync(out)  # warmup + queue drain
    per_step = float("inf")
    for _ in range(2):  # best of 2: the tunnel occasionally hiccups
        t0 = time.time()
        out = fn(out)
        _sync(out)
        per_step = min(per_step, (time.time() - t0) / length)
    log(f"{label}: {per_step * 1e3:.3f} ms/step")
    return per_step, out


def _best_diffusion(op, dtype, coupled: bool = False):
    """Fused Pallas ADI on TPU-f32 2D grids; XLA ADI elsewhere (1D wires
    would spend the kernel's lane tile on padding).  ``coupled=True`` when
    the step shares a compiled program with collision kernels (tighter
    Pallas scoped-VMEM budget — see PallasADI)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion, PallasADI

    ny, nx = np.asarray(op.mask, dtype=bool).shape
    if (
        jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and min(ny, nx) >= 8
    ):
        return PallasADI(op, dtype, coupled=coupled)
    return ADIDiffusion(op, dtype)


def bench_scalar_cn_1024(n=1024, length=20000) -> float:
    """Headline: 2D CN (fused Pallas PR-ADI on TPU) on a full 1024² film."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    mask = np.ones((n, n), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 6.0)
    # aux form: geometry planes cross the jit boundary as arguments — baked
    # closure constants cost a tunnel round-trip per array at compile time
    one, daux = _best_diffusion(op, jnp.float32).make_step_aux(0.1)

    @jax.jit
    def chunk_a(u, a):
        return jax.lax.scan(lambda c, _: (one(c, a), None), u, None, length=length, unroll=8)[0]

    chunk = lambda u: chunk_a(u, daux)
    u = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, n, n)), dtype=jnp.float32)
    per_step, _ = _timed_chunk(chunk, u, length, f"scalar CN {n}^2")
    return n * n / per_step


def _coupled_pieces(ny, nx, ne, dt, dtype):
    import jax
    import jax.numpy as jnp

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

    gap, tau, tc, tbath, d0 = 180.0, 440.0, 1.2, 0.2, 6.0
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(d0, E, gap))
    diff_step, diff_aux = _best_diffusion(op, dtype, coupled=True).make_step_aux(dt)
    col_half = build_pallas_collision_step(
        E_bins=E,
        dE=dE,
        rho=rho,
        K_s0=scattering_kernel_base(E, gap, tau, tc),
        K_r0=recombination_kernel_base(E, gap, tau, tc),
        pmap=pm,
        dt=0.5 * dt,
        update_phonons=True,
        interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(1)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], dtype=dtype)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        dtype=dtype,
    )
    return diff_step, diff_aux, col_half, q0, ph0


def bench_coupled_2d(ny=256, nx=256, ne=16, length=6000) -> dict:
    """Full Strang step (pallas collisions + ADI diffusion), 2D energy-resolved."""
    import jax
    import jax.numpy as jnp

    diff_step, diff_aux, col_half, q0, ph0 = _coupled_pieces(ny, nx, ne, 0.05, jnp.float32)

    @jax.jit
    def chunk_a(state, daux):
        def step(state, _):
            q, ph = state
            q, ph = col_half(q, ph)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return (q, ph), None

        # unroll=4 is the measured optimum at this carry size (8 regresses)
        return jax.lax.scan(step, state, None, length=length, unroll=4)[0]

    chunk = lambda state: chunk_a(state, diff_aux)
    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"coupled 2D {ny}x{nx}x{ne}")
    px_collisions = 2 * ny * nx / per_step
    return {
        "coupled_2d_ms_per_step": per_step * 1e3,
        "collision_pixels_per_s": px_collisions,
        "collision_vs_reference": px_collisions / REFERENCE_COLLISION_PIXELS_PER_S,
    }


def bench_masked_512(n: int = 512, length: int = 80000) -> dict:
    """Driver config #3: ADI CN on a masked 512² donut, absorbing/reflective."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.geometry.raster import rasterize_polygons
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion

    ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    outer = np.column_stack([n / 2 + 0.46 * n * np.cos(ang), n / 2 + 0.46 * n * np.sin(ang)])
    inner = np.column_stack(
        [n / 2 + 0.18 * n * np.cos(ang[::-1]), n / 2 + 0.18 * n * np.sin(ang[::-1])]
    )
    mask = rasterize_polygons([outer, inner], np.arange(n) + 0.5, np.arange(n) + 0.5)
    edges = extract_edge_segments(mask)
    bcs = {}
    for e in edges:
        r = np.hypot(0.5 * (e.x0 + e.x1) - n / 2, 0.5 * (e.y0 + e.y1) - n / 2)
        bcs[e.edge_id] = BoundaryCondition(kind="absorbing" if r > 0.32 * n else "reflective")
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, 6.0)
    one, daux = _best_diffusion(op, jnp.float32).make_step_aux(0.1)

    @jax.jit
    def chunk_a(u, a):
        return jax.lax.scan(lambda c, _: (one(c, a), None), u, None, length=length, unroll=8)[0]

    chunk = lambda u: chunk_a(u, daux)
    u0 = np.zeros((1, n, n), np.float32)
    u0[0][mask] = 1.0
    per_step, _ = _timed_chunk(chunk, jnp.asarray(u0), length, "masked 512^2 donut")
    return {"masked_512_cell_steps_per_s": n * n / per_step}


def bench_coupled_full_scale(length: int = 600, n: int = 1024, ne: int = 16) -> dict:
    """Driver config #5 scale: full coupled physics at 1024² × 16 bins,
    WITH external generation active (the pulse-injection workloads that
    care about speed, VERDICT r2 item 2).

    ``coupled_1024_ms_per_step`` is the engine's DEFAULT stepping
    (strang_mode='auto' → merged seams, g_ext injected at every step's
    exact-mode time — solver/engine.py); ``..._exact`` is the reference's
    per-step C(dt/2) D C(dt/2) composition at the same physics.
    """
    import jax
    import jax.numpy as jnp

    dt, rate = 0.05, 1e-7
    diff_step, diff_aux, col_half, q0, ph0 = _coupled_pieces(n, n, ne, dt, jnp.float32)

    from qpsim_tpu.ops.dos import dynes_density_of_states
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap, tau, tc = 180.0, 440.0, 1.2
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    col_kw = dict(
        E_bins=E,
        dE=dE,
        rho=dynes_density_of_states(E, gap, 0.0),
        K_s0=scattering_kernel_base(E, gap, tau, tc),
        K_r0=recombination_kernel_base(E, gap, tau, tc),
        pmap=build_phonon_frequency_map(E),
        update_phonons=True,
        interpret=jax.default_backend() != "tpu",
    )
    # generation fuses into the collision kernels' VMEM pre-add — the
    # engine's composition (solver/engine.py gen_fused_plane); the plane is
    # a scalar fill, so it constant-folds on device
    col_half_gen = build_pallas_collision_step(dt=0.5 * dt, gen_input=True, **col_kw)
    col_full_gen = build_pallas_collision_step(dt=dt, gen_input=True, **col_kw)

    @jax.jit
    def chunk_exact_a(state, daux):
        def step(state, _):
            q, ph = state
            grow = jnp.full((n, n), dt * rate, jnp.float32)
            q, ph = col_half_gen(q, ph, grow)  # g_ext fused into C(dt/2)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return (q, ph), None

        return jax.lax.scan(step, state, None, length=length, unroll=32)[0]

    chunk = lambda state: chunk_exact_a(state, diff_aux)
    per_exact, _ = _timed_chunk(chunk, (q0, ph0), length, f"coupled {n}^2 x {ne} exact+gen")

    @jax.jit
    def chunk_m_a(state, daux):
        # default (auto→merged) composition with generation at the seams:
        # gC(dt/2) [D gC(dt)]^(L-1) D C(dt/2) — engine segment_runner
        grow = jnp.full((n, n), dt * rate, jnp.float32)

        def step_m(state, _):
            q, ph = state
            q = diff_step(q, daux)
            q, ph = col_full_gen(q, ph, grow)
            return (q, ph), None

        q, ph = state
        q, ph = col_half_gen(q, ph, grow)
        (q, ph), _ = jax.lax.scan(step_m, (q, ph), None, length=length - 1, unroll=32)
        q = diff_step(q, daux)
        q, ph = col_half(q, ph)
        return q, ph

    chunk_m = lambda state: chunk_m_a(state, diff_aux)
    per_step, _ = _timed_chunk(chunk_m, (q0, ph0), length, f"coupled {n}^2 x {ne} default+gen")
    return {
        "coupled_1024_ms_per_step": per_step * 1e3,
        "coupled_1024_ms_per_step_exact_strang": per_exact * 1e3,
    }


def bench_rooflines(n=1024, ne=16, length=1200, adi_length=2400) -> dict:
    """Standalone collision-substep and fused-ADI timings at 1024²×16 with
    machine-checked roofline fractions (VERDICT r1 item 6: the peak-fraction
    claims must be reproducible from bench output, not prose)."""
    import jax
    import jax.numpy as jnp

    _, _, col_half, q0, ph0 = _coupled_pieces(n, n, ne, 0.05, jnp.float32)
    # the ADI roofline times diffusion ALONE — use the standalone (wide-tile)
    # config, not the coupled-composition budget _coupled_pieces selects
    # (tile 256×K=16 measures 0.805 ms vs 0.937 at the coupled 128×K=32)
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.ops.dos import diffusion_coefficient_of_energy
    from qpsim_tpu.ops.energy_grid import build_energy_grid

    _mask = np.ones((n, n), dtype=bool)
    _edges = extract_edge_segments(_mask)
    _bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in _edges}
    _E, _ = build_energy_grid(180.0, 1.0, 4.0, ne)
    _xs, _ys = build_directional_stencils(_mask, _edges, _bcs, 1.0)
    _op = fold_diffusion(_xs, _ys, _mask, 1.0, diffusion_coefficient_of_energy(6.0, _E, 180.0))
    diff_step, diff_aux = _best_diffusion(_op, jnp.float32).make_step_aux(0.05)

    @jax.jit
    def col_chunk(state):
        # unroll=32 matches the engine's auto-tier at 1024²-class carries;
        # measured sweep (2026-08-17): 2.22 (unroll 8) / 2.04 (16) / 1.96
        # (32) / 1.94 (64) ms — the back-edge cost belongs to the scan, not
        # the kernel, so the roofline number uses the production tier.
        return jax.lax.scan(
            lambda c, _: (col_half(*c), None), state, None, length=length, unroll=32
        )[0]

    per_sub, _ = _timed_chunk(col_chunk, (q0, ph0), length, f"collision substep {n}^2x{ne}")
    ops = collision_vpu_op_model(ne) * n * n / per_sub

    @jax.jit
    def adi_chunk_a(u, daux):
        return jax.lax.scan(
            lambda c, _: (diff_step(c, daux), None), u, None, length=adi_length, unroll=32
        )[0]

    adi_chunk = lambda u: adi_chunk_a(u, diff_aux)
    per_adi, _ = _timed_chunk(adi_chunk, q0, adi_length, f"fused ADI {n}^2x{ne}")
    bps = adi_traffic_bytes_model(ne, n, n) / per_adi
    out = {
        "collision_substep_1024_ms": per_sub * 1e3,
        "collision_model_ops_per_s": ops,
        "collision_vpu_peak_fraction": ops / V5E_VPU_F32_OPS_PER_S,
        "adi_1024_ms_per_step": per_adi * 1e3,
        "adi_model_bytes_per_s": bps,
        "adi_hbm_peak_fraction": bps / V5E_HBM_BYTES_PER_S,
    }
    log(
        f"rooflines: collision {out['collision_vpu_peak_fraction']:.2f} of VPU peak, "
        f"ADI {out['adi_hbm_peak_fraction']:.2f} of HBM peak"
    )
    return out


def bench_sharded_overhead_1dev(ny=256, nx=256, ne=16, length=6000) -> dict:
    """shard_map + collective lowering overhead on REAL hardware (VERDICT r2
    item 6): the mesh-path coupled step on a 1-device TPU mesh vs the plain
    single-chip composition at 256²×16.  The only honest multi-chip perf
    statement this 1-chip environment allows; 8-chip expectations are
    extrapolated in ROADMAP.md from the op/traffic model."""
    import jax
    import jax.numpy as jnp

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
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.parallel.mesh import make_mesh
    from qpsim_tpu.parallel.sharded import build_sharded_step

    gap, tau, tc, tbath, d0 = 180.0, 440.0, 1.2, 0.2, 6.0
    dt = 0.05
    mask = np.ones((ny, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    x_st, y_st = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(x_st, y_st, mask, 1.0, diffusion_coefficient_of_energy(d0, E, gap))

    mesh = make_mesh(n_space=1, devices=[jax.devices()[0]])
    sharded = build_sharded_step(
        mesh,
        op,
        dt,
        collisions=dict(
            dE=dE,
            rho=rho,
            K_r0=recombination_kernel_base(E, gap, tau, tc),
            K_s0=scattering_kernel_base(E, gap, tau, tc),
            pmap=pm,
            enable_recombination=True,
            enable_scattering=True,
            update_phonons=True,
            # E_bins selects the Pallas collision kernel on TPU — the same
            # integrator as the plain-composition denominator; without it
            # the sharded step silently falls back to the XLA integrator
            # and the ratio measures kernel choice, not shard_map overhead
            E_bins=E,
        ),
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    q0 = jax.device_put(
        jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], jnp.float32),
        sharded.q_sharding,
    )
    ph0 = jax.device_put(
        jnp.asarray(
            np.broadcast_to(
                thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
                (pm.num_omega, ny, nx),
            ).copy(),
            jnp.float32,
        ),
        sharded.ph_sharding,
    )
    chunk = sharded.make_chunk(length, unroll=4)
    per_sharded, _ = _timed_chunk(
        lambda s: chunk(*s)[:2], (q0, ph0), length, f"sharded 1-dev {ny}x{nx}x{ne}"
    )
    out = {"sharded_1dev_ms_per_step": per_sharded * 1e3}
    # plain-step denominator: reuse the coupled_2d stage's number (same
    # config, measured earlier in this run) rather than re-benchmarking
    plain_ms = _PAYLOAD.get("coupled_2d_ms_per_step")
    if not plain_ms:
        plain_ms = bench_coupled_2d(ny, nx, ne, length)["coupled_2d_ms_per_step"]
    out["sharded_overhead_1dev"] = per_sharded / plain_ms * 1e3

    # distributed-Wang y-sweep at 1 device: the all_gather is a no-op, so
    # this isolates the LOCAL cost side of the wang-vs-pencil tradeoff
    # (XLA elimination scans vs pallas cols solve + transposes); the
    # traffic side is modeled in ROADMAP.md
    sharded_w = build_sharded_step(
        mesh, op, dt,
        collisions=dict(
            dE=dE, rho=rho,
            K_r0=recombination_kernel_base(E, gap, tau, tc),
            K_s0=scattering_kernel_base(E, gap, tau, tc),
            pmap=pm, enable_recombination=True, enable_scattering=True,
            update_phonons=True, E_bins=E,
        ),
        dtype=jnp.float32, y_solve="wang",
    )
    qw = jax.device_put(q0, sharded_w.q_sharding)
    phw = jax.device_put(ph0, sharded_w.ph_sharding)
    chunk_w = sharded_w.make_chunk(length, unroll=4)
    per_wang, _ = _timed_chunk(
        lambda s: chunk_w(*s)[:2], (qw, phw), length,
        f"sharded wang 1-dev {ny}x{nx}x{ne}",
    )
    out["sharded_wang_1dev_ms_per_step"] = per_wang * 1e3

    # merged-Strang composition from the sharded pieces (the engine's mesh
    # default since r3): one collision substep per step, same communication
    pieces = build_sharded_step(
        mesh, op, dt,
        collisions=dict(
            dE=dE, rho=rho,
            K_r0=recombination_kernel_base(E, gap, tau, tc),
            K_s0=scattering_kernel_base(E, gap, tau, tc),
            pmap=pm, enable_recombination=True, enable_scattering=True,
            update_phonons=True, E_bins=E,
        ),
        dtype=jnp.float32, pieces=True,
    )
    if pieces.apply_diffuse is not None:
        raw, src = pieces.aux

        @jax.jit
        def merged_chunk(q, ph, raw, src):
            q, ph = pieces.apply_col_half(q, ph, raw)

            def body(carry, _):
                q, ph = carry
                q = pieces.apply_diffuse(q, raw, src)
                q, ph = pieces.apply_col_full(q, ph, raw)
                return (q, ph), None

            (q, ph), _ = jax.lax.scan(
                body, (q, ph), None, length=length - 1, unroll=4
            )
            q = pieces.apply_diffuse(q, raw, src)
            q, ph = pieces.apply_col_half(q, ph, raw)
            return q, ph

        qm = jax.device_put(q0, pieces.q_sharding)
        phm = jax.device_put(ph0, pieces.ph_sharding)
        per_merged, _ = _timed_chunk(
            lambda s: merged_chunk(*s, raw, src), (qm, phm), length,
            f"sharded merged 1-dev {ny}x{nx}x{ne}",
        )
        out["sharded_merged_1dev_ms_per_step"] = per_merged * 1e3
    return out


def bench_collisions_50bin(ny=256, nx=256, ne=50, length=3000) -> dict:
    """Reference-default energy resolution (50 bins, solver.py:999 defaults):
    collision substeps via the pair-unrolled Pallas kernel (cap 64 bins)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap, tau, tc = 180.0, 440.0, 1.2
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    col = build_pallas_collision_step(
        E_bins=E,
        dE=dE,
        rho=rho,
        K_s0=scattering_kernel_base(E, gap, tau, tc),
        K_r0=recombination_kernel_base(E, gap, tau, tc),
        pmap=pm,
        dt=0.025,
    interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], jnp.float32)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        jnp.float32,
    )

    @jax.jit
    def chunk(state):
        return jax.lax.scan(lambda c, _: (col(*c), None), state, None, length=length, unroll=8)[0]

    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"collisions {ny}x{nx}x{ne}")
    return {
        "collisions_50bin_ms_per_substep": per_step * 1e3,
        "collisions_50bin_pixels_per_s": ny * nx / per_step,
    }


def bench_collisions_100bin(ny=256, nx=256, ne=100, length=300) -> dict:
    """Beyond the pair-unroll envelope (VERDICT r1 item 7): 100 bins rides
    the block-gridded kernel — NE-independent Mosaic compile (~6 s warm vs
    61 s fori_loop) at 1.7x the fori_loop kernel's throughput."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import recombination_kernel_base, scattering_kernel_base
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap, tau, tc = 180.0, 440.0, 1.2
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    col = build_pallas_collision_step(
        E_bins=E,
        dE=dE,
        rho=rho,
        K_s0=scattering_kernel_base(E, gap, tau, tc),
        K_r0=recombination_kernel_base(E, gap, tau, tc),
        pmap=pm,
        dt=0.025,
        tile=512,
    interpret=jax.default_backend() != "tpu",
    )
    rng = np.random.default_rng(2)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], jnp.float32)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        jnp.float32,
    )

    @jax.jit
    def chunk(state):
        return jax.lax.scan(lambda c, _: (col(*c), None), state, None, length=length, unroll=8)[0]

    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"collisions {ny}x{nx}x{ne}")
    return {"collisions_100bin_ms_per_substep": per_step * 1e3}


def bench_analytic_gap_100bin(ny=256, nx=256, ne=100, length=240) -> dict:
    """Continuous gap map beyond the pair-unroll cap: the blocked analytic
    kernel evaluates exact per-pixel kernels from Δ² on the sequential
    Pallas grid — the only fast path there (per-unique-gap stacks are
    (G≈Npix, NE, NE) and unbuildable at production sizes)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.pallas_collisions_blocked import (
        build_pallas_collision_step_blocked_analytic,
    )
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap, tau, tc = 180.0, 440.0, 1.2
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rng = np.random.default_rng(5)
    gp = gap + rng.uniform(-50.0, 0.0, (ny, nx))
    col = build_pallas_collision_step_blocked_analytic(
        E_bins=E, dE=dE, gap_plane=gp, pmap=pm, dt=0.025,
        tau_s=tau, tau_r=tau, T_c=tc, dynes_gamma=0.0,
        interpret=jax.default_backend() != "tpu",
    )
    rho = dynes_density_of_states(E, gap - 25.0, 0.0)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], jnp.float32)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        jnp.float32,
    )

    @jax.jit
    def chunk(state):
        return jax.lax.scan(lambda c, _: (col(*c), None), state, None, length=length, unroll=8)[0]

    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"analytic-gap {ny}x{nx}x{ne}")
    return {"analytic_gap_100bin_ms_per_substep": per_step * 1e3}


def bench_analytic_gap(ny=256, nx=256, ne=16, length=16000) -> dict:
    """Continuous gap map (every pixel a distinct gap): the analytic-gap
    kernel evaluates exact per-pixel kernels from Δ² — no per-gap tables."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.pallas_collisions import build_pallas_collision_step_analytic
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map

    gap, tau, tc = 180.0, 440.0, 1.2
    E, dE = build_energy_grid(gap, 1.0, 4.0, ne)
    pm = build_phonon_frequency_map(E)
    rng = np.random.default_rng(5)
    gp = gap + rng.uniform(-50.0, 20.0, (ny, nx))
    col = build_pallas_collision_step_analytic(
        E_bins=E, dE=dE, gap_plane=gp, pmap=pm, dt=0.025,
        tau_s=tau, tau_r=tau, T_c=tc, dynes_gamma=0.0,
        interpret=jax.default_backend() != "tpu",
    )
    rho = dynes_density_of_states(E, gap, 0.0)
    q0 = jnp.asarray(rng.uniform(0, 1e-5, (ne, ny, nx)) * rho[:, None, None], jnp.float32)
    ph0 = jnp.asarray(
        np.broadcast_to(
            thermal_phonon_occupation(pm.omega_bins, 0.2)[:, None, None],
            (pm.num_omega, ny, nx),
        ).copy(),
        jnp.float32,
    )

    @jax.jit
    def chunk(state):
        return jax.lax.scan(lambda c, _: (col(*c), None), state, None, length=length, unroll=8)[0]

    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"analytic-gap {ny}x{nx}x{ne}")
    return {"analytic_gap_ms_per_substep": per_step * 1e3}


def bench_1d_64bin(nx=4096, ne=64, length=8000) -> dict:
    """Driver config #4: energy-resolved collision integrals, 64 bins × 1D
    space (loop-kernel collisions + ADI diffusion, coupled phonons)."""
    import jax
    import jax.numpy as jnp

    diff_step, diff_aux, col_half, q0, ph0 = _coupled_pieces(1, nx, ne, 0.05, jnp.float32)

    @jax.jit
    def chunk_a(state, daux):
        def step(state, _):
            q, ph = state
            q, ph = col_half(q, ph)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return (q, ph), None

        return jax.lax.scan(step, state, None, length=length, unroll=8)[0]

    chunk = lambda state: chunk_a(state, diff_aux)
    per_step, _ = _timed_chunk(chunk, (q0, ph0), length, f"1D {nx}x{ne}bins")
    return {
        "coupled_1d_64bin_ms_per_step": per_step * 1e3,
        "coupled_1d_64bin_cell_steps_per_s": nx / per_step,
    }


def bench_ensemble_sweep(n_members=32, member=(64, 64), ne=8, length=2500) -> dict:
    """32-member coupled parameter sweep as one super-grid (pallas collisions)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.parallel.ensemble import build_film_ensemble

    ens = build_film_ensemble(
        n_members=n_members,
        member_shape=member,
        num_energy_bins=ne,
        dt=0.05,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    q_members = rng.uniform(0, 1e-5, (n_members, ne, *member))
    ph_members = ens.thermal_phonons(np.linspace(0.1, 0.4, n_members))
    q, ph = ens.pack(q_members, ph_members)

    @jax.jit
    def chunk(state):
        return jax.lax.scan(lambda c, _: (ens.step(*c), None), state, None, length=length, unroll=8)[0]

    state = (jnp.asarray(q, jnp.float32), jnp.asarray(ph, jnp.float32))
    per_step, _ = _timed_chunk(chunk, state, length, f"ensemble {n_members}x{member}x{ne}")
    return {
        "ensemble_members": n_members,
        "ensemble_ms_per_step": per_step * 1e3,
        "ensemble_member_steps_per_s": n_members / per_step,
    }


def bench_diff_grad(n=64, ne=8, n_steps=1000, remat_chunk=32) -> dict:
    """Differentiable-sim gradient throughput: value_and_grad of a coupled
    2D-film run w.r.t. (D0, tau_s, tau_r) with the rematerialized backward
    (checkpointed step + two-level O(√n) schedule) — without remat the
    backward residuals (~P·NE² floats/step) would exceed HBM by 100× at
    this size.  Reports ms per simulated step inside the grad call and the
    grad/forward wall ratio (remat model: ~2 forwards + 1 backward)."""
    import jax
    import jax.numpy as jnp

    from qpsim_tpu.diff import make_differentiable_sim

    mask = np.ones((n, n), dtype=bool)
    sim = make_differentiable_sim(
        mask=mask,
        num_energy_bins=ne,
        dt=0.05,
        n_steps=n_steps,
        n0=1e-4,
        bath_temperature=0.2,
        dtype=jnp.float32,
        remat=True,
        remat_chunk=remat_chunk,
    )
    params = {
        "D0": jnp.asarray(6.0, jnp.float32),
        "tau_s": jnp.asarray(440.0, jnp.float32),
        "tau_r": jnp.asarray(440.0, jnp.float32),
    }
    fwd = jax.jit(lambda p: sim(p)["total"][-1])
    vg = jax.jit(jax.value_and_grad(lambda p: sim(p)["total"][-1]))

    def time_fn(fn):
        _sync(fn(params))  # compile + queue drain
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _sync(fn(params))
            best = min(best, time.time() - t0)
        return best

    t_fwd = time_fn(fwd)
    t_grad = time_fn(vg)
    log(
        f"diff grad {n}x{n}x{ne}, {n_steps} steps: forward {t_fwd:.3f} s, "
        f"grad {t_grad:.3f} s ({t_grad / n_steps * 1e3:.3f} ms/step)"
    )
    return {
        "diffgrad_ms_per_step": t_grad / n_steps * 1e3,
        "diffgrad_over_forward": t_grad / max(t_fwd, 1e-12),
    }


def bench_engine_snapshot_overlap(total_steps=10_000, nx=1024, ne=16) -> dict:
    """VERDICT r2 item 8 witness: the ENGINE's 10k-step MKID run with dense
    snapshots (store_every=10 → 1000 stored frames) vs sparse
    (store_every=10000 → 1 frame).  The depth-1 drain pipeline + async host
    copies (solver/engine.py main loop) must keep the dense run's
    wall-clock within ~15% of the sparse run's."""
    import time as _time

    import numpy as np

    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec
    from qpsim_tpu.solver.engine import run_2d_crank_nicolson

    mask = np.ones((1, nx), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    init = np.zeros(mask.shape)
    init[mask] = 1e-6
    dt = 0.01
    kw = dict(
        mask=mask, edges=edges, edge_conditions=bcs, initial_field=init,
        diffusion_coefficient=6.0, dt=dt, total_time=total_steps * dt, dx=1.0,
        energy_gap=180.0, energy_min_factor=1.0, energy_max_factor=4.0,
        num_energy_bins=ne, enable_recombination=True, enable_scattering=True,
        tau_s=440.0, tau_r=440.0, T_c=1.2, bath_temperature=0.2,
        external_generation=ExternalGenerationSpec(
            mode="pulse", pulse_start=0.0, pulse_duration=2.0, pulse_rate=1e-5
        ),
    )
    out = {}
    for label, se, detail in (
        ("sparse", total_steps, "full"),
        ("dense", 10, "full"),
        # every stored snapshot reduced on device, only ~(nx + 2·ne) floats
        # pulled per frame — the store_every=1-monitoring path
        ("dense_light", 10, "integrated"),
    ):
        run_2d_crank_nicolson(store_every=se, snapshot_detail=detail, **kw)  # warm cache
        t0 = _time.time()
        run_2d_crank_nicolson(store_every=se, snapshot_detail=detail, **kw)
        out[f"engine_mkid_10k_store_{label}_s"] = _time.time() - t0
    out["snapshot_overlap_dense_over_sparse"] = (
        out["engine_mkid_10k_store_dense_s"] / out["engine_mkid_10k_store_sparse_s"]
    )
    out["snapshot_light_dense_over_sparse"] = (
        out["engine_mkid_10k_store_dense_light_s"] / out["engine_mkid_10k_store_sparse_s"]
    )
    log(
        f"engine snapshot overlap: dense/sparse = "
        f"{out['snapshot_overlap_dense_over_sparse']:.3f}, light dense/sparse = "
        f"{out['snapshot_light_dense_over_sparse']:.3f}"
    )
    return out


def bench_mkid_pulse(total_steps=10_000, nx=1024, ne=16) -> dict:
    """10k-step MKID pulse: 1D wire, coupled scattering+recombination+pulse."""
    import jax
    import jax.numpy as jnp

    dt = 0.01
    diff_step, diff_aux, col_half, q0, ph0 = _coupled_pieces(1, nx, ne, dt, jnp.float32)
    pulse_rate, pulse_end = 1e-5, 2.0
    chunk_len = min(2000, total_steps)

    @jax.jit
    def run_chunk_a(state, i0, daux):
        def step(state, i):
            q, ph = state
            t = i.astype(jnp.float32) * dt
            q = q + jnp.where(t < pulse_end, dt * pulse_rate, 0.0)
            q, ph = col_half(q, ph)
            q = diff_step(q, daux)
            q, ph = col_half(q, ph)
            return (q, ph), None

        return jax.lax.scan(step, state, i0 + jnp.arange(chunk_len), unroll=8)[0]

    run_chunk = lambda state, i0: run_chunk_a(state, i0, diff_aux)

    state = (q0, ph0)
    state = run_chunk(state, jnp.asarray(0))
    _sync(state)  # warmup (first chunk re-used as burn-in)
    t0 = time.time()
    done = chunk_len
    while done < total_steps:
        state = run_chunk(state, jnp.asarray(done))
        done += chunk_len
    _sync(state)
    wall = (time.time() - t0) * total_steps / max(1, done - chunk_len)
    log(f"mkid pulse: {wall:.2f}s per {total_steps} steps")
    return {"mkid_pulse_10k_steps_wallclock_s": wall}


# --- outage-proof emission ---------------------------------------------------
# The axon tunnel can be hard-down (observed r2: backend init raises
# UNAVAILABLE, or worse, every dispatch hangs forever).  The contract is that
# this script ALWAYS prints exactly one parseable JSON line and exits 0, so
# the driver's BENCH artifact never ends up rc=1/empty again:
#   1. backend health is probed in a SUBPROCESS with a hard timeout (a hung
#      tunnel blocks in C code; no in-process timeout can interrupt it);
#   2. a watchdog thread emits whatever has been measured so far and
#      os._exit(0)s if the whole run exceeds its deadline (mid-run hangs);
#   3. each sub-benchmark is exception-isolated, accumulating into a shared
#      payload so partial results survive.

_PAYLOAD: dict = {
    "metric": "cell-steps/sec (2D CN, 1024^2 grid)",
    "value": 0.0,
    "unit": "cell-steps/s",
    "vs_baseline": 0.0,
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _emit() -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
        print(json.dumps(_PAYLOAD), flush=True)


def _payload_update(fields: dict | None) -> None:
    """Stage results enter the payload under the emit lock: the watchdog
    thread may serialize it concurrently."""
    with _EMIT_LOCK:
        _PAYLOAD.update(fields or {})


def _watchdog_fire() -> None:
    try:
        _emit()
    finally:
        os._exit(0)  # the hang the watchdog breaks would otherwise persist


def _probe_backend(timeout_s: float) -> bool:
    """Trivial jit in a child process with a hard timeout (CLAUDE.md rule:
    probe tunnel health before queueing TPU work; a hung tunnel blocks in
    native code, so the timeout must live outside the process)."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print(jax.default_backend());"
        "print(float(jax.jit(lambda x: x + 1)(jnp.ones(()))))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        log(f"backend probe timed out after {timeout_s:.0f}s")
        return False
    if r.returncode != 0:
        log(f"backend probe failed rc={r.returncode}: {r.stderr.strip()[-400:]}")
        return False
    log(f"backend probe ok: {r.stdout.split()[0]}")
    return True


def _last_captured() -> dict:
    """Most recent checked-in hardware capture, for the outage payload.

    The tunnel has been down at the driver's capture instant three rounds
    straight while credible builder captures sat in BENCH_CAPTURED_r*.json —
    a 0.0/tpu_unavailable artifact must at least point at them (VERDICT r4
    weak #4).  Values come from the newest capture file next to this script;
    timestamp/commit from git when available, file mtime otherwise.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    captures = sorted(
        f for f in os.listdir(here)
        if f.startswith("BENCH_CAPTURED_r") and f.endswith(".json")
    )
    if not captures:
        return {"note": "no checked-in hardware capture found"}
    path = os.path.join(here, captures[-1])
    try:
        with open(path) as fh:
            data = json.load(fh)
    except Exception as exc:  # noqa: BLE001
        return {"file": captures[-1], "note": f"unreadable: {exc}"}
    out = {
        "note": (
            "builder-run TPU capture checked into the repo; the live probe "
            "timed out at this capture instant (tunnel outage), not a "
            "missing implementation"
        ),
        "file": captures[-1],
    }
    for key in (
        "value", "unit", "vs_baseline", "mkid_pulse_10k_steps_wallclock_s",
        "coupled_1024_ms_per_step", "adi_1024_ms_per_step",
        "collision_substep_1024_ms",
    ):
        if key in data:
            out[key] = data[key]
    try:
        r = subprocess.run(
            ["git", "log", "-1", "--format=%H %cI", "--", captures[-1]],
            cwd=here, capture_output=True, text=True, timeout=10,
        )
        if r.returncode == 0 and r.stdout.strip():
            commit, stamp = r.stdout.strip().split(" ", 1)
            out["source_commit"] = commit
            out["captured_at"] = stamp
    except Exception:  # noqa: BLE001 — git metadata is best-effort
        pass
    if "captured_at" not in out:
        out["captured_at"] = time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(path))
        )
    return out


def main() -> None:
    probe_timeout = float(os.environ.get("QPSIM_BENCH_PROBE_TIMEOUT_S", "90"))
    deadline = float(os.environ.get("QPSIM_BENCH_DEADLINE_S", "3000"))
    smoke_mode = os.environ.get("QPSIM_BENCH_SMOKE") == "1"
    if smoke_mode:
        # wiring check at tiny shapes: force the CPU backend in-process
        # (env JAX_PLATFORMS is overridden by this image's axon hook; only
        # the config update before first backend use works) and skip the
        # TPU probe
        import jax

        jax.config.update("jax_platforms", "cpu")
    elif not _probe_backend(probe_timeout):
        _PAYLOAD["error"] = "tpu_unavailable"
        _PAYLOAD["last_captured"] = _last_captured()
        _emit()
        return

    watchdog = threading.Timer(deadline, _watchdog_fire)
    watchdog.daemon = True
    watchdog.start()

    import jax

    from qpsim_tpu.utils.compile_cache import maybe_enable_persistent_cache

    cache_dir = maybe_enable_persistent_cache()
    log(f"persistent compile cache: {cache_dir}")
    _payload_update({"backend": jax.default_backend()})
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    def _headline(**kw) -> dict:
        rate = bench_scalar_cn_1024(**kw)
        return {
            "value": rate,
            "vs_baseline": rate / REFERENCE_SCALAR_1024_CELL_STEPS_PER_S,
        }

    # QPSIM_BENCH_SMOKE=1 runs every stage end-to-end at tiny shapes (CPU
    # interpret-mode Pallas) — a wiring check, not a measurement; tested in
    # tests/test_bench.py so stage regressions surface before TPU time
    smoke = smoke_mode
    smoke_kw: dict[str, dict] = {
        "scalar_cn_1024": dict(n=64, length=8),
        "masked_512": dict(n=64, length=8),
        "coupled_2d": dict(ny=16, nx=16, ne=6, length=4),
        "coupled_full_scale": dict(n=32, ne=6, length=4),
        "rooflines": dict(n=32, ne=6, length=4, adi_length=4),
        "sharded_overhead": dict(ny=16, nx=16, ne=4, length=4),
        "collisions_50bin": dict(ny=8, nx=8, ne=12, length=3),
        "collisions_100bin": dict(ny=8, nx=8, ne=72, length=2),
        "analytic_gap": dict(ny=8, nx=8, ne=6, length=3),
        "analytic_gap_100bin": dict(ny=8, nx=8, ne=72, length=2),
        "coupled_1d_64bin": dict(nx=64, ne=12, length=3),
        "ensemble_sweep": dict(n_members=4, member=(8, 8), ne=4, length=4),
        "mkid_pulse": dict(total_steps=40, nx=32, ne=6),
        "snapshot_overlap": dict(total_steps=40, nx=32, ne=6),
        "diff_grad": dict(n=8, ne=4, n_steps=12, remat_chunk=4),
    }

    errors: dict[str, str] = {}
    # Stage ORDER is evidence priority, not logical grouping: if the tunnel
    # is slow enough that the watchdog fires mid-run, the partial payload
    # should already hold the driver-contract metrics (headline cell-steps/s,
    # MKID pulse wall-clock — BASELINE.json) and the VERDICT done-criteria
    # (flagship coupled step, roofline witnesses, sharded overhead, snapshot
    # overlap) before the long-compile tails (NE=64 Mosaic ~2 min cold,
    # ensembles) get their turn.
    stages = [
        ("scalar_cn_1024", _headline),
        ("mkid_pulse", bench_mkid_pulse),
        ("coupled_full_scale", bench_coupled_full_scale),
        ("rooflines", bench_rooflines),
        ("sharded_overhead", bench_sharded_overhead_1dev),
        ("snapshot_overlap", bench_engine_snapshot_overlap),
        ("collisions_100bin", bench_collisions_100bin),
        ("collisions_50bin", bench_collisions_50bin),
        ("coupled_2d", bench_coupled_2d),
        ("masked_512", bench_masked_512),
        ("analytic_gap", bench_analytic_gap),
        ("analytic_gap_100bin", bench_analytic_gap_100bin),
        ("coupled_1d_64bin", bench_1d_64bin),
        ("ensemble_sweep", bench_ensemble_sweep),
        ("diff_grad", bench_diff_grad),
    ]
    for name, fn in stages:
        try:
            _payload_update(fn(**(smoke_kw[name] if smoke else {})))
        except Exception as exc:  # noqa: BLE001 — isolate per stage, keep going
            log(f"stage {name} FAILED: {type(exc).__name__}: {exc}")
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    if errors:
        _payload_update({"stage_errors": errors})
    if smoke:
        _payload_update({"smoke": True})
    _emit()
    watchdog.cancel()


if __name__ == "__main__":
    main()
