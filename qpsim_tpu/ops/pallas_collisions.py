"""Pallas TPU kernel: fused Fischer–Catelani collision substep.

The XLA collision path (``ops.collisions``) materialises (P, NE, NE) pair
tensors in HBM — at 256²×16 bins that is ~0.5 GB of traffic per substep and
it dominates the step time.  This kernel keeps a tile of pixels entirely in
VMEM and walks the NE² energy-pair interactions as **statically unrolled
row operations** (pixels on lanes), so HBM sees each state element exactly
once per substep.

It exploits the structure of the standard cell-centered energy grid:
E_i − E_j and E_i + E_j depend only on i−j and i+j (Toeplitz/Hankel), so
the phonon-occupation lookups are NE+2NE−1 static rows of n_ph — no
gathers — and the kernel coefficients K^s₀/K^r₀ are baked in as scalar
constants.  Pairs are walked **unordered**: (i,j) and (j,i) share the
phonon row, and the recombination orderings share the pair products
q_i·q_j / partner_i·partner_j (their kernel constants just add), so the
VPU op count is ~1.5x below the ordered walk.  The phonon-ODE ``b``
coefficient is assembled as ONE per-ω-row subtraction of a positive
(emission+recombination) and a negative (absorption+pair-breaking)
accumulator table instead of two per-pair accumulations.

Layout note: pixels ride the lane dimension as 1D rows, which Mosaic
packs densely; an (NE, 8, lanes) slab layout (``block3d=True``) was
measured ~20% SLOWER at 1024²x16 (strided HBM DMA per block) and is kept
only for experiments.

Supported: uniform gap, uniform energy grid (the production configuration),
NE ≤ 64 (covers the reference's 50-bin default; beyond that and for
piecewise gap maps the fori_loop kernel takes over); the general path stays
on ``ops.collisions``.  Physics and update formulas are identical (see that
module's docstring); parity is tested in interpret mode and on hardware.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .phonon_map import PhononFrequencyMap

__all__ = [
    "build_pallas_collision_step",
    "build_pallas_collision_step_analytic",
    "pallas_collisions_supported",
    "pallas_analytic_collisions_supported",
]

_EPS_RHO = 1e-30
_MU_FLOOR = 1e-14
_AFFINE_CLIP = 80.0
_DEFAULT_TILE = 2048
#: static-unroll envelope: compile time grows ~NE² (measured ~25 s Mosaic
#: compile at 50 bins, which buys a 4.8x faster substep than the fori_loop
#: kernel — 1.03 vs 4.96 ms at 50×256²); VMEM at 64 bins ≈ 4.2 MB
_MAX_UNROLLED_BINS = 64
#: multi-gap blending adds up to 3(G−1) selects per pair, so the unroll cap
#: drops to keep Mosaic compile times in the measured single-gap range
_MAX_UNROLLED_BINS_MULTIGAP = 32


def _expm1(x):
    """expm1 substitute — the primitive has no Pallas TPU lowering.

    Taylor below |x| < 1e-2 (relative error ~x⁴/120 ≲ 1e-10), exp(x)−1 above,
    where cancellation is no longer an issue.
    """
    taylor = x * (1.0 + x * (0.5 + x * ((1.0 / 6.0) + x * (1.0 / 24.0))))
    return jnp.where(jnp.abs(x) < 1e-2, taylor, jnp.exp(x) - 1.0)


def _uniform_pair_rows(E_bins: np.ndarray, pmap: PhononFrequencyMap):
    """Static ω-row tables for a uniform grid: diff_row[k]=ω(k·dE), sum_row[m].

    Returns ``None`` when the grid is non-uniform — or when the ω-bin
    assignment is NOT constant along the Toeplitz/Hankel diagonals.  The
    latter genuinely happens: the ω grid deduplicates pair energies with the
    reference's round-at-1e-12 (phonon_map.py), which fails to merge
    floating-point near-duplicates at magnitudes ≳ 1, so one physical
    diagonal can straddle two ω bins (e.g. NE=11 at Δ=180, E_max/Δ=4).  A
    kernel that collapses such a diagonal to one row silently deviates from
    the reference's binning; callers that rely on these collapsed rows (the
    fori_loop kernel) must fall back instead.  The pair-unrolled kernels
    read the exact per-pair ``idx_diff``/``idx_sum`` maps and don't care.
    """
    ne = E_bins.size
    diffs = np.diff(E_bins)
    if ne > 1 and not np.allclose(diffs, diffs[0], rtol=1e-9):
        return None
    for k in range(1, ne):
        i = np.arange(k, ne)
        if not np.all(pmap.idx_diff[i, i - k] == pmap.idx_diff[k, 0]):
            return None
    for m in range(2 * ne - 1):
        i = np.arange(max(0, m - ne + 1), min(ne, m + 1))
        if not np.all(pmap.idx_sum[i, m - i] == pmap.idx_sum[i[0], m - i[0]]):
            return None
    diff_row = [int(pmap.idx_diff[k, 0]) for k in range(ne)]  # |E_k − E_0| = k·dE
    sum_row = [int(pmap.idx_sum[min(m, ne - 1), m - min(m, ne - 1)]) for m in range(2 * ne - 1)]
    return diff_row, sum_row


def _grid_uniform(E_bins: np.ndarray) -> bool:
    diffs = np.diff(E_bins)
    return E_bins.size < 2 or bool(np.allclose(diffs, diffs[0], rtol=1e-9))


#: block-gridded kernel envelope: its VMEM-aware lane-tile clamp keeps the
#: working set (state + reversed copies + ~3NE phonon rows per tile)
#: inside the 16 MB budget — measured on v5e up to 256 bins (56 ms at
#: 256×256² f32, tile 256, clean NE² scaling from the 100-bin point)
_MAX_LOOP_BINS = 256
#: non-uniform gap maps blend per-gap tables with selects in the loop
#: kernel — linear cost in G, practical for piecewise-constant maps only
_MAX_LOOP_GAPS = 8


def pallas_collisions_supported(E_bins: np.ndarray, n_gaps: int) -> bool:
    e = np.asarray(E_bins)
    if e.size < 2 or e.size > _MAX_LOOP_BINS or not 1 <= n_gaps <= _MAX_LOOP_GAPS:
        return False
    diffs = np.diff(e)
    return bool(np.allclose(diffs, diffs[0], rtol=1e-9))


def pallas_analytic_collisions_supported(E_bins: np.ndarray) -> bool:
    """Envelope of the analytic-gap kernel: uniform grid, 2 ≤ NE ≤ 64."""
    e = np.asarray(E_bins)
    if e.size < 2 or e.size > _MAX_UNROLLED_BINS:
        return False
    diffs = np.diff(e)
    return bool(np.allclose(diffs, diffs[0], rtol=1e-9))


@dataclass(frozen=True)
class _Physics:
    ne: int
    nw: int
    nw_pad: int
    dE: float
    n_gaps: int
    Ks: tuple | None  # (G, NE, NE) nested tuples of python floats
    Kr: tuple | None
    rho: tuple  # (G, NE)
    idx_diff: tuple  # (NE, NE) nested ints: exact per-pair ω rows
    idx_sum: tuple
    update_phonons: bool


def _walk_order(walk: str | None) -> str:
    """Resolve the pair-walk emission order ('pair' | 'diag').

    ``None`` defers to ``QPSIM_COLL_WALK`` (hardware A/B lever; the engine
    program cache fingerprints it).  Both orders compute identical op sets —
    they differ only in instruction order, i.e. in register live ranges and
    float accumulation order (roundoff-level result differences).
    """
    w = walk if walk is not None else os.environ.get("QPSIM_COLL_WALK", "pair")
    if w not in ("pair", "diag"):
        raise ValueError(f"unknown collision walk order: {w!r}")
    return w


def _make_kernel(phys: _Physics, dt: float, gen_input: bool = False, walk: str = "pair"):
    ne = phys.ne
    dE = phys.dE
    G = phys.n_gaps
    Ks, Kr, rho = phys.Ks, phys.Kr, phys.rho
    idx_diff, idx_sum = phys.idx_diff, phys.idx_sum
    dt = float(dt)

    def kernel(*refs):
        gen_ref = None
        if G > 1:
            if gen_input:
                q_ref, ph_ref, gid_ref, gen_ref, q_out, ph_out = refs
            else:
                q_ref, ph_ref, gid_ref, q_out, ph_out = refs
            gm = gid_ref[0]
            # per-tile gap masks, computed ONCE; the last gap is the
            # fallback branch of every blend
            masks = [gm == g for g in range(G - 1)]
        elif gen_input:
            q_ref, ph_ref, gen_ref, q_out, ph_out = refs
        else:
            q_ref, ph_ref, q_out, ph_out = refs

        def blend(vals):
            """Per-pixel select over per-gap scalar constants.

            Returns a python float when all gaps agree (scalar fast path —
            always taken at G == 1), else folds G−1 lane selects.
            """
            if all(v == vals[0] for v in vals[1:]):
                return vals[0]
            acc = vals[G - 1]
            for g in range(G - 2, -1, -1):
                acc = jnp.where(masks[g], vals[g], acc)
            return acc

        if gen_ref is not None:
            # fused forward-Euler generation: n += dt·g(t) lands on the
            # VMEM-resident tile before the pair walk, replacing a full
            # state HBM round-trip (a standalone XLA add costs ~0.27 ms at
            # 1024²×16 — ~8% of the merged flagship step)
            g_add = gen_ref[0]
            q = [q_ref[i] + g_add for i in range(ne)]
        else:
            q = [q_ref[i] for i in range(ne)]
        partner = []
        for i in range(ne):
            rg = [rho[g][i] for g in range(G)]
            if all(r <= _EPS_RHO for r in rg):
                partner.append(jnp.zeros_like(q[i]))
                continue
            r = blend(rg)
            inv = blend([1.0 / r_ if r_ > _EPS_RHO else 0.0 for r_ in rg])
            p = r * jnp.maximum(1.0 - q[i] * inv, 0.0)
            if any(r_ <= _EPS_RHO for r_ in rg):
                # gaps whose DOS vanishes in this bin contribute no partner
                p = p * blend([1.0 if r_ > _EPS_RHO else 0.0 for r_ in rg])
            partner.append(p)

        # exact per-pair phonon-occupation rows, fetched once per distinct ω
        # bin (the ω grid can split a Toeplitz diagonal into near-duplicate
        # bins — see _uniform_pair_rows; idx maps keep the reference binning)
        _rows: dict[int, jax.Array] = {}

        def ph_row(idx):
            if idx not in _rows:
                _rows[idx] = ph_ref[idx]
            return _rows[idx]

        # 1 + D hoisted per distinct ω row: every pair on a Toeplitz diagonal
        # shares it, turning the per-pair emission weight into one multiply
        _rows1: dict[int, jax.Array] = {}

        def ph_row_plus1(idx):
            if idx not in _rows1:
                _rows1[idx] = ph_row(idx) + 1.0
            return _rows1[idx]

        zeros = jnp.zeros_like(q[0])
        # ONE gain accumulator per bin (scattering Σ Ks·Np·q and
        # recombination Σ Kr·S·partner add into the same row): the final
        # update only ever uses their sum, and halving the accumulator
        # count shortens NE tile-wide live ranges across the unrolled body
        gain = [zeros for _ in range(ne)]
        loss = [zeros for _ in range(ne)]
        # ω-row base accumulators: the phonon ODE coefficients are
        # a = Σ(emission + recombination bases)           (creation rate)
        # b = a − Σ(absorption + pair-breaking bases)     (net growth rate)
        # so only the positive (ph_pos) and negative (ph_neg) tables are
        # accumulated per pair; b is formed by ONE subtraction per ω row.
        ph_pos: dict[int, jax.Array] = {}
        ph_neg: dict[int, jax.Array] = {}

        def acc(table, idx, val):
            cur = table.get(idx)
            table[idx] = val if cur is None else cur + val

        is_zero = lambda v: isinstance(v, float) and v == 0.0

        # Unordered pair walk: (i, j) and (j, i) share the phonon-occupation
        # row (Toeplitz/Hankel structure) and — for recombination — the pair
        # products q_i·q_j and partner_i·partner_j, so each is computed once.
        # With G > 1 every kernel constant is a per-pixel blend (G−1 selects)
        # of the per-gap tables — the unique-gap cache of the reference
        # (solver.py:1203-1232) in kernel form.
        def scatter_pair(i, j):
            # scattering at offset k = i−j: emission (i→j) dressed by
            # 1+D, absorption (j→i) dressed by D at the pair's ω bin.
            # The base kernel is symmetric (K_s0[i,j] = K_s0[j,i] —
            # shared (Eᵢ−Eⱼ)²·(1−Δ²/EᵢEⱼ) form), so ce == ca and one
            # blend serves both orderings; the asymmetric branch is
            # kept for generality but never taken by the physics.
            ce_vals = [dE * Ks[g][i][j] for g in range(G)]
            ca_vals = [dE * Ks[g][j][i] for g in range(G)]
            ce = blend(ce_vals)
            ca = ce if ce_vals == ca_vals else blend(ca_vals)
            if not is_zero(ce):
                we = ce * ph_row_plus1(idx_diff[i][j])
                loss[i] = loss[i] + we * partner[j]
                gain[j] = gain[j] + we * q[i]
                if phys.update_phonons:
                    acc(ph_pos, idx_diff[i][j], ce * (q[i] * partner[j]))
            if not is_zero(ca):
                wa = ca * ph_row(idx_diff[i][j])
                loss[j] = loss[j] + wa * partner[i]
                gain[i] = gain[i] + wa * q[j]
                if phys.update_phonons:
                    acc(ph_neg, idx_diff[i][j], ca * (q[j] * partner[i]))

        def recomb_pair(i, j):
            kr_ij = [Kr[g][i][j] for g in range(G)]
            kr_ji = [Kr[g][j][i] for g in range(G)]
            s_ij = ph_row(idx_sum[i][j])
            if i == j:
                c = blend([2.0 * dE * v for v in kr_ij])
                if not is_zero(c):
                    A = c * s_ij
                    loss[i] = loss[i] + (A + c) * q[i]
                    gain[i] = gain[i] + A * partner[i]
                    if phys.update_phonons:
                        m = idx_sum[i][i]
                        hb = 0.5 * c
                        acc(ph_pos, m, hb * (q[i] * q[i]))
                        acc(ph_neg, m, hb * (partner[i] * partner[i]))
                return
            symmetric = kr_ij == kr_ji
            c = blend([2.0 * dE * v for v in kr_ij])
            if symmetric:
                if not is_zero(c):
                    # symmetric kernel (the physical case): share
                    # the dressed weights across both orderings
                    A = c * s_ij
                    B = A + c
                    loss[i] = loss[i] + B * q[j]
                    loss[j] = loss[j] + B * q[i]
                    gain[i] = gain[i] + A * partner[j]
                    gain[j] = gain[j] + A * partner[i]
            else:
                cr = blend([2.0 * dE * v for v in kr_ji])
                for a, b, cab in ((i, j, c), (j, i, cr)):
                    if not is_zero(cab):
                        Aab = cab * s_ij
                        loss[a] = loss[a] + (Aab + cab) * q[b]
                        gain[a] = gain[a] + Aab * partner[b]
            if phys.update_phonons:
                # both orderings emit the same ω row; constants add
                c2 = blend([dE * (u + v) for u, v in zip(kr_ij, kr_ji)])
                if not is_zero(c2):
                    m = idx_sum[i][j]
                    acc(ph_pos, m, c2 * (q[i] * q[j]))
                    acc(ph_neg, m, c2 * (partner[i] * partner[j]))

        if walk == "diag":
            # Diagonal-major emission order: scattering walks Toeplitz
            # diagonals k = i−j (each diff ω row's loads and accumulator
            # touches become NE−k consecutive pairs), recombination walks
            # Hankel anti-diagonals m = i+j (ditto for sum rows).  Op count
            # is identical to the pair-major walk — only instruction order
            # changes, compacting each ω row's live range so the register
            # allocator can retire it instead of spilling it across the
            # whole unrolled body.
            if Ks is not None:
                for k in range(1, ne):
                    for j in range(ne - k):
                        scatter_pair(j + k, j)
            if Kr is not None:
                for m in range(2 * ne - 1):
                    for j in range(max(0, m - ne + 1), m // 2 + 1):
                        recomb_pair(m - j, j)
        else:
            for i in range(ne):
                for j in range(i + 1):
                    if Ks is not None and i != j:
                        scatter_pair(i, j)
                    if Kr is not None:
                        recomb_pair(i, j)

        # QP update: positivity-preserving exponential relaxation.  The
        # expm1 substitute reuses the already-computed decay for its
        # large-|x| branch (1 − e⁻ˣ is cancellation-free there), keeping the
        # Taylor guard for small x — one transcendental per bin, not two.
        for i in range(ne):
            g_tot = partner[i] * gain[i]
            mu = jnp.maximum(loss[i], 0.0)
            x = mu * dt
            decay = jnp.exp(-x)
            taylor = x * (1.0 - x * (0.5 - x * ((1.0 / 6.0) - x * (1.0 / 24.0))))
            one_minus_decay = jnp.where(x < 1e-2, taylor, 1.0 - decay)
            coeff = jnp.where(mu < _MU_FLOOR, dt, one_minus_decay / jnp.maximum(mu, _MU_FLOOR))
            q_out[i] = jnp.maximum(decay * q[i] + coeff * jnp.maximum(g_tot, 0.0), 0.0)

        # phonon update: frozen-coefficient affine growth on touched ω rows
        for w in range(phys.nw_pad):
            if phys.update_phonons and (w in ph_pos or w in ph_neg):
                y = ph_ref[w]
                a_term = ph_pos.get(w, zeros)
                neg = ph_neg.get(w)
                b_term = a_term if neg is None else a_term - neg
                x = jnp.clip(b_term * dt, -_AFFINE_CLIP, _AFFINE_CLIP)
                safe_b = jnp.where(jnp.abs(b_term) < _MU_FLOOR, 1.0, b_term)
                # one transcendental per row: the growth factor e^x doubles
                # as the large-|x| branch of the expm1 substitute
                ex = jnp.exp(x)
                taylor = x * (1.0 + x * (0.5 + x * ((1.0 / 6.0) + x * (1.0 / 24.0))))
                em1 = jnp.where(jnp.abs(x) < 1e-2, taylor, ex - 1.0)
                coeff = jnp.where(jnp.abs(b_term) < _MU_FLOOR, dt, em1 / safe_b)
                ph_out[w] = jnp.maximum(ex * y + coeff * a_term, 0.0)
            else:
                ph_out[w] = ph_ref[w]

    return kernel


@dataclass(frozen=True)
class _AnalyticPhysics:
    """Per-pair affine-in-Δ² kernel tables for the analytic-gap walk.

    K^r₀(Δ) = a_r + b_r·Δ² and K^s₀(Δ) = max(a_s − b_s·Δ², 0) exactly
    (kernels.py formulas), and ρ_Dynes is a closed form of Δ² — so a single
    per-pixel Δ² row replaces the per-gap tables, with no bound on the
    number of distinct gap values (reference solver.py:1203-1232 builds a
    unique-gap cache instead; continuous gap maps defeat it).
    """

    ne: int
    nw: int
    nw_pad: int
    gamma: float
    E: tuple  # bin centers
    invE: tuple
    dEa_s: tuple | None  # dE·a_s, dE·b_s (NE, NE)
    dEb_s: tuple | None
    dEa2_r: tuple | None  # 2·dE·a_r, 2·dE·b_r (NE, NE)
    dEb2_r: tuple | None
    idx_diff: tuple  # (NE, NE) nested ints: exact per-pair ω rows
    idx_sum: tuple
    update_phonons: bool


def _make_analytic_kernel(
    phys: _AnalyticPhysics, dt: float, gen_input: bool = False, walk: str = "pair"
):
    ne = phys.ne
    gamma = phys.gamma
    scattering = phys.dEa_s is not None
    recombination = phys.dEa2_r is not None
    idx_diff, idx_sum = phys.idx_diff, phys.idx_sum
    dt = float(dt)

    def kernel(*refs):
        if gen_input:
            q_ref, ph_ref, g2_ref, gen_ref, q_out, ph_out = refs
        else:
            q_ref, ph_ref, g2_ref, q_out, ph_out = refs
        g2 = g2_ref[0]  # Δ²(px)
        if gen_input:
            # fused forward-Euler generation (see _make_kernel)
            g_add = gen_ref[0]
            q = [q_ref[i] + g_add for i in range(ne)]
        else:
            q = [q_ref[i] for i in range(ne)]

        # per-bin DOS and its reciprocal from Δ²(px), in closed form
        partner = []
        for i in range(ne):
            E = phys.E[i]
            if gamma == 0.0:
                r2 = (E * E) - g2
                t = jax.lax.rsqrt(jnp.maximum(r2, _EPS_RHO))
                pos = r2 > 0.0
                rho_i = jnp.where(pos, E * t, 0.0)
                inv_i = jnp.where(pos, (r2 * t) * phys.invE[i], 0.0)
            else:
                # Dynes: ρ = max(Re((E−iΓ)/√((E−iΓ)²−Δ²)), 0); with
                # z = (E²−Γ²−Δ²) − 2iEΓ the principal root is s + i·t,
                # s = √((|z|+Re z)/2), t = −√((|z|−Re z)/2) (Im z < 0)
                zr = (E * E - gamma * gamma) - g2
                zi = -2.0 * E * gamma
                r = jnp.sqrt(zr * zr + zi * zi)
                s = jnp.sqrt(jnp.maximum(0.5 * (r + zr), 0.0))
                tq = -jnp.sqrt(jnp.maximum(0.5 * (r - zr), 0.0))
                rho_i = jnp.maximum((E * s - gamma * tq) / jnp.maximum(r, _EPS_RHO), 0.0)
                inv_i = jnp.where(rho_i > _EPS_RHO, 1.0 / jnp.maximum(rho_i, _EPS_RHO), 0.0)
            partner.append(rho_i * jnp.maximum(1.0 - q[i] * inv_i, 0.0))

        _rows: dict[int, jax.Array] = {}

        def ph_row(idx):
            if idx not in _rows:
                _rows[idx] = ph_ref[idx]
            return _rows[idx]

        # 1 + D hoisted once per distinct ω row (shared along each diagonal)
        _rows1: dict[int, jax.Array] = {}

        def ph_row_plus1(idx):
            if idx not in _rows1:
                _rows1[idx] = ph_row(idx) + 1.0
            return _rows1[idx]

        zeros = jnp.zeros_like(q[0])
        # one merged gain accumulator per bin (see _make_kernel)
        gain = [zeros for _ in range(ne)]
        loss = [zeros for _ in range(ne)]
        ph_pos: dict[int, jax.Array] = {}
        ph_neg: dict[int, jax.Array] = {}

        def acc(table, idx, val):
            cur = table.get(idx)
            table[idx] = val if cur is None else cur + val

        # unordered pair walk — same structure as _make_kernel, with the
        # kernel constants evaluated per pixel from Δ² (2-3 ops per pair)
        def scatter_pair(i, j):
            Dk = ph_row(idx_diff[i][j])
            # symmetric in (i,j): one constant serves both orders
            cs = jnp.maximum(phys.dEa_s[i][j] - phys.dEb_s[i][j] * g2, 0.0)
            we = cs * ph_row_plus1(idx_diff[i][j])
            wa = cs * Dk
            loss[i] = loss[i] + we * partner[j]
            gain[j] = gain[j] + we * q[i]
            loss[j] = loss[j] + wa * partner[i]
            gain[i] = gain[i] + wa * q[j]
            if phys.update_phonons:
                acc(ph_pos, idx_diff[i][j], cs * (q[i] * partner[j]))
                acc(ph_neg, idx_diff[i][j], cs * (q[j] * partner[i]))

        def recomb_pair(i, j):
            s_ij = ph_row(idx_sum[i][j])
            c = phys.dEa2_r[i][j] + phys.dEb2_r[i][j] * g2  # = 2dE·K^r₀
            A = c * s_ij
            B = A + c
            if i == j:
                loss[i] = loss[i] + B * q[i]
                gain[i] = gain[i] + A * partner[i]
                if phys.update_phonons:
                    m = idx_sum[i][i]
                    hb = 0.5 * c
                    acc(ph_pos, m, hb * (q[i] * q[i]))
                    acc(ph_neg, m, hb * (partner[i] * partner[i]))
            else:
                loss[i] = loss[i] + B * q[j]
                loss[j] = loss[j] + B * q[i]
                gain[i] = gain[i] + A * partner[j]
                gain[j] = gain[j] + A * partner[i]
                if phys.update_phonons:
                    m = idx_sum[i][j]
                    acc(ph_pos, m, c * (q[i] * q[j]))
                    acc(ph_neg, m, c * (partner[i] * partner[j]))

        if walk == "diag":
            # diagonal-major order — see _make_kernel for the rationale
            if scattering:
                for k in range(1, ne):
                    for j in range(ne - k):
                        scatter_pair(j + k, j)
            if recombination:
                for m in range(2 * ne - 1):
                    for j in range(max(0, m - ne + 1), m // 2 + 1):
                        recomb_pair(m - j, j)
        else:
            for i in range(ne):
                for j in range(i + 1):
                    if scattering and i != j:
                        scatter_pair(i, j)
                    if recombination:
                        recomb_pair(i, j)

        # same decay-reusing relaxation as _make_kernel: one exp per bin
        for i in range(ne):
            g_tot = partner[i] * gain[i]
            mu = jnp.maximum(loss[i], 0.0)
            x = mu * dt
            decay = jnp.exp(-x)
            taylor = x * (1.0 - x * (0.5 - x * ((1.0 / 6.0) - x * (1.0 / 24.0))))
            one_minus_decay = jnp.where(x < 1e-2, taylor, 1.0 - decay)
            coeff = jnp.where(mu < _MU_FLOOR, dt, one_minus_decay / jnp.maximum(mu, _MU_FLOOR))
            q_out[i] = jnp.maximum(decay * q[i] + coeff * jnp.maximum(g_tot, 0.0), 0.0)

        for w in range(phys.nw_pad):
            if phys.update_phonons and (w in ph_pos or w in ph_neg):
                y = ph_ref[w]
                a_term = ph_pos.get(w, zeros)
                neg = ph_neg.get(w)
                b_term = a_term if neg is None else a_term - neg
                x = jnp.clip(b_term * dt, -_AFFINE_CLIP, _AFFINE_CLIP)
                safe_b = jnp.where(jnp.abs(b_term) < _MU_FLOOR, 1.0, b_term)
                # one transcendental per row: the growth factor e^x doubles
                # as the large-|x| branch of the expm1 substitute
                ex = jnp.exp(x)
                taylor = x * (1.0 + x * (0.5 + x * ((1.0 / 6.0) + x * (1.0 / 24.0))))
                em1 = jnp.where(jnp.abs(x) < 1e-2, taylor, ex - 1.0)
                coeff = jnp.where(jnp.abs(b_term) < _MU_FLOOR, dt, em1 / safe_b)
                ph_out[w] = jnp.maximum(ex * y + coeff * a_term, 0.0)
            else:
                ph_out[w] = ph_ref[w]

    return kernel


def build_pallas_collision_step_analytic(
    *,
    E_bins: np.ndarray,
    dE: float,
    gap_plane: np.ndarray | None,
    pmap: PhononFrequencyMap,
    dt: float,
    tau_s: float | None,
    tau_r: float | None,
    T_c: float,
    dynes_gamma: float = 0.0,
    update_phonons: bool = True,
    tile: int = _DEFAULT_TILE,
    interpret: bool = False,
    gen_input: bool = False,
    walk: str | None = None,
):
    """Analytic-gap collision substep: exact per-pixel kernels from Δ(x, y).

    Same ``(n_qp, n_ph) -> (n_qp, n_ph)`` contract as
    ``build_pallas_collision_step``; pass ``tau_s``/``tau_r`` as None to
    disable a channel.  ``gap_plane`` is the dense (Ny, Nx) gap map in µeV
    (masked-out cells may hold any finite value).  No limit on the number
    of distinct gap values — intended for continuous gap maps where the
    unique-gap table path (G ≤ 8) and the XLA gather integrator are the
    alternatives.  Returns None outside the envelope (non-uniform energy
    grid or NE > 64).

    With ``gap_plane=None`` the returned step takes the gap plane as a
    third *call-time* argument ``step(n_qp, n_ph, gap_plane)`` — required
    by spatially sharded callers, where each shard must supply its own
    slice of the map (a baked plane would be replicated under shard_map).
    """
    from .kernels import recombination_kernel_base, scattering_kernel_base

    e = np.asarray(E_bins, dtype=np.float64)
    ne = int(e.size)
    if ne < 2 or ne > _MAX_UNROLLED_BINS:
        return None
    if not _grid_uniform(e):
        return None
    idx_diff = tuple(tuple(int(v) for v in r) for r in pmap.idx_diff)
    idx_sum = tuple(tuple(int(v) for v in r) for r in pmap.idx_sum)
    nw = pmap.num_omega
    nw_pad = ((nw + 7) // 8) * 8
    scattering = tau_s is not None
    recombination = tau_r is not None
    if not (scattering or recombination):
        if gen_input:  # nothing to fuse into: apply the add in XLA
            add = lambda q, g: q + jnp.asarray(g, dtype=q.dtype)[None]
            if gap_plane is None:
                fn = lambda n_qp, n_ph, gp, gen_plane: (add(n_qp, gen_plane), n_ph)
            else:
                fn = lambda n_qp, n_ph, gen_plane: (add(n_qp, gen_plane), n_ph)
            fn.takes_gen = True
            return fn
        if gap_plane is None:  # arg-mode steps take (and ignore) the plane
            return lambda n_qp, n_ph, gp: (n_qp, n_ph)
        return lambda n_qp, n_ph: (n_qp, n_ph)

    prod = np.maximum(e[:, None] * e[None, :], 1e-30)
    to_tuple = lambda M: tuple(tuple(float(v) for v in row) for row in np.asarray(M))
    dEa_s = dEb_s = dEa2_r = dEb2_r = None
    if scattering:
        a_s = scattering_kernel_base(e, 0.0, float(tau_s), T_c)  # coherence ≡ 1
        dEa_s = to_tuple(dE * a_s)
        dEb_s = to_tuple(dE * (a_s / prod))
    if recombination:
        a_r = recombination_kernel_base(e, 0.0, float(tau_r), T_c)
        dEa2_r = to_tuple(2.0 * dE * a_r)
        dEb2_r = to_tuple(2.0 * dE * (a_r / prod))

    phys = _AnalyticPhysics(
        ne=ne,
        nw=nw,
        nw_pad=nw_pad,
        gamma=float(dynes_gamma),
        E=tuple(float(v) for v in e),
        invE=tuple(float(1.0 / v) for v in e),
        dEa_s=dEa_s,
        dEb_s=dEb_s,
        dEa2_r=dEa2_r,
        dEb2_r=dEb2_r,
        idx_diff=idx_diff,
        idx_sum=idx_sum,
        update_phonons=bool(update_phonons),
    )
    kernel = _make_analytic_kernel(phys, dt, gen_input=gen_input, walk=_walk_order(walk))
    if gap_plane is not None:
        g2_row = np.zeros((8, int(np.asarray(gap_plane).size)), np.float64)
        g2_row[:] = (np.asarray(gap_plane, np.float64) ** 2).reshape(1, -1)
    else:
        g2_row = None

    def run(
        n_qp: jax.Array,
        n_ph: jax.Array,
        gp: jax.Array | None,
        gen_plane: jax.Array | None = None,
    ):
        ne_, ny, nx = n_qp.shape
        p_live = ny * nx
        q = n_qp.reshape(ne_, p_live)
        ph = n_ph.reshape(nw, p_live)
        if nw_pad - nw:
            ph = jnp.pad(ph, ((0, nw_pad - nw), (0, 0)))
        pad_cols = (-p_live) % tile
        if g2_row is not None:
            g2 = jnp.asarray(g2_row, dtype=n_qp.dtype)
        else:
            g2 = jnp.broadcast_to(
                (jnp.asarray(gp, dtype=n_qp.dtype) ** 2).reshape(1, p_live), (8, p_live)
            )
        if pad_cols:
            q = jnp.pad(q, ((0, 0), (0, pad_cols)))
            ph = jnp.pad(ph, ((0, 0), (0, pad_cols)))
            g2 = jnp.pad(g2, ((0, 0), (0, pad_cols)))
        p_pad = q.shape[1]
        grid = (p_pad // tile,)
        spec = lambda r: pl.BlockSpec((r, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
        args = [q, ph, g2]
        in_specs = [spec(ne_), spec(nw_pad), spec(8)]
        if gen_input:
            g8 = jnp.broadcast_to(
                jnp.asarray(gen_plane, dtype=n_qp.dtype).reshape(1, p_live),
                (8, p_live),
            )
            if pad_cols:
                g8 = jnp.pad(g8, ((0, 0), (0, pad_cols)))
            args.append(g8)
            in_specs.append(spec(8))
        q_new, ph_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(spec(ne_), spec(nw_pad)),
            out_shape=(
                jax.ShapeDtypeStruct((ne_, p_pad), n_qp.dtype),
                jax.ShapeDtypeStruct((nw_pad, p_pad), n_ph.dtype),
            ),
            interpret=interpret,
        )(*args)
        q_out = q_new[:, :p_live].reshape(ne_, ny, nx)
        ph_out = ph_new[:nw, :p_live].reshape(nw, ny, nx)
        return q_out, ph_out

    if gen_input:
        if gap_plane is None:
            fn = lambda n_qp, n_ph, gp, gen_plane: run(n_qp, n_ph, gp, gen_plane)
        else:
            fn = lambda n_qp, n_ph, gen_plane: run(n_qp, n_ph, None, gen_plane)
        fn.takes_gen = True
        return fn
    if gap_plane is None:
        return lambda n_qp, n_ph, gp: run(n_qp, n_ph, gp)
    return lambda n_qp, n_ph: run(n_qp, n_ph, None)


def build_pallas_collision_step(
    *,
    E_bins: np.ndarray,
    dE: float,
    rho: np.ndarray,
    K_s0: np.ndarray | None,
    K_r0: np.ndarray | None,
    pmap: PhononFrequencyMap,
    dt: float,
    update_phonons: bool = True,
    tile: int = _DEFAULT_TILE,
    interpret: bool = False,
    gap_id: np.ndarray | None = None,
    block3d: bool = False,
    gen_input: bool = False,
    walk: str | None = None,
):
    """Build ``(n_qp, n_ph) -> (n_qp, n_ph)`` backed by the Pallas kernel.

    State shapes: n_qp (NE, Ny, Nx), n_ph (NW, Ny, Nx) — identical contract
    to ``ops.collisions.make_collision_step``.  Returns None when the
    configuration is outside the kernel's support envelope.

    For non-uniform gap maps pass stacked (G, NE)/(G, NE, NE) arrays and a
    dense ``gap_id`` plane — the pair walk blends the per-gap tables with
    G−1 lane selects per constant (G ≤ 8); larger G dispatches to the
    fori_loop kernel.

    With ``gen_input=True`` the returned step takes a third argument:
    ``step(n_qp, n_ph, gen_plane)`` where ``gen_plane`` is a dense
    (Ny, Nx) array of per-pixel forward-Euler increments dt·g (the
    reference's external-generation injection, solver.py:1459-1464,
    bin-uniform modes).  The add happens on the VMEM-resident tile before
    the pair walk — bit-identical to adding in XLA first, minus the state
    HBM round-trip.  The returned step carries ``takes_gen=True``; when
    the configuration dispatches to the block-gridded kernel instead, the
    fallback step does NOT fuse generation (callers check ``takes_gen``).
    """
    e = np.asarray(E_bins, dtype=np.float64)
    ne = int(e.size)
    rho_arr = np.asarray(rho)
    n_gaps = int(rho_arr.shape[0]) if rho_arr.ndim == 2 else 1
    if not pallas_collisions_supported(e, n_gaps):
        return None
    if n_gaps > 1 and gap_id is None:
        return None
    if ne > (_MAX_UNROLLED_BINS if n_gaps == 1 else _MAX_UNROLLED_BINS_MULTIGAP):
        # beyond the pair-unroll envelope (compile time grows as NE²) the
        # block-gridded kernel takes over (offset blocks ride the Pallas
        # grid: compile time is NE-independent, measured 1.7x the fori_loop
        # kernel's throughput at 100x256²); it self-gates to None (→ the
        # exact XLA integrator) when fp near-duplicates split a pair
        # diagonal.  The static-offset rows kernel (pallas_collisions_rows)
        # is NOT auto-dispatched: its Mosaic scoped-VMEM stack need scales
        # with the CALLER's scan unroll (the unrolled bodies' stacks sum),
        # so whether a given NE compiles depends on context — e.g. NE=50
        # compiles inside an unroll=8 scan while NE=70 needs 56 MB there
        # yet compiles standalone.  It remains available explicitly for
        # callers that control their unroll, as does the fori_loop kernel.
        from .pallas_collisions_blocked import build_pallas_collision_step_blocked

        return build_pallas_collision_step_blocked(
            E_bins=e,
            dE=dE,
            rho=rho,
            K_s0=K_s0,
            K_r0=K_r0,
            pmap=pmap,
            dt=dt,
            update_phonons=update_phonons,
            tile=min(int(tile), 512),
            interpret=interpret,
            gap_id=gap_id,
        )
    if not _grid_uniform(e):
        return None
    idx_diff = tuple(tuple(int(v) for v in r) for r in pmap.idx_diff)
    idx_sum = tuple(tuple(int(v) for v in r) for r in pmap.idx_sum)
    nw = pmap.num_omega
    nw_pad = ((nw + 7) // 8) * 8
    multi_gap = n_gaps > 1
    if multi_gap or gen_input:
        block3d = False  # experimental layout not wired for gid/gen planes

    to_tuple3 = lambda M: tuple(
        tuple(tuple(float(v) for v in row) for row in tab)
        for tab in np.asarray(M).reshape(n_gaps, ne, ne)
    )
    phys = _Physics(
        ne=ne,
        nw=nw,
        nw_pad=nw_pad,
        dE=float(dE),
        n_gaps=n_gaps,
        Ks=None if K_s0 is None else to_tuple3(K_s0),
        Kr=None if K_r0 is None else to_tuple3(K_r0),
        rho=tuple(
            tuple(float(v) for v in row) for row in rho_arr.reshape(n_gaps, ne)
        ),
        idx_diff=idx_diff,
        idx_sum=idx_sum,
        update_phonons=bool(update_phonons),
    )
    kernel = _make_kernel(phys, dt, gen_input=gen_input, walk=_walk_order(walk))
    if multi_gap:
        gid_row = np.zeros((8, int(np.asarray(gap_id).size)), np.int32)
        gid_row[:] = np.asarray(gap_id, np.int32).reshape(1, -1)

    def step(n_qp: jax.Array, n_ph: jax.Array, gen_plane: jax.Array | None = None):
        if phys.Ks is None and phys.Kr is None:
            if gen_plane is not None:
                return n_qp + gen_plane[None].astype(n_qp.dtype), n_ph
            return n_qp, n_ph
        ne_, ny, nx = n_qp.shape
        p_live = ny * nx
        q = n_qp.reshape(ne_, p_live)
        ph = n_ph.reshape(nw, p_live)
        pad_rows = nw_pad - nw
        if pad_rows:
            ph = jnp.pad(ph, ((0, pad_rows), (0, 0)))
        # column granularity: the 3D slab layout splits each block of
        # ``tile`` pixels into 8 sublane rows × (tile/8) lanes so every
        # per-bin slab is a stack of fully-packed (8, 128) vector registers
        lanes = max(128, tile // 8)
        gran = 8 * lanes if block3d else tile
        pad_cols = (-p_live) % gran
        if pad_cols:
            q = jnp.pad(q, ((0, 0), (0, pad_cols)))
            ph = jnp.pad(ph, ((0, 0), (0, pad_cols)))
        p_pad = q.shape[1]
        if block3d:
            q = q.reshape(ne_, 8, p_pad // 8)
            ph = ph.reshape(nw_pad, 8, p_pad // 8)
            grid = (p_pad // gran,)
            q_spec = pl.BlockSpec((ne_, 8, lanes), lambda t: (0, 0, t), memory_space=pltpu.VMEM)
            ph_spec = pl.BlockSpec(
                (nw_pad, 8, lanes), lambda t: (0, 0, t), memory_space=pltpu.VMEM
            )
            out_shape = (
                jax.ShapeDtypeStruct((ne_, 8, p_pad // 8), n_qp.dtype),
                jax.ShapeDtypeStruct((nw_pad, 8, p_pad // 8), n_ph.dtype),
            )
        else:
            grid = (p_pad // tile,)
            q_spec = pl.BlockSpec((ne_, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
            ph_spec = pl.BlockSpec((nw_pad, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
            out_shape = (
                jax.ShapeDtypeStruct((ne_, p_pad), n_qp.dtype),
                jax.ShapeDtypeStruct((nw_pad, p_pad), n_ph.dtype),
            )
        args = [q, ph]
        in_specs = [q_spec, ph_spec]
        if multi_gap:
            gid = jnp.asarray(gid_row)
            if pad_cols:
                gid = jnp.pad(gid, ((0, 0), (0, pad_cols)))
            args.append(gid)
            in_specs.append(
                pl.BlockSpec((8, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
            )
        if gen_input:
            g8 = jnp.broadcast_to(
                jnp.asarray(gen_plane, dtype=n_qp.dtype).reshape(1, p_live),
                (8, p_live),
            )
            if pad_cols:
                g8 = jnp.pad(g8, ((0, 0), (0, pad_cols)))
            args.append(g8)
            in_specs.append(
                pl.BlockSpec((8, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
            )
        q_new, ph_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(q_spec, ph_spec),
            out_shape=out_shape,
            # in-place update: each tile's inputs are fetched to VMEM before
            # its outputs are stored, so donating q/ph lets scan-carried
            # states ping-pong without XLA inserting full-array copies
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
        )(*args)
        q_new = q_new.reshape(ne_, p_pad)
        ph_new = ph_new.reshape(nw_pad, p_pad)
        q_out = q_new[:, :p_live].reshape(ne_, ny, nx)
        ph_out = ph_new[:nw, :p_live].reshape(nw, ny, nx)
        return q_out, ph_out

    if gen_input:
        run_gen = lambda n_qp, n_ph, gen_plane: step(n_qp, n_ph, gen_plane)
        run_gen.takes_gen = True
        return run_gen
    return lambda n_qp, n_ph: step(n_qp, n_ph)
