"""Pallas TPU kernel: block-gridded Fischer–Catelani collision substep.

Large-NE successor to the ``fori_loop`` kernel (``pallas_collisions_loop``).
The pair structure of a uniform energy grid is walked per offset k = i−j
(scattering, Toeplitz) and anti-diagonal s = i+j (recombination, Hankel)
exactly as there, but the offset walk rides the **Pallas grid** instead of a
``fori_loop``:

* grid = (pixel tiles, offset blocks); TPU grids are sequential with the
  last axis innermost, so VMEM scratch accumulators persist across the
  offset blocks of one pixel tile (init at block 0, QP/phonon update and
  output write at the last block);
* each block statically unrolls ``block`` consecutive offsets — Mosaic
  compiles the short straight-line body ONCE for all blocks, so compile
  time is independent of NE (the fori_loop kernel measured 204 s at
  50×256²; the unrolled pair kernel grows ~NE² and is capped at 64 bins);
* shifted states q[j±k] / q[s−i] are **dynamic sublane slices of doubled
  buffers** ([x; x] rows) instead of the loop kernel's roll-by-1 carried
  copies — no sequential carry chain, so the per-offset row work
  software-pipelines across the unrolled block.  Mosaic only compiles
  multi-row dynamic sublane loads whose start is 8-aligned (unaligned
  starts fail instruction selection; dynamic ``pltpu.roll`` mis-compiles
  — both probed on v5e), so each slice is an aligned dynamic load of
  ``ne_pad + 8`` rows (base from an SMEM table) followed by a static
  remainder sub-slice; the remainders are compile-time constants because
  ``block`` is rounded up to a multiple of 8;
* per-offset coefficient columns come from zero-padded (NE_pad, k) tables
  by masked lane reduction, with dE baked in host-side; zero columns gate
  both the triangle boundaries and the doubled-buffer wrap-around, so the
  kernel needs no validity masking;
* phonon ω-row accumulation uses dynamic-sublane read-modify-writes into
  persistent scratch (exact: the grid is sequential).

Physics and update formulas are identical to ``ops.collisions`` /
``pallas_collisions`` (positivity-preserving exponential relaxation, affine
phonon growth); parity is tested in interpret mode against the XLA path.
Supported envelope: uniform energy grid with diagonal-constant ω binning
(``_uniform_pair_rows``; fp near-duplicate splits fall back), NE from 2 to
256 (VMEM-aware lane-tile clamp), piecewise gap maps with G ≤ 8 — and
CONTINUOUS gap maps of any G through the analytic-gap variant
(``build_pallas_collision_step_blocked_analytic``): the Kaplan kernels are
affine in Δ² and the Dynes DOS a closed form of it, so a per-pixel Δ² row
replaces every per-gap table (measured 12.4 ms/substep at 100×256² f32 —
the only fast path for NE > 64 continuous maps, where per-unique-gap
stacks are (G≈Npix, NE, NE) and unbuildable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_collisions import (
    _AFFINE_CLIP,
    _EPS_RHO,
    _MU_FLOOR,
    _expm1,
    _uniform_pair_rows,
)
from .pallas_collisions_loop import _antidiag_table, _offset_tables, _round_up
from .phonon_map import PhononFrequencyMap

__all__ = [
    "build_pallas_collision_step_blocked",
    "build_pallas_collision_step_blocked_analytic",
    "pallas_blocked_analytic_supported",
]

_DEFAULT_TILE = 256
#: r5 hardware sweep (NE_BLOCK_SWEEP_r05.json, v5e, NE=100 at 256²):
#: block 16 is the table-kernel winner at every gating (10.75 vs 11.79 ms
#: ungated block 8; 32/64 and all gated variants slower), while the
#: ANALYTIC variant prefers 8 (12.66 vs 12.79).  Block size is NOT the
#: NE>64 cliff's lever — the full sweep spans ≤9%, so the ~11 ms tier
#: stands as a quantified negative for the r4 ≤6 ms target.
_DEFAULT_BLOCK = 16
_DEFAULT_BLOCK_ANALYTIC = 8


def pallas_blocked_analytic_supported(
    E_bins: np.ndarray, pmap: PhononFrequencyMap
) -> bool:
    """Exact envelope of the blocked analytic-gap kernel.

    True iff ``build_pallas_collision_step_blocked_analytic`` will return a
    step (uniform grid, 2-256 bins, diagonal-constant ω binning; the VMEM
    clamp always fits the single-channel analytic tables at tile 128 in
    this range).  Callers use this to decide the dispatch BEFORE building
    any per-unique-gap stacks — for continuous gap maps the stacks are
    (G≈Npix, NE, NE) and must never be materialised.
    """
    e = np.asarray(E_bins)
    if e.size < 2 or e.size > 256:
        return False
    return _uniform_pair_rows(np.asarray(e, np.float64), pmap) is not None


def build_pallas_collision_step_blocked(
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
    block: int = _DEFAULT_BLOCK,
    interpret: bool = False,
    gap_id: np.ndarray | None = None,
    hoist_loads: bool = True,
    row_gating: bool = False,
    _analytic: dict | None = None,
):
    """Build ``(n_qp, n_ph) -> (n_qp, n_ph)`` for one collision substep.

    Same contract as ``pallas_collisions.build_pallas_collision_step``;
    returns None outside the envelope (non-uniform grid or ω binning that
    is not diagonal-constant).  ``block`` is the number of pair offsets
    statically unrolled per grid step (rounded up to a multiple of 8 so
    the sublane-shift remainders are compile-time constants); each block
    also retires two recombination anti-diagonals per offset, so the
    whole walk takes ``ceil(NE / block)`` sequential grid steps per pixel
    tile.
    """
    e = np.asarray(E_bins, dtype=np.float64)
    ne = int(e.size)
    if ne < 2:
        return None
    rows = _uniform_pair_rows(e, pmap)
    if rows is None:
        return None
    diff_row, sum_row = rows
    nw = pmap.num_omega
    ne_pad = _round_up(ne, 8)
    nw_pad = _round_up(nw, 8)
    ns = 2 * ne - 1
    dt = float(dt)
    dE = float(dE)
    analytic = _analytic is not None
    if analytic:
        # continuous gap maps: coefficients are evaluated per pixel from a
        # Δ² row (the Kaplan kernels are exactly affine in Δ², the Dynes
        # DOS a closed form of it — see build_pallas_collision_step_analytic)
        scattering = _analytic["tau_s"] is not None
        recombination = _analytic["tau_r"] is not None
        n_gaps = 1
        multi_gap = False
        sym_ks = True  # the analytic K^s form is symmetric by construction
        rho_g = None
    else:
        scattering = K_s0 is not None
        recombination = K_r0 is not None
    arg_mode = analytic and _analytic["gap_plane"] is None
    if not (scattering or recombination):
        if arg_mode:
            return lambda n_qp, n_ph, gp: (n_qp, n_ph)
        return lambda n_qp, n_ph: (n_qp, n_ph)

    B = _round_up(max(1, int(block)), 8)
    nkb = -(-ne // B)  # offsets [0, nkb·B) ⊇ [1, ne); k = 0 has zero tables
    kmax = nkb * B
    smax = 2 * kmax  # anti-diags [0, 2·kmax) ⊇ [0, ns)
    kp = _round_up(kmax, 128)
    sp = _round_up(smax, 128)

    if not analytic:
        rho_g = np.asarray(rho, dtype=np.float64)
        if rho_g.ndim == 1:
            rho_g = rho_g[None]
        n_gaps = rho_g.shape[0]
        if n_gaps > 1 and gap_id is None:
            # stacked per-gap tables with no gap-id plane: blending is
            # undefined — refuse rather than silently apply gap-0 physics
            return None
        multi_gap = gap_id is not None and n_gaps > 1
        stack = lambda K: np.asarray(K, dtype=np.float64).reshape(n_gaps, ne, ne)
        sym_ks = scattering and all(
            np.array_equal(K, K.T) for K in stack(K_s0)
        )

    # VMEM-aware lane-tile clamp: scratch (2 doubled + 2 tripled buffers +
    # loss/gain + a/b) plus pipelined in/out blocks ≈ (18·ne_pad + 6·nw_pad)
    # rows per lane tile in f32, PLUS the tile-independent resident
    # coefficient tables (per-gap offset/anti-diagonal tables + rho columns).
    # Measured envelope (single gap): on the r2 libtpu NE=100 compiled at
    # tile 512 (~7 MB est) with a 10 MB budget, but the 2026-08 libtpu
    # charges the same kernel 19.2 MB of scoped stack (driver capture r4) —
    # ~2.5x this model.  Budget 7 MB so the estimate stays under the real
    # 16 MB limit with that charging: NE=100 → tile 256 (r2 measured
    # 256/512 equal-speed), NE≥192 → tile 128.  When even tile 128 does
    # not fit (large G × large NE), return None so the caller falls back
    # to the XLA integrator.
    if analytic:
        # A + B tables per enabled channel; no per-gap rho tables
        n_scatter_tabs = 4 if scattering else 0
        n_recomb_tabs = 4 if recombination else 0
    else:
        n_scatter_tabs = (2 if sym_ks else 4) if scattering else 0
        n_recomb_tabs = 2 if recombination else 0
    table_bytes = (
        (n_scatter_tabs + n_recomb_tabs) * n_gaps * ne_pad * kp
        + (0 if analytic else 2 * n_gaps * ne_pad * 128)
    ) * 4
    tile = max(128, (int(tile) // 128) * 128)
    if analytic:
        # the per-pixel coefficient evaluation materialises (ne_pad, tile)
        # temporaries per offset — tile 512 at NE=100 fails Mosaic's
        # scoped-VMEM allocation (measured); 256 runs
        tile = min(tile, 256)
    row_bytes_per_lane = (18 * ne_pad + 6 * nw_pad) * 4
    while tile > 128 and row_bytes_per_lane * tile + table_bytes > 7 * 2**20:
        tile = max(128, (tile // 2 // 128) * 128)
    if row_bytes_per_lane * 128 + table_bytes > 7 * 2**20:
        return None

    if not analytic:
        rho_pad = np.zeros((n_gaps, ne_pad, 128))
        rho_pad[:, :ne] = rho_g[:, :, None]
        rho_rev_pad = np.zeros((n_gaps, ne_pad, 128))
        rho_rev_pad[:, :ne] = rho_g[:, ::-1, None]

    # SMEM index tables: ω rows and doubled-buffer start offsets, per k / s.
    # Zero-padded entries pair with zero coefficient columns, so the reads
    # they trigger only ever add zeros.  Start tables hold the 8-ALIGNED
    # base of each shift (Mosaic requires aligned multi-row dynamic
    # loads); the ≤7-row remainder is static per unrolled offset because
    # B ≡ 0 (mod 8): k = kb·B + d ⇒ rem_up = d mod 8, rem_dn = (−d) mod 8,
    # rem_rev = (ne−1−j) mod 8 for anti-diag j ∈ {2d, 2d+1}.
    drow_tab = np.zeros(_round_up(kmax, 8), np.int32)
    drow_tab[1:ne] = np.asarray(diff_row[1:], np.int32)
    srow_tab = np.zeros(_round_up(smax, 8), np.int32)
    srow_tab[:ns] = np.asarray(sum_row, np.int32)
    # Tables store base // 8; the kernel rebuilds base as ``8 * value`` so
    # Mosaic's alignment analysis can PROVE the load start is a sublane
    # multiple (a raw SMEM value, even if always aligned, cannot be proven
    # aligned and fails instruction selection).
    up_tab = ((np.arange(_round_up(kmax, 8), dtype=np.int64) % ne_pad) & ~7) // 8
    dn_tab = (((-np.arange(_round_up(kmax, 8), dtype=np.int64)) % ne_pad) & ~7) // 8
    rev_tab = (((ne - 1 - np.arange(_round_up(smax, 8), dtype=np.int64)) % ne_pad) & ~7) // 8
    # Block-window base tables for the hoisted loads (entries used at
    # k ≡ 0 (mod 8) only): within an 8-offset run the up-shift base is the
    # run's own aligned base, the down-shift rows span one 8-row boundary
    # below it, and the run's 16 consecutive anti-diagonal rows unwrap into
    # the tripled reversed buffer.
    k0s = np.arange(_round_up(kmax, 8), dtype=np.int64)
    dnw_tab = np.maximum(ne_pad - (k0s % ne_pad) - 8, 0) // 8
    v0 = (ne - 1 - 2 * k0s) % ne_pad
    revw_tab = (np.where(v0 < 15, v0 + ne_pad, v0) - 15) // 8

    def _evod_split(r_full: np.ndarray):
        """(G, ne_pad, sp) → two (G, ne_pad, kp) even/odd anti-diag tables."""
        ev = np.zeros((r_full.shape[0], ne_pad, kp))
        od = np.zeros((r_full.shape[0], ne_pad, kp))
        half = r_full[:, :, 0::2]
        ev[:, :, : half.shape[2]] = half
        half = r_full[:, :, 1::2]
        od[:, :, : half.shape[2]] = half
        return ev, od

    if analytic:
        # Affine-in-Δ² tables: K^s(Δ) = max(A_s − B_s·Δ², 0) and
        # K^r(Δ) = A_r + B_r·Δ² exactly (kernels.py formulas at Δ=0 give
        # the A parts; B = A / (E_i·E_j)); the closed-form Dynes DOS is
        # evaluated per pixel at init.  Same structure as
        # build_pallas_collision_step_analytic (pallas_collisions.py).
        from .kernels import recombination_kernel_base, scattering_kernel_base

        a_T_c = float(_analytic["T_c"])
        a_gamma = float(_analytic["dynes_gamma"])
        prod = np.maximum(e[:, None] * e[None, :], 1e-30)
        if scattering:
            a_s = scattering_kernel_base(e, 0.0, float(_analytic["tau_s"]), a_T_c)
            tA = _offset_tables(dE * a_s, ne, ne_pad, kp)
            tB = _offset_tables(dE * a_s / prod, ne, ne_pad, kp)
            e_up, e_dn = tA[0][None], tA[1][None]
            eB_up, eB_dn = tB[0][None], tB[1][None]
        if recombination:
            a_r = recombination_kernel_base(e, 0.0, float(_analytic["tau_r"]), a_T_c)
            r_ev, r_od = _evod_split(_antidiag_table(2.0 * dE * a_r, ne, ne_pad, sp)[None])
            rB_ev, rB_od = _evod_split(
                _antidiag_table(2.0 * dE * a_r / prod, ne, ne_pad, sp)[None]
            )
        # closed-form DOS inputs: energy columns (zero on pad rows so the
        # pad DOS vanishes) for the natural and reversed row orders
        e_col = np.zeros((ne_pad, 128))
        e_col[:ne] = e[:, None]
        e_rev_col = np.zeros((ne_pad, 128))
        e_rev_col[:ne] = e[::-1, None]
        inv_col = np.zeros((ne_pad, 128))
        inv_col[:ne] = 1.0 / e[:, None]
        inv_rev_col = np.zeros((ne_pad, 128))
        inv_rev_col[:ne] = 1.0 / e[::-1, None]
        if _analytic["gap_plane"] is not None:
            gp_sq = np.asarray(_analytic["gap_plane"], np.float64).reshape(-1) ** 2
            g2_row = np.zeros((8, gp_sq.size))
            g2_row[:] = gp_sq[None, :]
        else:
            g2_row = None
    else:
        if scattering:
            # dE baked in: the dressing factors in-kernel are (1 + Dk) and Dk.
            # K^s is symmetric for the Fischer–Catelani form ((E_i−E_j)² and
            # 1−Δ²/E_iE_j are both symmetric, reference solver.py:477-490), so
            # a_up ≡ e_up and a_dn ≡ e_dn — the absorption columns reuse the
            # emission reductions (2 masked lane reductions per offset, not 4).
            tabs = [_offset_tables(dE * K, ne, ne_pad, kp) for K in stack(K_s0)]
            e_up, e_dn, a_up, a_dn = (np.stack([t[i] for t in tabs]) for i in range(4))
        if recombination:
            # 2·dE baked in (loss/gain use it directly); the phonon-row sums
            # need dE·K, recovered by one 0.5 scale per anti-diagonal.  The
            # table is split into even/odd anti-diagonal halves so each lane
            # reduction runs at kp width instead of sp = 2·kp.
            r_ev, r_od = _evod_split(
                np.stack(
                    [_antidiag_table(2.0 * dE * K, ne, ne_pad, sp) for K in stack(K_r0)]
                )
            )

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        qrev_ref = next(it)
        ph_ref = next(it)
        if analytic:
            g2_ref = next(it)
            ecol_ref, ercol_ref = next(it), next(it)
            icol_ref, ircol_ref = next(it), next(it)
            rho_ref = rhorev_ref = gid_ref = None
            if scattering:
                eup_ref, edn_ref = next(it), next(it)
                eBup_ref, eBdn_ref = next(it), next(it)
            if recombination:
                rev_ref_t, rod_ref_t = next(it), next(it)
                rBev_ref, rBod_ref = next(it), next(it)
        else:
            g2_ref = None
            rho_ref = next(it)
            rhorev_ref = next(it)
            gid_ref = next(it) if multi_gap else None
            if scattering:
                eup_ref, edn_ref = next(it), next(it)
                aup_ref, adn_ref = (None, None) if sym_ks else (next(it), next(it))
            if recombination:
                rev_ref_t, rod_ref_t = next(it), next(it)
        drow_ref = next(it)
        srow_ref = next(it)
        up_ref = next(it)
        dn_ref = next(it)
        rev_ref = next(it)
        dnw_ref = next(it)
        revw_ref = next(it)
        q_out = next(it)
        ph_out = next(it)
        qq_ref = next(it)       # (2·ne_pad+8, T) doubled q
        pp_ref = next(it)       # (2·ne_pad+8, T) doubled partner
        qqr_ref = next(it)      # (3·ne_pad+8, T) tripled reversed q
        ppr_ref = next(it)      # (3·ne_pad+8, T) tripled reversed partner
        loss_ref = next(it)
        gain_ref = next(it)
        a_ref = next(it)
        b_ref = next(it)
        if row_gating:
            # per-run phonon partial rows (one per offset / anti-diagonal)
            pem_ref, pab_ref = next(it), next(it)
            prec_ref, ppb_ref = next(it), next(it)

        kb = pl.program_id(1)
        gid = gid_ref[:1, :] if multi_gap else None  # (1, T) int32
        g2 = g2_ref[:1, :] if analytic else None     # (1, T) Δ²(px)

        def by_gap(vals):
            if not multi_gap:
                return vals[0]
            out = jnp.where(gid == 0, vals[0], 0.0)
            for g in range(1, n_gaps):
                out = jnp.where(gid == g, vals[g], out)
            return out

        def analytic_rho_inv(Ec, invc):
            """Closed-form (Dynes) DOS + reciprocal from Δ²(px), per row."""
            if a_gamma == 0.0:
                r2 = Ec * Ec - g2
                t = jax.lax.rsqrt(jnp.maximum(r2, _EPS_RHO))
                pos = r2 > 0.0
                return (
                    jnp.where(pos, Ec * t, 0.0),
                    jnp.where(pos, (r2 * t) * invc, 0.0),
                )
            # ρ = max(Re((E−iΓ)/√((E−iΓ)²−Δ²)), 0); principal root s + i·t
            zr = (Ec * Ec - a_gamma * a_gamma) - g2
            zi = -2.0 * Ec * a_gamma
            rmod = jnp.sqrt(zr * zr + zi * zi)
            sroot = jnp.sqrt(jnp.maximum(0.5 * (rmod + zr), 0.0))
            troot = -jnp.sqrt(jnp.maximum(0.5 * (rmod - zr), 0.0))
            rho_v = jnp.maximum(
                (Ec * sroot - a_gamma * troot) / jnp.maximum(rmod, _EPS_RHO), 0.0
            )
            rho_v = jnp.where(Ec > 0.0, rho_v, 0.0)  # pad rows stay empty
            inv_v = jnp.where(rho_v > _EPS_RHO, 1.0 / jnp.maximum(rho_v, _EPS_RHO), 0.0)
            return rho_v, inv_v

        @pl.when(kb == 0)
        def _init():
            q = q_ref[:]
            qrev = qrev_ref[:]
            if analytic:
                rho_c, inv_c = analytic_rho_inv(
                    ecol_ref[:, :1], icol_ref[:, :1]
                )
                rhorev_c, invrev_c = analytic_rho_inv(
                    ercol_ref[:, :1], ircol_ref[:, :1]
                )
                partner = rho_c * jnp.maximum(1.0 - q * inv_c, 0.0)
                partner_rev = rhorev_c * jnp.maximum(1.0 - qrev * invrev_c, 0.0)
            else:
                rho_c = by_gap([rho_ref[g, :, :1] for g in range(n_gaps)])
                rhorev_c = by_gap([rhorev_ref[g, :, :1] for g in range(n_gaps)])
                safe = jnp.maximum(rho_c, _EPS_RHO)
                partner = jnp.where(
                    rho_c > _EPS_RHO, rho_c * jnp.maximum(1.0 - q / safe, 0.0), 0.0
                )
                safe_r = jnp.maximum(rhorev_c, _EPS_RHO)
                partner_rev = jnp.where(
                    rhorev_c > _EPS_RHO,
                    rhorev_c * jnp.maximum(1.0 - qrev / safe_r, 0.0),
                    0.0,
                )
            qq_ref[:ne_pad] = q
            qq_ref[ne_pad : 2 * ne_pad] = q
            qq_ref[2 * ne_pad :] = q[:8]
            pp_ref[:ne_pad] = partner
            pp_ref[ne_pad : 2 * ne_pad] = partner
            pp_ref[2 * ne_pad :] = partner[:8]
            qqr_ref[:ne_pad] = qrev
            qqr_ref[ne_pad : 2 * ne_pad] = qrev
            qqr_ref[2 * ne_pad : 3 * ne_pad] = qrev
            qqr_ref[3 * ne_pad :] = qrev[:8]
            ppr_ref[:ne_pad] = partner_rev
            ppr_ref[ne_pad : 2 * ne_pad] = partner_rev
            ppr_ref[2 * ne_pad : 3 * ne_pad] = partner_rev
            ppr_ref[3 * ne_pad :] = partner_rev[:8]
            zero = jnp.zeros_like(q)
            loss_ref[:] = zero
            gain_ref[:] = zero
            if update_phonons:
                zph = jnp.zeros((nw_pad, q.shape[1]), dtype=q.dtype)
                a_ref[:] = zph
                b_ref[:] = zph

        partner = pp_ref[:ne_pad]
        q = qq_ref[:ne_pad]

        lanes_k = jax.lax.broadcasted_iota(jnp.int32, (ne_pad, kp), 1)

        def col(ref, lanes, idx):
            return by_gap(
                [
                    jnp.sum(jnp.where(lanes == idx, ref[g], 0.0), axis=1, keepdims=True)
                    for g in range(n_gaps)
                ]
            )

        if not row_gating:  # gated mode RMWs the scratch chunks directly
            loss = loss_ref[:]
            gain = gain_ref[:]

        def shifted(ref, base, rem):
            # rows [base+rem, base+rem+ne_pad) via an aligned dynamic load
            # + static sub-slice (see module docstring).  base ≤ ne_pad−8,
            # so the 8-row over-read stays inside the doubled buffer.
            if rem == 0:
                return ref[pl.ds(base, ne_pad)]
            return ref[pl.ds(base, ne_pad + 8)][rem : rem + ne_pad]

        def scatter_body(k, q_up, p_up, q_dn, p_dn, loss, gain):
            dk = drow_ref[k]
            Dk = ph_ref[pl.ds(dk, 1), :]  # (1, T)
            if analytic:
                # K^s(Δ²) = max(A − B·Δ², 0), per pixel — (ne_pad, T)
                eu = jnp.maximum(
                    col(eup_ref, lanes_k, k) - col(eBup_ref, lanes_k, k) * g2, 0.0
                )
                ed = jnp.maximum(
                    col(edn_ref, lanes_k, k) - col(eBdn_ref, lanes_k, k) * g2, 0.0
                )
                au, ad = eu, ed
            else:
                eu = col(eup_ref, lanes_k, k)
                ed = col(edn_ref, lanes_k, k)
                au = eu if sym_ks else col(aup_ref, lanes_k, k)
                ad = ed if sym_ks else col(adn_ref, lanes_k, k)
            em = 1.0 + Dk
            t_em = eu * q_up  # shared: QP gain + phonon emission
            t_ab = au * p_up  # shared: QP loss + phonon absorption
            loss = loss + em * (ed * p_dn) + Dk * t_ab
            gain = gain + em * t_em + Dk * (ad * q_dn)
            if update_phonons:
                p_em = jnp.sum(t_em * partner, axis=0, keepdims=True)
                p_ab = jnp.sum(t_ab * q, axis=0, keepdims=True)
                a_ref[pl.ds(dk, 1), :] += p_em
                b_ref[pl.ds(dk, 1), :] += p_em - p_ab
            return loss, gain

        def recomb_body(k, s, even, q_s, p_s, loss, gain):
            ms = srow_ref[s]
            Ss = ph_ref[pl.ds(ms, 1), :]
            r = col(rev_ref_t if even else rod_ref_t, lanes_k, k)
            if analytic:
                # K^r(Δ²) = A + B·Δ², per pixel
                r = r + col(rBev_ref if even else rBod_ref, lanes_k, k) * g2
            t_rec = r * q_s  # shared: QP loss + phonon recombination
            t_pb = r * p_s   # shared: QP gain + pair-breaking
            loss = loss + t_rec + Ss * t_rec
            gain = gain + Ss * t_pb
            if update_phonons:
                p_rec = jnp.sum(t_rec * q, axis=0, keepdims=True)
                p_pb = jnp.sum(t_pb * partner, axis=0, keepdims=True)
                a_ref[pl.ds(ms, 1), :] += 0.5 * p_rec
                b_ref[pl.ds(ms, 1), :] += 0.5 * (p_rec - p_pb)
            return loss, gain

        if row_gating:
            # Chunk-gated walk: for offset k every term is valid on at most
            # (ne−k)-ish rows (gains/absorption-losses on the low rows,
            # emission-losses/absorption-gains on rows ≥ k, anti-diagonal s
            # on [s−ne+1, s+1)), but the straight-line walk above computes
            # full ne_pad-height ops regardless — ~2× the valid work at the
            # triangle midpoint.  Here each term class walks 8-row chunks
            # under a run-granularity ``pl.when``: a chunk executes only if
            # the run's WEAKEST offset still has valid rows there (≤7 rows
            # of zero-coefficient slack at the boundary), so executed row
            # work tracks the triangles.  All reads are aligned 16/32-row
            # loads + static sub-slices; accumulators are chunk-RMWs on the
            # persistent scratch.
            nchunks = ne_pad // 8
            zrow8 = jnp.zeros((8, q.shape[1]), dtype=q.dtype)
            for g_run in range(B // 8):
                k0 = kb * B + 8 * g_run
                if update_phonons:
                    if scattering:
                        pem_ref[:] = zrow8
                        pab_ref[:] = zrow8
                    if recombination:
                        z16 = jnp.zeros((16, q.shape[1]), dtype=q.dtype)
                        prec_ref[:] = z16
                        ppb_ref[:] = z16
                s_cols = []
                if scattering:
                    base_up = 8 * up_ref[k0]
                    base_dn = 8 * dnw_ref[k0]
                    for e in range(8):
                        k = k0 + e
                        Dk = ph_ref[pl.ds(drow_ref[k], 1), :]
                        if analytic:
                            s_cols.append(dict(
                                euA=col(eup_ref, lanes_k, k),
                                euB=col(eBup_ref, lanes_k, k),
                                edA=col(edn_ref, lanes_k, k),
                                edB=col(eBdn_ref, lanes_k, k),
                                Dk=Dk, dk=drow_ref[k],
                            ))
                        else:
                            eu = col(eup_ref, lanes_k, k)
                            ed = col(edn_ref, lanes_k, k)
                            s_cols.append(dict(
                                eu=eu, ed=ed,
                                au=eu if sym_ks else col(aup_ref, lanes_k, k),
                                ad=ed if sym_ks else col(adn_ref, lanes_k, k),
                                Dk=Dk, dk=drow_ref[k],
                            ))

                def eu_au_chunk(e, c8):
                    sc = s_cols[e]
                    if analytic:
                        euc = jnp.maximum(
                            sc["euA"][c8 : c8 + 8] - sc["euB"][c8 : c8 + 8] * g2, 0.0
                        )
                        return euc, euc
                    return sc["eu"][c8 : c8 + 8], sc["au"][c8 : c8 + 8]

                def ed_ad_chunk(e, c8):
                    sc = s_cols[e]
                    if analytic:
                        edc = jnp.maximum(
                            sc["edA"][c8 : c8 + 8] - sc["edB"][c8 : c8 + 8] * g2, 0.0
                        )
                        return edc, edc
                    return sc["ed"][c8 : c8 + 8], sc["ad"][c8 : c8 + 8]

                r_cols = []
                if recombination:
                    base_rev = 8 * revw_ref[k0]
                    for e in range(8):
                        for p_ in (0, 1):
                            k = k0 + e
                            s = 2 * k0 + 2 * e + p_
                            even = p_ == 0
                            rc = col(rev_ref_t if even else rod_ref_t, lanes_k, k)
                            rB = (
                                col(rBev_ref if even else rBod_ref, lanes_k, k)
                                if analytic
                                else None
                            )
                            r_cols.append(dict(
                                rc=rc, rB=rB, ms=srow_ref[s],
                                Ss=ph_ref[pl.ds(srow_ref[s], 1), :],
                                rr=(ne % 8) + 15 - (2 * e + p_),
                            ))

                for c in range(nchunks):
                    c8 = 8 * c

                    if scattering:

                        @pl.when(k0 < ne - c8)
                        def _lo(c8=c8):
                            # emission gain + absorption loss: rows j with
                            # j + k < ne — valid while k0 < ne − c8
                            accl = zrow8
                            accg = zrow8
                            win_q = qq_ref[pl.ds(base_up + c8, 16)]
                            win_p = pp_ref[pl.ds(base_up + c8, 16)]
                            for e in range(8):
                                qw = win_q[e : e + 8]
                                pw = win_p[e : e + 8]
                                euc, auc = eu_au_chunk(e, c8)
                                Dk = s_cols[e]["Dk"]
                                t_em = euc * qw
                                t_ab = auc * pw
                                accg = accg + t_em + Dk * t_em
                                accl = accl + Dk * t_ab
                                if update_phonons:
                                    pem_ref[e : e + 1] += jnp.sum(
                                        t_em * partner[c8 : c8 + 8], axis=0, keepdims=True
                                    )
                                    pab_ref[e : e + 1] += jnp.sum(
                                        t_ab * q[c8 : c8 + 8], axis=0, keepdims=True
                                    )
                            loss_ref[c8 : c8 + 8] += accl
                            gain_ref[c8 : c8 + 8] += accg

                        @pl.when(k0 < c8 + 8)
                        def _hi(c8=c8):
                            # emission loss + absorption gain: rows i ≥ k —
                            # the run intersects the chunk iff its smallest
                            # offset k0 is ≤ c8+7
                            accl = zrow8
                            accg = zrow8
                            win_q = qq_ref[pl.ds(base_dn + c8, 16)]
                            win_p = pp_ref[pl.ds(base_dn + c8, 16)]
                            for e in range(8):
                                q_dn = win_q[8 - e : 16 - e]
                                p_dn = win_p[8 - e : 16 - e]
                                edc, adc = ed_ad_chunk(e, c8)
                                Dk = s_cols[e]["Dk"]
                                em_loss = edc * p_dn
                                accl = accl + em_loss + Dk * em_loss
                                accg = accg + Dk * (adc * q_dn)
                            loss_ref[c8 : c8 + 8] += accl
                            gain_ref[c8 : c8 + 8] += accg

                    if recombination:

                        @pl.when((c8 + 8 > 2 * k0 - (ne - 1)) & (c8 < 2 * k0 + 16))
                        def _rec(c8=c8):
                            # anti-diagonal s valid on [s−ne+1, min(ne, s+1))
                            accl = zrow8
                            accg = zrow8
                            win_q = qqr_ref[pl.ds(base_rev + c8, 32)]
                            win_p = ppr_ref[pl.ds(base_rev + c8, 32)]
                            for i_idx in range(16):
                                rcol = r_cols[i_idx]
                                rc = rcol["rc"][c8 : c8 + 8]
                                if analytic:
                                    rc = rc + rcol["rB"][c8 : c8 + 8] * g2
                                rr = rcol["rr"]
                                q_s = win_q[rr : rr + 8]
                                p_s = win_p[rr : rr + 8]
                                Ss = rcol["Ss"]
                                t_rec = rc * q_s
                                t_pb = rc * p_s
                                accl = accl + t_rec + Ss * t_rec
                                accg = accg + Ss * t_pb
                                if update_phonons:
                                    prec_ref[i_idx : i_idx + 1] += jnp.sum(
                                        t_rec * q[c8 : c8 + 8], axis=0, keepdims=True
                                    )
                                    ppb_ref[i_idx : i_idx + 1] += jnp.sum(
                                        t_pb * partner[c8 : c8 + 8], axis=0, keepdims=True
                                    )
                            loss_ref[c8 : c8 + 8] += accl
                            gain_ref[c8 : c8 + 8] += accg

                if update_phonons:
                    if scattering:
                        for e in range(8):
                            dk = s_cols[e]["dk"]
                            pe = pem_ref[e : e + 1]
                            a_ref[pl.ds(dk, 1), :] += pe
                            b_ref[pl.ds(dk, 1), :] += pe - pab_ref[e : e + 1]
                    if recombination:
                        for i_idx in range(16):
                            ms = r_cols[i_idx]["ms"]
                            pr = prec_ref[i_idx : i_idx + 1]
                            a_ref[pl.ds(ms, 1), :] += 0.5 * pr
                            b_ref[pl.ds(ms, 1), :] += 0.5 * (
                                pr - ppb_ref[i_idx : i_idx + 1]
                            )
        elif hoist_loads:
            # One aligned window load per 8-offset run instead of per-offset
            # dynamic loads: within a run the up-shift base is CONSTANT
            # (k − e is a multiple of 8, so aligned(k % ne_pad) doesn't move
            # as e walks 0..7), the down-shifts span one 8-row boundary, and
            # the 16 recombination anti-diagonals span ≤ 24 rows — so 6
            # window loads replace 64 per-offset loads per run, and every
            # per-offset view is a STATIC sub-slice of a loaded window.
            for g in range(B // 8):
                k0 = kb * B + 8 * g
                if scattering:
                    up_base = 8 * up_ref[k0]
                    dn_base = 8 * dnw_ref[k0]
                    upq = qq_ref[pl.ds(up_base, ne_pad + 8)]
                    upp = pp_ref[pl.ds(up_base, ne_pad + 8)]
                    dnq = qq_ref[pl.ds(dn_base, ne_pad + 16)]
                    dnp = pp_ref[pl.ds(dn_base, ne_pad + 16)]
                if recombination:
                    rev_base = 8 * revw_ref[k0]
                    rvq = qqr_ref[pl.ds(rev_base, ne_pad + 24)]
                    rvp = ppr_ref[pl.ds(rev_base, ne_pad + 24)]
                for e in range(8):
                    d = 8 * g + e
                    k = kb * B + d
                    if scattering:
                        loss, gain = scatter_body(
                            k,
                            upq[e : e + ne_pad],
                            upp[e : e + ne_pad],
                            dnq[8 - e : 8 - e + ne_pad],
                            dnp[8 - e : 8 - e + ne_pad],
                            loss,
                            gain,
                        )
                    if recombination:
                        for i in (2 * e, 2 * e + 1):
                            s = 2 * k0 + i
                            rr = (ne % 8) + 15 - i
                            loss, gain = recomb_body(
                                k,
                                s,
                                i == 2 * e,
                                rvq[rr : rr + ne_pad],
                                rvp[rr : rr + ne_pad],
                                loss,
                                gain,
                            )
        else:
            for d in range(B):
                k = kb * B + d
                if scattering:
                    r_up = d % 8
                    r_dn = (-d) % 8
                    base_up = 8 * up_ref[k]
                    base_dn = 8 * dn_ref[k]
                    loss, gain = scatter_body(
                        k,
                        shifted(qq_ref, base_up, r_up),
                        shifted(pp_ref, base_up, r_up),
                        shifted(qq_ref, base_dn, r_dn),
                        shifted(pp_ref, base_dn, r_dn),
                        loss,
                        gain,
                    )
                if recombination:
                    for j in (2 * d, 2 * d + 1):
                        s = 2 * kb * B + j
                        r_s = (ne - 1 - j) % 8
                        base_s = 8 * rev_ref[s]
                        loss, gain = recomb_body(
                            k,
                            s,
                            j == 2 * d,
                            shifted(qqr_ref, base_s, r_s),
                            shifted(ppr_ref, base_s, r_s),
                            loss,
                            gain,
                        )

        if not row_gating:
            loss_ref[:] = loss
            gain_ref[:] = gain

        @pl.when(kb == nkb - 1)
        def _finish():
            # QP update: positivity-preserving exponential relaxation;
            # decay is reused for expm1's large-|x| branch (one exp per bin)
            mu = jnp.maximum(loss_ref[:], 0.0)
            gain_t = jnp.maximum(partner * gain_ref[:], 0.0)
            x = mu * dt
            decay = jnp.exp(-x)
            taylor = x * (1.0 - x * (0.5 - x * ((1.0 / 6.0) - x * (1.0 / 24.0))))
            one_minus_decay = jnp.where(x < 1e-2, taylor, 1.0 - decay)
            coeff = jnp.where(
                mu < _MU_FLOOR, dt, one_minus_decay / jnp.maximum(mu, _MU_FLOOR)
            )
            q_out[:] = jnp.maximum(decay * q + coeff * gain_t, 0.0)
            # phonon update: frozen-coefficient affine growth (untouched
            # rows have a = b = 0 and stay exactly fixed)
            if update_phonons:
                y = ph_ref[:]
                a_term = a_ref[:]
                b_term = b_ref[:]
                x = jnp.clip(b_term * dt, -_AFFINE_CLIP, _AFFINE_CLIP)
                safe_b = jnp.where(jnp.abs(b_term) < _MU_FLOOR, 1.0, b_term)
                # one transcendental per row: the growth factor e^x doubles
                # as the large-|x| branch of the expm1 substitute
                ex = jnp.exp(x)
                taylor = x * (1.0 + x * (0.5 + x * ((1.0 / 6.0) + x * (1.0 / 24.0))))
                em1 = jnp.where(jnp.abs(x) < 1e-2, taylor, ex - 1.0)
                cph = jnp.where(jnp.abs(b_term) < _MU_FLOOR, dt, em1 / safe_b)
                ph_out[:] = jnp.maximum(ex * y + cph * a_term, 0.0)
            else:
                ph_out[:] = ph_ref[:]

    if multi_gap:
        gid_flat = np.zeros((8, int(np.asarray(gap_id).size)), np.int32)
        gid_flat[:] = np.asarray(gap_id, np.int32).reshape(1, -1)

    def step(n_qp: jax.Array, n_ph: jax.Array, gp: jax.Array | None = None):
        ne_, ny, nx = n_qp.shape
        dtype = n_qp.dtype
        p_live = ny * nx
        q = n_qp.reshape(ne_, p_live)
        ph = n_ph.reshape(nw, p_live)
        if ne_pad - ne_:
            q = jnp.pad(q, ((0, ne_pad - ne_), (0, 0)))
        qrev = jnp.concatenate([q[ne_ - 1 :: -1], q[ne_:]], axis=0)
        if nw_pad - nw:
            ph = jnp.pad(ph, ((0, nw_pad - nw), (0, 0)))
        pad_cols = (-p_live) % tile
        if analytic:
            if g2_row is not None:
                g2p = jnp.asarray(g2_row, dtype=dtype)
            else:
                g2p = jnp.broadcast_to(
                    (jnp.asarray(gp, dtype=dtype) ** 2).reshape(1, p_live),
                    (8, p_live),
                )
            if pad_cols:
                g2p = jnp.pad(g2p, ((0, 0), (0, pad_cols)))
        if pad_cols:
            q = jnp.pad(q, ((0, 0), (0, pad_cols)))
            qrev = jnp.pad(qrev, ((0, 0), (0, pad_cols)))
            ph = jnp.pad(ph, ((0, 0), (0, pad_cols)))
        p_pad = q.shape[1]
        grid = (p_pad // tile, nkb)
        tiled = lambda r: pl.BlockSpec(
            (r, tile), lambda t, kb: (0, t), memory_space=pltpu.VMEM
        )
        rep3 = lambda shape: pl.BlockSpec(
            shape, lambda t, kb: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        smem = lambda shape: pl.BlockSpec(
            shape, lambda t, kb: (0,), memory_space=pltpu.SMEM
        )
        as_dev = lambda arr: jnp.asarray(arr, dtype=dtype)

        row8_spec = pl.BlockSpec(
            (8, tile), lambda t, kb: (0, t), memory_space=pltpu.VMEM
        )
        args = [q, qrev, ph]
        specs = [tiled(ne_pad), tiled(ne_pad), tiled(nw_pad)]
        if analytic:
            args.append(g2p)
            specs.append(row8_spec)
            args += [
                as_dev(e_col), as_dev(e_rev_col),
                as_dev(inv_col), as_dev(inv_rev_col),
            ]
            specs += [rep3((ne_pad, 128))] * 4
            if scattering:
                args += [as_dev(e_up), as_dev(e_dn), as_dev(eB_up), as_dev(eB_dn)]
                specs += [rep3((1, ne_pad, kp))] * 4
            if recombination:
                args += [as_dev(r_ev), as_dev(r_od), as_dev(rB_ev), as_dev(rB_od)]
                specs += [rep3((1, ne_pad, kp))] * 4
        else:
            args += [as_dev(rho_pad), as_dev(rho_rev_pad)]
            specs += [
                rep3((n_gaps, ne_pad, 128)),
                rep3((n_gaps, ne_pad, 128)),
            ]
            if multi_gap:
                gid = jnp.asarray(gid_flat)
                if pad_cols:
                    gid = jnp.pad(gid, ((0, 0), (0, pad_cols)))
                args.append(gid)
                specs.append(row8_spec)
            if scattering:
                args += [as_dev(e_up), as_dev(e_dn)]
                if not sym_ks:
                    args += [as_dev(a_up), as_dev(a_dn)]
                specs += [rep3((n_gaps, ne_pad, kp))] * (2 if sym_ks else 4)
            if recombination:
                args += [as_dev(r_ev), as_dev(r_od)]
                specs += [rep3((n_gaps, ne_pad, kp))] * 2
        args += [
            jnp.asarray(drow_tab),
            jnp.asarray(srow_tab),
            jnp.asarray(up_tab, dtype=jnp.int32),
            jnp.asarray(dn_tab, dtype=jnp.int32),
            jnp.asarray(rev_tab, dtype=jnp.int32),
            jnp.asarray(dnw_tab, dtype=jnp.int32),
            jnp.asarray(revw_tab, dtype=jnp.int32),
        ]
        specs += [
            smem(drow_tab.shape),
            smem(srow_tab.shape),
            smem(up_tab.shape),
            smem(dn_tab.shape),
            smem(rev_tab.shape),
            smem(dnw_tab.shape),
            smem(revw_tab.shape),
        ]

        q_new, ph_new = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=specs,
            out_specs=(tiled(ne_pad), tiled(nw_pad)),
            out_shape=(
                jax.ShapeDtypeStruct((ne_pad, p_pad), dtype),
                jax.ShapeDtypeStruct((nw_pad, p_pad), dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * ne_pad + 8, tile), dtype),   # doubled q (+8 dn window)
                pltpu.VMEM((2 * ne_pad + 8, tile), dtype),   # doubled partner
                pltpu.VMEM((3 * ne_pad + 8, tile), dtype),   # tripled reversed q
                pltpu.VMEM((3 * ne_pad + 8, tile), dtype),   # tripled reversed partner
                pltpu.VMEM((ne_pad, tile), dtype),
                pltpu.VMEM((ne_pad, tile), dtype),
                pltpu.VMEM((nw_pad, tile), dtype),
                pltpu.VMEM((nw_pad, tile), dtype),
            ]
            + (
                [
                    pltpu.VMEM((8, tile), dtype),    # per-run phonon partials
                    pltpu.VMEM((8, tile), dtype),
                    pltpu.VMEM((16, tile), dtype),
                    pltpu.VMEM((16, tile), dtype),
                ]
                if row_gating
                else []
            ),
            interpret=interpret,
        )(*args)
        q_out = q_new[:ne_, :p_live].reshape(ne_, ny, nx)
        ph_out = ph_new[:nw, :p_live].reshape(nw, ny, nx)
        return q_out, ph_out

    if arg_mode:
        return lambda n_qp, n_ph, gp: step(n_qp, n_ph, gp)
    if analytic:
        return lambda n_qp, n_ph: step(n_qp, n_ph)
    return step


def build_pallas_collision_step_blocked_analytic(
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
    block: int = _DEFAULT_BLOCK_ANALYTIC,
    interpret: bool = False,
    hoist_loads: bool = True,
    row_gating: bool = False,
):
    """Analytic-gap variant of the block-gridded kernel (NE > 64).

    Exact per-pixel kernels from a continuous gap map Δ(x, y), with no
    bound on the number of distinct gap values: the Kaplan kernels are
    affine in Δ² (K^s = max(A_s − B_s·Δ², 0), K^r = A_r + B_r·Δ²) and the
    Dynes DOS a closed form of it, so one per-pixel Δ² row replaces all
    per-gap tables — the same identity
    ``build_pallas_collision_step_analytic`` (pallas_collisions.py:455)
    uses within the pair-unroll envelope, carried beyond 64 bins on the
    blocked grid.  This is the only fast path for NE > 64 continuous gap
    maps: the unique-gap table route materialises (G, NE, NE) stacks with
    G ≈ Npix (reference solver.py:1203-1232 has the same blow-up).

    Same contract as ``build_pallas_collision_step_analytic``: with
    ``gap_plane=None`` the returned step takes the dense gap plane as a
    third call-time argument (spatially sharded callers pass their own
    slice).  Returns None outside the blocked envelope (non-uniform grid
    or split ω diagonals).
    """
    ne = int(np.asarray(E_bins).size)
    return build_pallas_collision_step_blocked(
        E_bins=E_bins,
        dE=dE,
        rho=np.zeros(max(ne, 1)),
        K_s0=None,
        K_r0=None,
        pmap=pmap,
        dt=dt,
        update_phonons=update_phonons,
        tile=tile,
        block=block,
        interpret=interpret,
        hoist_loads=hoist_loads,
        row_gating=row_gating,
        _analytic=dict(
            gap_plane=gap_plane,
            tau_s=tau_s,
            tau_r=tau_r,
            T_c=T_c,
            dynes_gamma=dynes_gamma,
        ),
    )
