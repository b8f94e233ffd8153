"""Pallas TPU kernel: static-offset Fischer–Catelani collision substep.

Third point in the collision-kernel design space (see
``pallas_collisions.py`` for the pair-unrolled kernel, ≤64 bins, and
``pallas_collisions_loop.py`` for the ``fori_loop`` kernel):

* The **pair-unrolled** kernel emits ~NE²/2 × ~30 row ops — compile time
  grows quadratically (≈25 s Mosaic at 50 bins) which caps it at 64 bins.
* The **fori_loop** kernel compiles in seconds at any NE but measures ~6×
  slower per substep: the loop-carried ±1 rolls and the dynamic-index
  phonon read-modify-writes serialize the loop (Mosaic cannot software-
  pipeline across the VMEM carries), and every iteration re-extracts its
  coefficient columns with masked lane reductions.

This kernel walks the same Toeplitz/Hankel offset structure as the loop
kernel but with the offset loop **unrolled in Python at row granularity**:
every phonon-occupation access is a *static* sublane row, every coefficient
column a *static* lane slice of a VMEM table, and the shifted states are
static rolls — no loop carries, no dynamic indices, so Mosaic schedules the
whole walk freely.  The emitted op count is ~NE × ~20 full-array ops
(8-block triangle slicing trims the invalid rows), i.e. ~NE fewer, ~NE×
larger ops than the pair-unrolled kernel.

**Status: EXPERIMENTAL — not auto-dispatched.**  Measured on v5e: Mosaic's
scoped-VMEM stack allocator gives the walk's temporaries (rolled states,
band products) their own stack slots instead of reusing dead buffers, and
a caller's scan-unroll MULTIPLIES the need (the unrolled bodies' stacks
sum): NE=50 compiles inside an unroll=8 scan (1.97 ms/substep at 256²),
NE=70 needs 56 MB there (16 MB limit) yet compiles standalone, NE=88+
fails even standalone (~46-58 MB, any lane tile).  Runtime where it
compiles is ~2.5× the pair-unrolled kernel's per-op-count extrapolation —
so the pair kernel stays the production path ≤64 bins and the fori_loop
kernel/XLA integrator serve NE>64 until the allocator improves.  The
builder caps at ``_MAX_ROWS_BINS`` and callers control their own unroll.

Physics and update formulas are identical to ``ops.collisions``
(positivity-preserving exponential relaxation, frozen-coefficient affine
phonon growth — reference ``qpsim/solver.py:1239-1453`` semantics); parity
is tested in interpret mode against the XLA path.  Envelope: uniform gap,
uniform energy grid, any NE ≥ 2 (VMEM bounds ~192 at the default tile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_collisions import _AFFINE_CLIP, _EPS_RHO, _MU_FLOOR, _expm1, _grid_uniform
from .pallas_collisions_loop import _round_up
from .phonon_map import PhononFrequencyMap

__all__ = ["build_pallas_collision_step_rows"]

_DEFAULT_TILE = 512
#: empirical Mosaic envelope: the recombination walk's ~2NE per-column
#: band temporaries each get their own scoped-VMEM stack slot (no reuse
#: across the unrolled straight-line code), measured 46 MB at NE=80 /
#: 58 MB at NE=88 against the 16 MB limit regardless of lane tile;
#: NE=72 compiles (and runs) cleanly.  Beyond this the fori_loop kernel
#: (consistent ω grids) or the XLA integrator takes over.
_MAX_ROWS_BINS = 72


def _flip_rows(x: jax.Array, n_live: int) -> jax.Array:
    """Reverse the first ``n_live`` rows (static concat — ``jnp.flip``/``rev``
    has no Mosaic TPU lowering; padding rows keep their place)."""
    parts = [x[i : i + 1] for i in range(n_live - 1, -1, -1)]
    if x.shape[0] > n_live:
        parts.append(x[n_live:])
    return jnp.concatenate(parts, axis=0)


def _roll_up(x: jax.Array, k: int) -> jax.Array:
    """rows r ← r+k (circular; wrap rows are gated by zero coefficients)."""
    k = k % x.shape[0]
    if k == 0:
        return x
    return jnp.concatenate([x[k:], x[:k]], axis=0)


def _roll_dn(x: jax.Array, k: int) -> jax.Array:
    """rows r ← r−k (circular)."""
    k = k % x.shape[0]
    if k == 0:
        return x
    return jnp.concatenate([x[-k:], x[:-k]], axis=0)


def build_pallas_collision_step_rows(
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
):
    """Build ``(n_qp, n_ph) -> (n_qp, n_ph)`` for one collision substep.

    Same contract as ``pallas_collisions.build_pallas_collision_step``
    (uniform gap only — G > 1 stays on the loop kernel); returns ``None``
    outside the envelope (non-uniform energy grid, NE < 2).
    """
    e = np.asarray(E_bins, dtype=np.float64)
    ne = int(e.size)
    if ne < 2 or ne > _MAX_ROWS_BINS or np.asarray(rho, dtype=np.float64).ndim != 1:
        return None
    if not _grid_uniform(e):
        return None
    idx_diff = np.asarray(pmap.idx_diff)
    idx_sum = np.asarray(pmap.idx_sum)
    nw = pmap.num_omega
    ne_pad = _round_up(ne, 8)
    nw_pad = _round_up(nw, 8)
    ns = 2 * ne - 1
    kp = _round_up(ne_pad, 128)
    sp = _round_up(ns, 128)
    dt = float(dt)
    dE = float(dE)
    scattering = K_s0 is not None
    recombination = K_r0 is not None
    if not (scattering or recombination):
        return lambda n_qp, n_ph: (n_qp, n_ph)

    rho_v = np.asarray(rho, dtype=np.float64)
    rho_col = np.zeros((ne_pad, 128))
    rho_col[:ne] = rho_v[:, None]

    # One table column per (offset, ω bin) group.  The ω grid can split a
    # Toeplitz diagonal into near-duplicate bins (reference round-at-1e-12
    # dedup artifact — see pallas_collisions._uniform_pair_rows); walking
    # per-group keeps the reference's exact per-pair binning at ~zero extra
    # cost (a diagonal rarely splits into more than two groups).
    if scattering:
        Ksm = np.asarray(K_s0, dtype=np.float64)
        scat_cols: list[tuple[int, int]] = []  # (offset k, ω row)
        cols_eu, cols_ed, cols_au, cols_ad = [], [], [], []
        for k in range(1, ne):
            i_all = np.arange(k, ne)
            dks = idx_diff[i_all, i_all - k]
            for dk in np.unique(dks):
                sel = i_all[dks == dk]
                j = sel - k
                eu = np.zeros(ne_pad); eu[j] = Ksm[sel, j]
                ed = np.zeros(ne_pad); ed[sel] = Ksm[sel, j]
                au = np.zeros(ne_pad); au[j] = Ksm[j, sel]
                ad = np.zeros(ne_pad); ad[sel] = Ksm[j, sel]
                scat_cols.append((k, int(dk)))
                cols_eu.append(eu); cols_ed.append(ed)
                cols_au.append(au); cols_ad.append(ad)
        kp = _round_up(max(len(scat_cols), 1), 128)
        pack = lambda cols: np.pad(
            np.stack(cols, axis=1), ((0, 0), (0, kp - len(cols)))
        )
        e_up, e_dn, a_up, a_dn = pack(cols_eu), pack(cols_ed), pack(cols_au), pack(cols_ad)
    if recombination:
        Krm = np.asarray(K_r0, dtype=np.float64)
        rec_cols: list[tuple[int, int]] = []  # (anti-diagonal s, ω row)
        cols_r = []
        for srow in range(ns):
            i_lo = max(0, srow - ne + 1)
            i_hi = min(ne, srow + 1)
            i_all = np.arange(i_lo, i_hi)
            mss = idx_sum[i_all, srow - i_all]
            for ms in np.unique(mss):
                sel = i_all[mss == ms]
                rc = np.zeros(ne_pad); rc[sel] = Krm[sel, srow - sel]
                rec_cols.append((srow, int(ms)))
                cols_r.append(rc)
        sp = _round_up(max(len(rec_cols), 1), 128)
        r_tab = np.pad(np.stack(cols_r, axis=1), ((0, 0), (0, sp - len(cols_r))))

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        ph_ref = next(it)
        rho_ref = next(it)
        if scattering:
            eup_ref, edn_ref, aup_ref, adn_ref = next(it), next(it), next(it), next(it)
        if recombination:
            r_ref = next(it)
        q_out = next(it)
        ph_out = next(it)
        loss_ref = next(it)
        gain_ref = next(it)

        q = q_ref[:]
        rho_c = rho_ref[:, :1]
        safe = jnp.maximum(rho_c, _EPS_RHO)
        partner = jnp.where(rho_c > _EPS_RHO, rho_c * jnp.maximum(1.0 - q / safe, 0.0), 0.0)
        if recombination:
            # reversed over the LIVE rows only (padding rows stay zero):
            # qrev[i] = q[ne−1−i], the source of the anti-diagonal walk
            qrev = _flip_rows(q, ne)
            prev_rev = _flip_rows(partner, ne)

        loss_ref[:] = jnp.zeros_like(q)
        gain_ref[:] = jnp.zeros_like(q)
        # phonon ω-row accumulators: every touched row is a STATIC index, so
        # the a/b tables accumulate as plain values and write once at the end
        ph_a: dict[int, jax.Array] = {}
        ph_b_neg: dict[int, jax.Array] = {}

        def acc(table, idx, val):
            cur = table.get(idx)
            table[idx] = val if cur is None else cur + val

        if scattering:
            cur_k = 0
            # shifted states advance by INCREMENTAL ±1 rolls between offsets:
            # fresh roll-by-k values per offset are all live simultaneously
            # for Mosaic's stack allocator (measured 67 MB of scoped VMEM at
            # NE=100×tile 512 — a compile failure); the carried form needs
            # only the previous offset's buffers.
            q_up, p_up, q_dn, p_dn = q, partner, q, partner
            lo8 = hi8 = 0
            for c, (k, dk) in enumerate(scat_cols):
                if k != cur_k:
                    # 8-aligned triangle slicing: emission-type terms only
                    # touch rows ≥ k, absorption-type rows < ne−k; slicing at
                    # 8-block boundaries keeps every op layout-aligned while
                    # skipping the all-zero row blocks of the padded tables.
                    lo8 = (k // 8) * 8
                    hi8 = _round_up(ne - k, 8)
                    for _ in range(k - cur_k):  # offsets are ascending
                        q_up = _roll_up(q_up, 1)  # q_up[i] = q[i+k]
                        p_up = _roll_up(p_up, 1)
                        q_dn = _roll_dn(q_dn, 1)  # q_dn[i] = q[i−k]
                        p_dn = _roll_dn(p_dn, 1)
                    cur_k = k
                Dk = ph_ref[dk : dk + 1, :]  # (1, T) static row
                em = dE * (1.0 + Dk)
                ab = dE * Dk
                # emission i→i−k (rows ≥ k): loss[i] += em·K[i,i−k]·partner[i−k]
                ed = edn_ref[:, c : c + 1]
                loss_ref[lo8:, :] = loss_ref[lo8:, :] + (em * ed[lo8:]) * p_dn[lo8:]
                # emission source j = i−k (rows < ne−k): gain[j] += em·K[j+k,j]·q[j+k]
                eu = eup_ref[:, c : c + 1]
                s_em = eu[:hi8] * q_up[:hi8]
                gain_ref[:hi8, :] = gain_ref[:hi8, :] + em * s_em
                # absorption i→i+k (rows < ne−k): loss[i] += ab·K[i,i+k]·partner[i+k]
                au = aup_ref[:, c : c + 1]
                s_ab = au[:hi8] * p_up[:hi8]
                loss_ref[:hi8, :] = loss_ref[:hi8, :] + ab * s_ab
                # absorption dest j = i+k (rows ≥ k): gain[j] += ab·K[j−k,j]·q[j−k]
                ad = adn_ref[:, c : c + 1]
                gain_ref[lo8:, :] = gain_ref[lo8:, :] + (ab * ad[lo8:]) * q_dn[lo8:]
                if update_phonons:
                    # emission creates an ω≈k·dE phonon, absorption destroys one
                    p_em = jnp.sum(dE * s_em * partner[:hi8], axis=0, keepdims=True)
                    p_ab = jnp.sum(dE * s_ab * q[:hi8], axis=0, keepdims=True)
                    acc(ph_a, dk, p_em)
                    acc(ph_b_neg, dk, p_ab)

        if recombination:
            cur_s = 0
            # q_s(s)[i] = q[s−i]: start from the reversed state aligned to
            # s = 0, then advance by one incremental roll per anti-diagonal
            # (same stack-reuse argument as the scattering walk above)
            q_s = _roll_dn(qrev, (0 - (ne - 1)) % ne_pad)
            p_s = _roll_dn(prev_rev, (0 - (ne - 1)) % ne_pad)
            lo8 = hi8 = 0
            for c, (srow, ms) in enumerate(rec_cols):
                if srow != cur_s:
                    # valid i ∈ [max(0, s−ne+1), min(ne, s+1)): 8-aligned window
                    i_lo = max(0, srow - ne + 1)
                    i_hi = min(ne, srow + 1)
                    lo8 = (i_lo // 8) * 8
                    hi8 = _round_up(i_hi, 8)
                    for _ in range(srow - cur_s):
                        q_s = _roll_dn(q_s, 1)
                        p_s = _roll_dn(p_s, 1)
                    cur_s = srow
                elif c == 0:
                    i_lo = max(0, srow - ne + 1)
                    i_hi = min(ne, srow + 1)
                    lo8 = (i_lo // 8) * 8
                    hi8 = _round_up(i_hi, 8)
                Ss = ph_ref[ms : ms + 1, :]
                r = r_ref[:, c : c + 1]
                w_loss = (2.0 * dE) * r[lo8:hi8] * q_s[lo8:hi8]
                loss_ref[lo8:hi8, :] = loss_ref[lo8:hi8, :] + w_loss + (Ss * w_loss)
                gain_ref[lo8:hi8, :] = gain_ref[lo8:hi8, :] + (
                    (2.0 * dE) * Ss * (r[lo8:hi8] * p_s[lo8:hi8])
                )
                if update_phonons:
                    p_rec = jnp.sum(
                        dE * r[lo8:hi8] * q[lo8:hi8] * q_s[lo8:hi8],
                        axis=0, keepdims=True,
                    )
                    p_pb = jnp.sum(
                        dE * r[lo8:hi8] * partner[lo8:hi8] * p_s[lo8:hi8],
                        axis=0, keepdims=True,
                    )
                    acc(ph_a, ms, p_rec)
                    acc(ph_b_neg, ms, p_pb)

        # QP update: positivity-preserving exponential relaxation
        mu = jnp.maximum(loss_ref[:], 0.0)
        gain_t = jnp.maximum(partner * gain_ref[:], 0.0)
        decay = jnp.exp(-mu * dt)
        coeff = jnp.where(
            mu < _MU_FLOOR, dt, -_expm1(-mu * dt) / jnp.maximum(mu, _MU_FLOOR)
        )
        q_out[:] = jnp.maximum(decay * q + coeff * gain_t, 0.0)

        # phonon update: frozen-coefficient affine growth on touched rows
        for w in range(nw_pad):
            if update_phonons and (w in ph_a or w in ph_b_neg):
                y = ph_ref[w : w + 1, :]
                a_term = ph_a.get(w)
                if a_term is None:
                    a_term = jnp.zeros_like(y)
                neg = ph_b_neg.get(w)
                b_term = a_term if neg is None else a_term - neg
                x = jnp.clip(b_term * dt, -_AFFINE_CLIP, _AFFINE_CLIP)
                safe_b = jnp.where(jnp.abs(b_term) < _MU_FLOOR, 1.0, b_term)
                cph = jnp.where(jnp.abs(b_term) < _MU_FLOOR, dt, _expm1(x) / safe_b)
                ph_out[w : w + 1, :] = jnp.maximum(jnp.exp(x) * y + cph * a_term, 0.0)
            else:
                ph_out[w : w + 1, :] = ph_ref[w : w + 1, :]

    def step(n_qp: jax.Array, n_ph: jax.Array):
        ne_, ny, nx = n_qp.shape
        dtype = n_qp.dtype
        p_live = ny * nx
        q = n_qp.reshape(ne_, p_live)
        ph = n_ph.reshape(nw, p_live)
        if ne_pad - ne_:
            q = jnp.pad(q, ((0, ne_pad - ne_), (0, 0)))
        if nw_pad - nw:
            ph = jnp.pad(ph, ((0, nw_pad - nw), (0, 0)))
        pad_cols = (-p_live) % tile
        if pad_cols:
            q = jnp.pad(q, ((0, 0), (0, pad_cols)))
            ph = jnp.pad(ph, ((0, 0), (0, pad_cols)))
        p_pad = q.shape[1]
        grid = (p_pad // tile,)
        tiled = lambda r: pl.BlockSpec((r, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
        rep = lambda shape: pl.BlockSpec(
            shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        as_dev = lambda arr: jnp.asarray(arr, dtype=dtype)

        args = [q, ph, as_dev(rho_col)]
        specs = [tiled(ne_pad), tiled(nw_pad), rep((ne_pad, 128))]
        if scattering:
            args += [as_dev(e_up), as_dev(e_dn), as_dev(a_up), as_dev(a_dn)]
            specs += [rep((ne_pad, kp))] * 4
        if recombination:
            args.append(as_dev(r_tab))
            specs.append(rep((ne_pad, sp)))

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
                pltpu.VMEM((ne_pad, tile), dtype),
                pltpu.VMEM((ne_pad, tile), dtype),
            ],
            interpret=interpret,
        )(*args)
        q_out = q_new[:ne_, :p_live].reshape(ne_, ny, nx)
        ph_out = ph_new[:nw, :p_live].reshape(nw, ny, nx)
        return q_out, ph_out

    return step
