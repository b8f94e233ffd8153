"""Pallas TPU kernel: looped Fischer–Catelani collision substep (large NE).

The unrolled kernel (``pallas_collisions.py``) statically expands all NE²
energy-pair interactions — compile time grows quadratically, so it is capped
at 64 bins (it covers the reference's 50-bin default at ~4.8x this kernel's
throughput; measured 1.03 vs 4.96 ms/substep at 50×256²).  This kernel
covers NE > 64 and piecewise-constant gap maps (G ≤ 8) by walking the
pair structure with two ``fori_loop``s that exploit the uniform grid:

* **scattering** loops over the offset k = i−j (Toeplitz: every pair at
  offset k shares the phonon row n_ph(k·dE)); the shifted states q[j±k]
  are maintained as *incremental ±1 rolls* carried through the loop, so no
  dynamic-shift primitive is needed;
* **recombination** loops over the anti-diagonal s = i+j (Hankel: shared
  phonon row n_ph(E_i+E_j)); the partner state q[s−i] comes from a reversed
  copy of q rolled incrementally;
* kernel coefficients enter as (NE, NE) tables re-indexed per loop —
  zero-padded so no in-kernel validity masking is needed — with the per-k
  column extracted by a masked lane reduction;
* phonon ω-row accumulation uses dynamic-sublane read-modify-writes into
  VMEM scratch (``pl.ds``), exact because the loops are sequential.

Physics and update formulas are identical to ``ops.collisions`` /
``pallas_collisions`` (positivity-preserving exponential relaxation, affine
phonon growth); parity is tested in interpret mode against the XLA path.
Supported envelope: uniform gap, uniform energy grid, any NE ≥ 2 (VMEM
bounds the practical range around NE ≲ 192 at the default tile; the
block-gridded kernel supersedes it on the dispatch path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_collisions import _AFFINE_CLIP, _EPS_RHO, _MU_FLOOR, _expm1, _uniform_pair_rows
from .phonon_map import PhononFrequencyMap

__all__ = ["build_pallas_collision_step_loop"]

_DEFAULT_TILE = 512


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _roll1(x: jax.Array, down: bool) -> jax.Array:
    """Circular roll by ±1 along axis 0 via slice+concat (lowers everywhere)."""
    if down:  # row r ← row r−1
        return jnp.concatenate([x[-1:], x[:-1]], axis=0)
    return jnp.concatenate([x[1:], x[:1]], axis=0)


def _rollm(x: jax.Array, m: int) -> jax.Array:
    """Static circular roll by +m rows."""
    m = m % x.shape[0]
    if m == 0:
        return x
    return jnp.concatenate([x[-m:], x[:-m]], axis=0)


def _offset_tables(K: np.ndarray, ne: int, ne_pad: int, kp: int):
    """Per-offset coefficient tables for the scattering loop.

    e_up[j, k] = K[j+k, j]   (emission, source row j)
    e_dn[i, k] = K[i, i−k]   (emission, destination row i)
    a_up[i, k] = K[i, i+k]   (absorption, source row i)
    a_dn[j, k] = K[j−k, j]   (absorption, destination row j)
    Entries outside the valid triangle are zero — they gate the circular
    roll wrap-around, so the kernel needs no masking.
    """
    e_up = np.zeros((ne_pad, kp))
    e_dn = np.zeros((ne_pad, kp))
    a_up = np.zeros((ne_pad, kp))
    a_dn = np.zeros((ne_pad, kp))
    for k in range(1, ne):
        j = np.arange(0, ne - k)
        e_up[j, k] = K[j + k, j]
        a_up[j, k] = K[j, j + k]
        i = np.arange(k, ne)
        e_dn[i, k] = K[i, i - k]
        a_dn[i, k] = K[i - k, i]
    return e_up, e_dn, a_up, a_dn


def _antidiag_table(K: np.ndarray, ne: int, ne_pad: int, sp: int) -> np.ndarray:
    """R[i, s] = K[i, s−i] (recombination anti-diagonals), zero-padded."""
    R = np.zeros((ne_pad, sp))
    for s in range(2 * ne - 1):
        i = np.arange(max(0, s - ne + 1), min(ne, s + 1))
        R[i, s] = K[i, s - i]
    return R


def build_pallas_collision_step_loop(
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
):
    """Build ``(n_qp, n_ph) -> (n_qp, n_ph)`` for one collision substep.

    Same contract as ``pallas_collisions.build_pallas_collision_step``;
    returns None outside the envelope (non-uniform energy grid).

    Non-uniform gap maps: pass ``rho``/``K_s0``/``K_r0`` stacked by gap id
    as (G, NE)/(G, NE, NE) together with a dense (Ny, Nx) int ``gap_id``
    plane (0 on masked-out cells).  Every coefficient column then blends the
    G tables per pixel with ``where`` selects — the unique-gap cache of the
    reference (solver.py:1203-1232) in kernel form.  Practical for small G
    (piecewise-constant gap maps: bilayers, proximitized regions).
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
    kp = _round_up(ne_pad, 128)
    sp = _round_up(ns, 128)
    dt = float(dt)
    dE = float(dE)
    scattering = K_s0 is not None
    recombination = K_r0 is not None
    if not (scattering or recombination):
        return lambda n_qp, n_ph: (n_qp, n_ph)

    rho_g = np.asarray(rho, dtype=np.float64)
    if rho_g.ndim == 1:
        rho_g = rho_g[None]
    n_gaps = rho_g.shape[0]
    multi_gap = gap_id is not None and n_gaps > 1
    stack = lambda K: np.asarray(K, dtype=np.float64).reshape(n_gaps, ne, ne)

    rho_pad = np.zeros((n_gaps, ne_pad, 128))
    rho_pad[:, :ne] = rho_g[:, :, None]
    rho_rev_pad = np.zeros((n_gaps, ne_pad, 128))
    rho_rev_pad[:, :ne] = rho_g[:, ::-1, None]
    diff_tab = np.zeros(ne_pad, np.int32)
    diff_tab[1:ne] = np.asarray(diff_row[1:], np.int32)
    sum_tab = np.zeros(_round_up(ns, 8), np.int32)
    sum_tab[:ns] = np.asarray(sum_row, np.int32)

    if scattering:
        tabs = [_offset_tables(K, ne, ne_pad, kp) for K in stack(K_s0)]
        e_up, e_dn, a_up, a_dn = (np.stack([t[i] for t in tabs]) for i in range(4))
    if recombination:
        r_tab = np.stack([_antidiag_table(K, ne, ne_pad, sp) for K in stack(K_r0)])

    def kernel(*refs):
        it = iter(refs)
        q_ref = next(it)
        qrev_ref = next(it)
        ph_ref = next(it)
        rho_ref = next(it)
        rhorev_ref = next(it)
        gid_ref = next(it) if multi_gap else None
        if scattering:
            eup_ref, edn_ref, aup_ref, adn_ref = next(it), next(it), next(it), next(it)
        if recombination:
            r_ref = next(it)
        drow_ref = next(it)
        srow_ref = next(it)
        q_out = next(it)
        ph_out = next(it)
        loss_ref = next(it)
        gain_ref = next(it)
        a_ref = next(it)
        b_ref = next(it)

        q = q_ref[:]
        qrev = qrev_ref[:]
        gid = gid_ref[:1, :] if multi_gap else None  # (1, T) int32

        def by_gap(vals):
            """Blend per-gap (NE_pad, 1) columns into a per-pixel plane."""
            if not multi_gap:
                return vals[0]
            out = jnp.where(gid == 0, vals[0], 0.0)
            for g in range(1, n_gaps):
                out = jnp.where(gid == g, vals[g], out)
            return out

        rho_c = by_gap([rho_ref[g, :, :1] for g in range(n_gaps)])
        rhorev_c = by_gap([rhorev_ref[g, :, :1] for g in range(n_gaps)])
        safe = jnp.maximum(rho_c, _EPS_RHO)
        partner = jnp.where(rho_c > _EPS_RHO, rho_c * jnp.maximum(1.0 - q / safe, 0.0), 0.0)
        safe_r = jnp.maximum(rhorev_c, _EPS_RHO)
        partner_rev = jnp.where(
            rhorev_c > _EPS_RHO, rhorev_c * jnp.maximum(1.0 - qrev / safe_r, 0.0), 0.0
        )
        zero = jnp.zeros_like(q)
        loss_ref[:] = zero
        gain_ref[:] = zero
        if update_phonons:
            zph = jnp.zeros((nw_pad, q.shape[1]), dtype=q.dtype)
            a_ref[:] = zph
            b_ref[:] = zph

        lanes_k = jax.lax.broadcasted_iota(jnp.int32, (ne_pad, kp), 1)
        lanes_s = jax.lax.broadcasted_iota(jnp.int32, (ne_pad, sp), 1)

        def col(ref, lanes, idx):
            return by_gap(
                [
                    jnp.sum(jnp.where(lanes == idx, ref[g], 0.0), axis=1, keepdims=True)
                    for g in range(n_gaps)
                ]
            )

        if scattering:

            def body_k(k, carry):
                q_up, p_up, q_dn, p_dn = carry
                q_up = _roll1(q_up, down=False)
                p_up = _roll1(p_up, down=False)
                q_dn = _roll1(q_dn, down=True)
                p_dn = _roll1(p_dn, down=True)
                dk = drow_ref[k]
                Dk = ph_ref[pl.ds(dk, 1), :]  # (1, T)
                em = dE * (1.0 + Dk)
                ab = dE * Dk
                eu = col(eup_ref, lanes_k, k)
                ed = col(edn_ref, lanes_k, k)
                au = col(aup_ref, lanes_k, k)
                ad = col(adn_ref, lanes_k, k)
                loss_ref[:] = loss_ref[:] + em * ed * p_dn + ab * au * p_up
                gain_ref[:] = gain_ref[:] + em * eu * q_up + ab * ad * q_dn
                if update_phonons:
                    p_em = jnp.sum(dE * eu * q_up * partner, axis=0, keepdims=True)
                    p_ab = jnp.sum(dE * au * q * p_up, axis=0, keepdims=True)
                    a_ref[pl.ds(dk, 1), :] = a_ref[pl.ds(dk, 1), :] + p_em
                    b_ref[pl.ds(dk, 1), :] = b_ref[pl.ds(dk, 1), :] + p_em - p_ab
                return q_up, p_up, q_dn, p_dn

            jax.lax.fori_loop(1, ne, body_k, (q, partner, q, partner))

        if recombination:

            def body_s(s, carry):
                q_s, p_s = carry
                ms = srow_ref[s]
                Ss = ph_ref[pl.ds(ms, 1), :]
                r = col(r_ref, lanes_s, s)
                loss_ref[:] = loss_ref[:] + (2.0 * dE) * r * (1.0 + Ss) * q_s
                gain_ref[:] = gain_ref[:] + (2.0 * dE) * r * Ss * p_s
                if update_phonons:
                    p_rec = jnp.sum(dE * r * q * q_s, axis=0, keepdims=True)
                    p_pb = jnp.sum(dE * r * partner * p_s, axis=0, keepdims=True)
                    a_ref[pl.ds(ms, 1), :] = a_ref[pl.ds(ms, 1), :] + p_rec
                    b_ref[pl.ds(ms, 1), :] = b_ref[pl.ds(ms, 1), :] + p_rec - p_pb
                return _roll1(q_s, down=True), _roll1(p_s, down=True)

            # q_s(s)[i] = q[s−i]: start from the reversed state rolled so
            # that s = 0 aligns, then roll down by one row per s.
            init = (
                _rollm(qrev, -(ne - 1)),
                _rollm(partner_rev, -(ne - 1)),
            )
            jax.lax.fori_loop(0, ns, body_s, init)

        # QP update: positivity-preserving exponential relaxation
        mu = jnp.maximum(loss_ref[:], 0.0)
        gain_t = jnp.maximum(partner * gain_ref[:], 0.0)
        decay = jnp.exp(-mu * dt)
        coeff = jnp.where(
            mu < _MU_FLOOR, dt, -_expm1(-mu * dt) / jnp.maximum(mu, _MU_FLOOR)
        )
        q_out[:] = jnp.maximum(decay * q + coeff * gain_t, 0.0)

        # phonon update: frozen-coefficient affine growth (untouched rows
        # have a = b = 0 and stay exactly fixed)
        if update_phonons:
            y = ph_ref[:]
            a_term = a_ref[:]
            b_term = b_ref[:]
            x = jnp.clip(b_term * dt, -_AFFINE_CLIP, _AFFINE_CLIP)
            safe_b = jnp.where(jnp.abs(b_term) < _MU_FLOOR, 1.0, b_term)
            cph = jnp.where(jnp.abs(b_term) < _MU_FLOOR, dt, _expm1(x) / safe_b)
            ph_out[:] = jnp.maximum(jnp.exp(x) * y + cph * a_term, 0.0)
        else:
            ph_out[:] = ph_ref[:]

    if multi_gap:
        gid_flat = np.zeros((8, int(np.asarray(gap_id).size)), np.int32)
        gid_flat[:] = np.asarray(gap_id, np.int32).reshape(1, -1)

    def step(n_qp: jax.Array, n_ph: jax.Array):
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
        if pad_cols:
            q = jnp.pad(q, ((0, 0), (0, pad_cols)))
            qrev = jnp.pad(qrev, ((0, 0), (0, pad_cols)))
            ph = jnp.pad(ph, ((0, 0), (0, pad_cols)))
        p_pad = q.shape[1]
        grid = (p_pad // tile,)
        tiled = lambda r: pl.BlockSpec((r, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
        rep3 = lambda shape: pl.BlockSpec(
            shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        smem = lambda shape: pl.BlockSpec(shape, lambda t: (0,), memory_space=pltpu.SMEM)
        as_dev = lambda arr: jnp.asarray(arr, dtype=dtype)

        args = [q, qrev, ph, as_dev(rho_pad), as_dev(rho_rev_pad)]
        specs = [
            tiled(ne_pad),
            tiled(ne_pad),
            tiled(nw_pad),
            rep3((n_gaps, ne_pad, 128)),
            rep3((n_gaps, ne_pad, 128)),
        ]
        if multi_gap:
            gid = jnp.asarray(gid_flat)
            if pad_cols:
                gid = jnp.pad(gid, ((0, 0), (0, pad_cols)))
            args.append(gid)
            specs.append(
                pl.BlockSpec((8, tile), lambda t: (0, t), memory_space=pltpu.VMEM)
            )
        if scattering:
            args += [as_dev(e_up), as_dev(e_dn), as_dev(a_up), as_dev(a_dn)]
            specs += [rep3((n_gaps, ne_pad, kp))] * 4
        if recombination:
            args.append(as_dev(r_tab))
            specs.append(rep3((n_gaps, ne_pad, sp)))
        args += [jnp.asarray(diff_tab), jnp.asarray(sum_tab)]
        specs += [smem(diff_tab.shape), smem(sum_tab.shape)]

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
                pltpu.VMEM((nw_pad, tile), dtype),
                pltpu.VMEM((nw_pad, tile), dtype),
            ],
            interpret=interpret,
        )(*args)
        q_out = q_new[:ne_, :p_live].reshape(ne_, ny, nx)
        ph_out = ph_new[:nw, :p_live].reshape(nw, ny, nx)
        return q_out, ph_out

    return step
