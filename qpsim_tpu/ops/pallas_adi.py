"""Fused Pallas TPU kernels for the Peaceman–Rachford ADI diffusion step.

Why this exists — the XLA ADI path (`solver.diffusion_backends.ADIDiffusion`)
solves the per-direction Crank–Nicolson tridiagonal systems with
``lax.scan`` Thomas sweeps.  Scan *inputs must be materialised*, so each
solve writes four full (NB, Ny, Nx) coefficient arrays (the lazily-scaled
operator gets broadcast right back into HBM) plus the (w, g) stacked sweep
outputs: ~7 full-array HBM round trips per half-step.  This module replaces
each half-step solve with one Pallas kernel that

* reads the right-hand side exactly once, tile by tile,
* builds the CN coefficients **in VMEM** from the small unit-D geometry
  planes (Ny, Nx) × a per-bin scalar D(E) (the ``SplitOperator.bin_scale``
  factorisation — reference operator semantics per
  ``/root/reference/qpsim/solver.py:221-232``), so per-bin coefficients
  never touch HBM,
* runs both Thomas sweeps in VMEM scratch, and writes the solution once.

Layout: lines live on the **sublane axis**.  The y-direction solve runs in
the natural (NB, Ny, Nx) layout (lines along y = axis -2); the x-direction
solve runs in the swapped (NB, Nx, Ny) layout produced by the rhs stencil
pass.  Grid order is (lane-tile, bin) with the bin innermost, so the
geometry-plane blocks keep the same block index across consecutive grid
steps and Pallas skips their re-fetch.

Numerics are identical to ``tridiag.tridiag_solve`` (sub[0]/sup[-1] are
never read; all-zero coefficient rows — masked-out cells and padding —
reduce to the identity and decouple exactly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "solve_lines_pallas",
    "build_pallas_adi_step",
    "build_pallas_adi_fused_step",
    "pallas_adi_available",
]

_LANES = 128


def _wang_stages(a_c, b_c, c_c, d_c, m: int, k: int, lanes: int):
    """Stages 1–3 of the Wang partition solve on chunk-major VMEM scratches.

    On entry the (M, K·lanes) scratches hold the CN coefficients (a, b, c)
    and the rhs (d), chunks side-by-side on the lane axis.  On exit a_c/c_c/
    d_c hold the final (A, C, D) of  x_i = D_i − A_i·X_L − C_i·X_R  and the
    returned ``(Ls, Rs)`` are the per-chunk boundary solutions (length-K
    lists of (lanes,) vectors).  Recurrences match
    ``tridiag.tridiag_solve_wang`` exactly.
    """
    # Stage 1 — forward in-chunk elimination of the sub-diagonal.
    a0 = a_c[0, :]
    inv0 = 1.0 / b_c[0, :]
    cp = c_c[0, :] * inv0
    ap = a0 * inv0  # = −a_0·(−1)·inv0: X_L enters row 0 with weight a_0
    dp = d_c[0, :] * inv0
    a_c[0, :] = ap
    c_c[0, :] = cp
    d_c[0, :] = dp

    def forward(i, carry):
        cp_p, ap_p, dp_p = carry
        a_i = a_c[i, :]
        inv = 1.0 / (b_c[i, :] - a_i * cp_p)
        cp_i = c_c[i, :] * inv
        ap_i = -a_i * ap_p * inv
        dp_i = (d_c[i, :] - a_i * dp_p) * inv
        a_c[i, :] = ap_i
        c_c[i, :] = cp_i
        d_c[i, :] = dp_i
        return cp_i, ap_i, dp_i

    cp_l, ap_l, dp_l = jax.lax.fori_loop(1, m, forward, (cp, ap, dp))

    # Stage 2 — backward elimination of the super-diagonal (row m−1 is
    # already in final form: its cp couples X_R directly).
    c_c[m - 1, :] = cp_l

    def backward(j, carry):
        c_n, a_n, d_n = carry
        i = m - 2 - j
        cp_i = c_c[i, :]
        c_i = -cp_i * c_n
        a_i = a_c[i, :] - cp_i * a_n
        d_i = d_c[i, :] - cp_i * d_n
        a_c[i, :] = a_i
        c_c[i, :] = c_i
        d_c[i, :] = d_i
        return c_i, a_i, d_i

    jax.lax.fori_loop(0, m - 1, backward, (cp_l, ap_l, dp_l))

    # Stage 3 — 2K-unknown interface sweep (unrolled; K static):
    #   L_j + aL_j·R_{j−1} + cL_j·L_{j+1} = dL_j
    #   R_j + aR_j·R_{j−1} + cR_j·L_{j+1} = dR_j,  R_{j−1} = g − w·L_j
    col = lambda j: slice(j * lanes, (j + 1) * lanes)
    g = jnp.zeros((lanes,), dtype=d_c.dtype)
    w = jnp.zeros((lanes,), dtype=d_c.dtype)
    ps, qs, gs, ws = [], [], [], []
    for j in range(k):
        aL, cL, dL = a_c[0, col(j)], c_c[0, col(j)], d_c[0, col(j)]
        aR, cR, dR = a_c[m - 1, col(j)], c_c[m - 1, col(j)], d_c[m - 1, col(j)]
        inv = 1.0 / (1.0 - aL * w)
        p = (dL - aL * g) * inv
        q = cL * inv
        g = dR - aR * g + aR * w * p
        w = cR + aR * w * q
        ps.append(p)
        qs.append(q)
        gs.append(g)
        ws.append(w)
    L_next = jnp.zeros((lanes,), dtype=d_c.dtype)
    Ls, Rs = [None] * k, [None] * k
    for j in range(k - 1, -1, -1):
        Ls[j] = ps[j] - qs[j] * L_next
        Rs[j] = gs[j] - ws[j] * L_next
        L_next = Ls[j]
    return Ls, Rs


def _make_wang_kernel(alpha: float, n: int, k: int, lanes: int):
    """Wang-partition solve along sublanes, K chunks eliminated in parallel.

    The plain Thomas kernel (below) advances one (1, lanes) row per
    sequential step — 2n dependent vector ops per block, which measures
    compute-serialized (ties the XLA scan path).  This kernel splits each
    line into K chunks laid side-by-side on the lane axis (an in-VMEM
    relayout, K contiguous (M, lanes) block copies), so every sweep step
    processes a (1, K·lanes) row: 1/K the sequential depth at K× the vector
    width.  The chunk-boundary unknowns satisfy a 2K-unknown interface
    recurrence, solved unrolled (K is small and static).  Recurrences are
    identical to ``tridiag.tridiag_solve_wang`` (same decoupling semantics:
    zero couplings cut the fill-in chains exactly).

    CN coefficients are assembled during the relayout from the geometry
    planes × the per-bin scale, so they never exist in HBM.
    """
    m = n // k

    def kernel(scale_ref, lo_ref, di_ref, hi_ref, rhs_ref, out_ref,
               a_c, b_c, c_c, d_c):
        bi = pl.program_id(1)
        s = scale_ref[bi, 0]
        neg_as = -alpha * s

        # relayout to chunk-major (M, K·lanes) + CN coefficient assembly
        for c in range(k):
            rows = slice(c * m, (c + 1) * m)
            cols = slice(c * lanes, (c + 1) * lanes)
            a_c[:, cols] = neg_as * lo_ref[0, rows, :]
            b_c[:, cols] = 1.0 - alpha * s * di_ref[0, rows, :]
            c_c[:, cols] = neg_as * hi_ref[0, rows, :]
            d_c[:, cols] = rhs_ref[0, rows, :]

        Ls, Rs = _wang_stages(a_c, b_c, c_c, d_c, m, k, lanes)

        # Stage 4 — back-substitution fused with the un-relayout.
        col = lambda j: slice(j * lanes, (j + 1) * lanes)
        zero = jnp.zeros((lanes,), dtype=d_c.dtype)
        for c in range(k):
            rows = slice(c * m, (c + 1) * m)
            XL = Rs[c - 1] if c > 0 else zero
            XR = Ls[c + 1] if c < k - 1 else zero
            out_ref[0, rows, :] = (
                d_c[:, col(c)] - a_c[:, col(c)] * XL - c_c[:, col(c)] * XR
            )

    return kernel


def _make_kernel(alpha: float, n: int):
    """Thomas solve along sublanes with in-VMEM coefficient assembly.

    Block shapes: lo/di/hi (1, N, L) geometry planes, rhs/out (1, N, L),
    scale (NB, 1) in SMEM; scratch g (N, L).  The forward sweep stores w in
    the *output* block (overwritten in place by the backward sweep), so the
    kernel needs a single scratch buffer.
    """

    def kernel(scale_ref, lo_ref, di_ref, hi_ref, rhs_ref, out_ref, g_ref):
        b = pl.program_id(1)
        s = scale_ref[b, 0]
        neg_as = -alpha * s

        inv0 = 1.0 / (1.0 - alpha * s * di_ref[0, 0, :])
        w = neg_as * hi_ref[0, 0, :] * inv0
        g = rhs_ref[0, 0, :] * inv0
        out_ref[0, 0, :] = w
        g_ref[0, :] = g

        def forward(i, carry):
            w_prev, g_prev = carry
            a_i = neg_as * lo_ref[0, i, :]
            inv = 1.0 / (1.0 - alpha * s * di_ref[0, i, :] - a_i * w_prev)
            w_i = neg_as * hi_ref[0, i, :] * inv
            g_i = (rhs_ref[0, i, :] - a_i * g_prev) * inv
            out_ref[0, i, :] = w_i
            g_ref[i, :] = g_i
            return w_i, g_i

        _, g_last = jax.lax.fori_loop(1, n, forward, (w, g))
        out_ref[0, n - 1, :] = g_last

        def backward(k, x_next):
            i = n - 2 - k
            x_i = g_ref[i, :] - out_ref[0, i, :] * x_next
            out_ref[0, i, :] = x_i
            return x_i

        jax.lax.fori_loop(0, n - 1, backward, g_last)

    return kernel


def _make_fused_x_kernel(alpha: float, n: int, ly: int, k: int, store_dtype=None):
    """x-implicit ADI half fused into one pass: rhs stencil + solve.

    Reads a (ly, n) tile of the natural-layout state plus 8-row halo groups
    (single-row blocks are not tileable on TPU; the needed row is the
    last/first row of the adjacent group, and the index clamp at the global
    edges is harmless because the boundary coefficients there are zero),
    computes  rhs = u + alpha*s*(Ly u + src)  in VMEM, transposes to put the
    x lines on sublanes, and Wang-solves  (I - alpha*s*Lx) u* = rhs.  The
    output stays in the swapped (NB, Nx, Ny) layout — the y kernel consumes
    it there — so each half costs exactly one HBM read + write of the state.
    """
    m = n // k

    def kernel(scale_ref, u_ref, up_ref, dn_ref, yl_ref, yh_ref, yd_ref,
               s_ref, xl_ref, xd_ref, xh_ref, outT_ref, a_c, b_c, c_c, d_c):
        bi = pl.program_id(1)
        s = scale_ref[bi, 0]
        a_s = alpha * s
        neg_as = -a_s

        u = u_ref[0].astype(d_c.dtype)  # (ly, n); upcast bf16 state for compute
        prev = jnp.concatenate([up_ref[0, 7:8, :].astype(d_c.dtype), u[:-1]], axis=0)
        nxt = jnp.concatenate([u[1:], dn_ref[0, 0:1, :].astype(d_c.dtype)], axis=0)
        rhs = u + a_s * (yl_ref[0] * prev + yh_ref[0] * nxt + yd_ref[0] * u + s_ref[0])
        rhsT = rhs.T  # (n, ly): lines on sublanes

        for c in range(k):
            rows = slice(c * m, (c + 1) * m)
            cols = slice(c * ly, (c + 1) * ly)
            a_c[:, cols] = neg_as * xl_ref[0, rows, :]
            b_c[:, cols] = 1.0 - a_s * xd_ref[0, rows, :]
            c_c[:, cols] = neg_as * xh_ref[0, rows, :]
            d_c[:, cols] = rhsT[rows, :]

        Ls, Rs = _wang_stages(a_c, b_c, c_c, d_c, m, k, ly)

        col = lambda j: slice(j * ly, (j + 1) * ly)
        zero = jnp.zeros((ly,), dtype=rhs.dtype)
        pieces = []
        for c in range(k):
            XL = Rs[c - 1] if c > 0 else zero
            XR = Ls[c + 1] if c < k - 1 else zero
            pieces.append(d_c[:, col(c)] - a_c[:, col(c)] * XL - c_c[:, col(c)] * XR)
        outT = jnp.concatenate(pieces, axis=0)  # (n, ly), swapped layout
        outT_ref[0] = outT if store_dtype is None else outT.astype(store_dtype)

    return kernel


def _make_fused_y_kernel(alpha: float, ny: int, lx: int, k: int, store_dtype=None):
    """y-implicit ADI half fused into one pass, mirror of the x kernel.

    Consumes the swapped-layout (NB, Nx, Ny) intermediate: reads an
    (lx, ny) tile plus 8-row halo groups (the Lx stencil couples sublane
    rows there), computes rhs in VMEM, transposes so the y lines land on
    sublanes, Wang-solves, and writes the natural-layout result.
    """
    m = ny // k

    def kernel(scale_ref, vT_ref, up_ref, dn_ref, xlT_ref, xhT_ref, xdT_ref,
               sT_ref, yl_ref, yd_ref, yh_ref, out_ref, a_c, b_c, c_c, d_c):
        bi = pl.program_id(1)
        s = scale_ref[bi, 0]
        a_s = alpha * s
        neg_as = -a_s

        v = vT_ref[0].astype(d_c.dtype)  # (lx, ny); upcast bf16 state for compute
        prev = jnp.concatenate([up_ref[0, 7:8, :].astype(d_c.dtype), v[:-1]], axis=0)
        nxt = jnp.concatenate([v[1:], dn_ref[0, 0:1, :].astype(d_c.dtype)], axis=0)
        rhsT = v + a_s * (
            xlT_ref[0] * prev + xhT_ref[0] * nxt + xdT_ref[0] * v + sT_ref[0]
        )
        rhs = rhsT.T  # (ny, lx): lines on sublanes

        for c in range(k):
            rows = slice(c * m, (c + 1) * m)
            cols = slice(c * lx, (c + 1) * lx)
            a_c[:, cols] = neg_as * yl_ref[0, rows, :]
            b_c[:, cols] = 1.0 - a_s * yd_ref[0, rows, :]
            c_c[:, cols] = neg_as * yh_ref[0, rows, :]
            d_c[:, cols] = rhs[rows, :]

        Ls, Rs = _wang_stages(a_c, b_c, c_c, d_c, m, k, lx)

        col = lambda j: slice(j * lx, (j + 1) * lx)
        zero = jnp.zeros((lx,), dtype=rhs.dtype)
        for c in range(k):
            rows = slice(c * m, (c + 1) * m)
            XL = Rs[c - 1] if c > 0 else zero
            XR = Ls[c + 1] if c < k - 1 else zero
            piece = d_c[:, col(c)] - a_c[:, col(c)] * XL - c_c[:, col(c)] * XR
            out_ref[0, rows, :] = piece if store_dtype is None else piece.astype(store_dtype)

    return kernel


def _pick_tile(extent: int, preferred: int = 128) -> int | None:
    """Lane-tile width for the fused kernels.

    TPU blocks need the lane dim 128-divisible or equal to the full array
    dim: prefer ``preferred`` (a 128-multiple) when it divides the extent,
    else fall back to a single full-extent tile for small grids.
    """
    if preferred % 128 == 0 and extent % preferred == 0:
        return preferred
    if extent % 128 == 0:
        return 128
    if extent <= 256 and extent % 8 == 0:
        return extent
    return None


def _pick_chunks(n: int) -> int:
    """Chunk count K for the Wang partition (1 → plain Thomas fallback).

    Prefer the largest K with in-chunk length M = n/K ≥ 8 (wider vectors per
    sweep step; measured fastest at 1024²: K=32).
    """
    for k in (32, 16, 8, 4, 2):
        if n % k == 0 and n // k >= 8:
            return k
    return 1


@partial(jax.jit, static_argnames=("alpha", "lanes", "chunks", "interpret"))
def solve_lines_pallas(
    rhs: jax.Array,
    lo: jax.Array,
    di: jax.Array,
    hi: jax.Array,
    scale: jax.Array,
    *,
    alpha: float,
    lanes: int = _LANES,
    chunks: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Solve (I − α·s_b·L_d) x = rhs along axis -2, batched over bins × lanes.

    rhs: (NB, N, B); lo/di/hi: (NBp, N, B) with NBp ∈ {1, NB} (geometry
    planes of the directional operator L_d); scale: (NB,) per-bin D factor
    (pass ones when the planes already carry D).  Lane padding is handled
    here; N (the line axis) is used as-is — callers should keep it a
    multiple of 8 for layout efficiency (any 2D grid ≥ 8 cells qualifies).
    """
    nb, n, batch = rhs.shape
    nbp = lo.shape[0]
    pad = (-batch) % lanes
    if pad:
        zpad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, pad)))
        # zero coefficients → identity rows; zero rhs → zero solution
        rhs, lo, di, hi = zpad(rhs), zpad(lo), zpad(di), zpad(hi)
    padded = batch + pad

    grid = (padded // lanes, nb)
    bin_ix = (lambda j, b: (b, 0, j)) if nbp > 1 else (lambda j, b: (0, 0, j))
    plane_spec = pl.BlockSpec((1, n, lanes), bin_ix, memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec(
        (1, n, lanes), lambda j, b: (b, 0, j), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    k = _pick_chunks(n) if chunks is None else int(chunks)
    if k > 1:
        kernel = _make_wang_kernel(float(alpha), n, k, lanes)
        scratch = [pltpu.VMEM((n // k, k * lanes), rhs.dtype) for _ in range(4)]
    else:
        kernel = _make_kernel(float(alpha), n)
        scratch = [pltpu.VMEM((n, lanes), rhs.dtype)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[scale_spec, plane_spec, plane_spec, plane_spec, data_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(scale.reshape(-1, 1), lo, di, hi, rhs)
    if pad:
        out = out[:, :, :batch]
    return out


def pallas_adi_available(dtype) -> bool:
    """True when the compiled fused-ADI kernels can run here."""
    return jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32


def build_pallas_adi_step(op, dt: float, dtype=jnp.float32, *, lanes: int = _LANES,
                          chunks: int | None = None, interpret: bool = False):
    """Return ``step(state) -> state`` — one fused PR-ADI CN step.

    ``op`` is a ``qpsim_tpu.ops.diffusion.SplitOperator``.  Matches
    ``ADIDiffusion.make_step(dt)`` to roundoff (same splitting, same
    tridiagonal systems), in four HBM passes per step instead of ~14:
    x-rhs stencil (+swap), fused x-solve, y-rhs stencil (+swap back),
    fused y-solve.
    """
    alpha = 0.5 * float(dt)
    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    swapT = lambda a: jnp.swapaxes(as_dev(a), -1, -2)

    # natural-layout planes (for the y-solve and the Ly rhs stencil)
    ax_lo, ax_hi, ax_diag = as_dev(op.ax_lo), as_dev(op.ax_hi), as_dev(op.ax_diag)
    ay_lo, ay_hi, ay_diag = as_dev(op.ay_lo), as_dev(op.ay_hi), as_dev(op.ay_diag)
    src = as_dev(op.source_total())
    # swapped planes (for the x-solve and the Lx rhs stencil in swapped layout)
    axT_lo, axT_hi, axT_diag = swapT(op.ax_lo), swapT(op.ax_hi), swapT(op.ax_diag)
    srcT = jnp.swapaxes(src, -1, -2)

    nb = op.num_bins
    if op.bin_scale is not None:
        scale = as_dev(op.bin_scale.reshape(-1))
        sc3 = as_dev(op.bin_scale)  # (NB, 1, 1) lazy factor for the stencils
    else:
        scale = jnp.ones((nb,), dtype=dtype)
        sc3 = None

    def apply_dir(u, a_lo, a_hi, diag, axis):
        u_prev = jnp.roll(u, 1, axis=axis)
        u_next = jnp.roll(u, -1, axis=axis)
        # wrap-around values are multiplied by the zero boundary coefficients
        return a_lo * u_prev + a_hi * u_next + diag * u

    def step(state: jax.Array) -> jax.Array:
        u = state.astype(dtype)
        if sc3 is not None:
            sy_lo, sy_hi, sy_diag = sc3 * ay_lo, sc3 * ay_hi, sc3 * ay_diag
            sxT_lo, sxT_hi, sxT_diag = sc3 * axT_lo, sc3 * axT_hi, sc3 * axT_diag
            s_nat, s_T = sc3 * src, sc3 * srcT
        else:
            sy_lo, sy_hi, sy_diag = ay_lo, ay_hi, ay_diag
            sxT_lo, sxT_hi, sxT_diag = axT_lo, axT_hi, axT_diag
            s_nat, s_T = src, srcT

        # x-implicit half: (I − αLx) u* = u + α·Ly u + α·s   (solved in the
        # swapped layout so the x lines land on the sublane axis)
        rhs = u + alpha * apply_dir(u, sy_lo, sy_hi, sy_diag, axis=-2) + alpha * s_nat
        rhsT = jnp.swapaxes(rhs, -1, -2)
        uT = solve_lines_pallas(
            rhsT, axT_lo, axT_diag, axT_hi, scale,
            alpha=alpha, lanes=lanes, chunks=chunks, interpret=interpret,
        )
        # y-implicit half: (I − αLy) u⁺ = u* + α·Lx u* + α·s
        rhs2T = (
            uT
            + alpha * apply_dir(uT, sxT_lo, sxT_hi, sxT_diag, axis=-2)
            + alpha * s_T
        )
        rhs2 = jnp.swapaxes(rhs2T, -1, -2)
        return solve_lines_pallas(
            rhs2, ay_lo, ay_diag, ay_hi, scale,
            alpha=alpha, lanes=lanes, chunks=chunks, interpret=interpret,
        ).astype(state.dtype)

    return step


def build_pallas_adi_fused_step(op, dt: float, dtype=jnp.float32, *,
                                tile: int | None = None, chunks: int | None = None,
                                state_dtype=None, as_aux: bool = False,
                                interpret: bool = False, coupled: bool = False):
    """Return ``step(state) -> state`` — PR-ADI in TWO fused Pallas passes.

    Each half-step is a single kernel: the explicit-direction stencil (halo
    rows fetched as adjacent 8-row groups), the CN coefficient assembly from
    the geometry planes x per-bin D, one in-VMEM layout transpose, and the
    Wang partition solve.  The state crosses HBM once per half-step, vs ~14
    passes for the ``lax.scan`` Thomas path.  The intermediate u* lives in
    the swapped (NB, Nx, Ny) layout so no standalone transpose pass exists.

    Raises ``ValueError`` when the grid shape doesn't tile (callers fall
    back to :func:`build_pallas_adi_step` or the XLA path).  Numerics match
    ``ADIDiffusion`` (same splitting; Wang-ordered eliminations).

    ``state_dtype`` (e.g. ``jnp.bfloat16``) stores the state — and the
    intermediate u* — in a narrower dtype in HBM while all stencil/solve
    arithmetic stays in ``dtype`` in VMEM: the returned step takes and
    returns ``state_dtype`` arrays, halving the dominant state traffic.
    Accuracy: one rounding of the state per half-step (~1e-3 relative per
    step worst-case for bf16); see the f32 fidelity tiers before enabling
    on gate-checked paths.
    """
    mask = np.asarray(op.mask, dtype=bool)
    ny, nx = mask.shape
    # Lane-tile width: 256 measures 14% faster than 128 at 1024²×16
    # (0.86 vs 1.00 ms/step — fewer halo refetches and wider sweeps), but
    # the per-block working set is ~13 tile-sized buffers, so wide tiles
    # only fit while 13·tile·extent·4B stays under ~14 MB of VMEM
    # (tile=512 at 1024 rows fails to compile).  Single-bin operators are
    # excluded: the bin-innermost grid order that lets Mosaic skip the
    # plane-block refetch (and its double buffering) needs nb > 1 — at
    # nb=1 the same shape measured 18 MB of scoped VMEM and failed.
    # Coupled compositions (this step scanned together with collision
    # kernels) get a tighter budget: the 2026-08 libtpu charges the wide
    # config 16.12 MB of scoped VMEM there (128 KB over the limit, driver
    # capture r4) while the identical standalone kernel fits.
    vmem_budget = 12_500_000 if coupled else 14_000_000

    def auto_tile(other_extent: int) -> int:
        wide_ok = op.num_bins > 1 and 13 * 256 * other_extent * 4 <= vmem_budget
        return 256 if wide_ok else 128

    ly = _pick_tile(ny, auto_tile(nx) if tile is None else tile)
    lx = _pick_tile(nx, auto_tile(ny) if tile is None else tile)

    # Wang chunk count: at 256-wide tiles the sweeps are already 2× wider,
    # so shallower partitioning wins (measured 0.86 ms at K=16 vs 0.91 at
    # K=32); at 128-wide tiles the deeper K=32 partition wins (1.00 vs 1.13).
    def auto_chunks(n: int, lane_tile: int | None) -> int:
        if lane_tile == 256 and n % 16 == 0 and n // 16 >= 8:
            return 16
        return _pick_chunks(n)

    kx = auto_chunks(nx, ly) if chunks is None else int(chunks)
    ky = auto_chunks(ny, lx) if chunks is None else int(chunks)
    if ly is None or lx is None or kx < 2 or ky < 2 or ny % 8 or nx % 8:
        raise ValueError(
            f"fused ADI kernels need tileable extents, got {ny}x{nx}"
        )

    alpha = 0.5 * float(dt)
    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    swapT = lambda a: jnp.swapaxes(as_dev(a), -1, -2)

    ax_lo, ax_hi, ax_diag = as_dev(op.ax_lo), as_dev(op.ax_hi), as_dev(op.ax_diag)
    ay_lo, ay_hi, ay_diag = as_dev(op.ay_lo), as_dev(op.ay_hi), as_dev(op.ay_diag)
    src = as_dev(op.source_total())
    axT_lo, axT_hi, axT_diag = swapT(op.ax_lo), swapT(op.ax_hi), swapT(op.ax_diag)
    srcT = jnp.swapaxes(src, -1, -2)

    nb = op.num_bins
    nbp = ax_lo.shape[0]
    if op.bin_scale is not None:
        scale2 = as_dev(op.bin_scale.reshape(-1, 1))
    else:
        scale2 = jnp.ones((nb, 1), dtype=dtype)
    bp = (lambda b: b) if nbp > 1 else (lambda b: 0)

    vmem = pltpu.VMEM
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # ---- x half: natural-layout input tiles, swapped-layout output.
    # Grid (y tiles, bins), bin innermost: plane blocks depend only on the
    # y tile, so consecutive grid steps revisit them and skip the DMA.
    grid_x = (ny // ly, nb)
    nyg = ny // 8  # 8-row halo groups
    ux_spec = pl.BlockSpec((1, ly, nx), lambda j, b: (b, j, 0), memory_space=vmem)
    up_spec = pl.BlockSpec(
        (1, 8, nx), lambda j, b: (b, jnp.maximum(j * (ly // 8) - 1, 0), 0),
        memory_space=vmem,
    )
    dn_spec = pl.BlockSpec(
        (1, 8, nx),
        lambda j, b: (b, jnp.minimum((j + 1) * (ly // 8), nyg - 1), 0),
        memory_space=vmem,
    )
    natx_spec = pl.BlockSpec((1, ly, nx), lambda j, b: (bp(b), j, 0), memory_space=vmem)
    solx_spec = pl.BlockSpec((1, nx, ly), lambda j, b: (bp(b), 0, j), memory_space=vmem)
    outT_spec = pl.BlockSpec((1, nx, ly), lambda j, b: (b, 0, j), memory_space=vmem)
    sdtype = dtype if state_dtype is None else jnp.dtype(state_dtype)
    kern_x = _make_fused_x_kernel(alpha, nx, ly, kx,
                                  store_dtype=None if state_dtype is None else sdtype)
    scratch_x = [pltpu.VMEM((nx // kx, kx * ly), dtype) for _ in range(4)]

    # ---- y half: swapped-layout input tiles, natural-layout output.
    grid_y = (nx // lx, nb)
    nxg = nx // 8
    vy_spec = pl.BlockSpec((1, lx, ny), lambda j, b: (b, j, 0), memory_space=vmem)
    lf_spec = pl.BlockSpec(
        (1, 8, ny), lambda j, b: (b, jnp.maximum(j * (lx // 8) - 1, 0), 0),
        memory_space=vmem,
    )
    rt_spec = pl.BlockSpec(
        (1, 8, ny),
        lambda j, b: (b, jnp.minimum((j + 1) * (lx // 8), nxg - 1), 0),
        memory_space=vmem,
    )
    natyT_spec = pl.BlockSpec((1, lx, ny), lambda j, b: (bp(b), j, 0), memory_space=vmem)
    soly_spec = pl.BlockSpec((1, ny, lx), lambda j, b: (bp(b), 0, j), memory_space=vmem)
    out_spec = pl.BlockSpec((1, ny, lx), lambda j, b: (b, 0, j), memory_space=vmem)
    kern_y = _make_fused_y_kernel(alpha, ny, lx, ky,
                                  store_dtype=None if state_dtype is None else sdtype)
    scratch_y = [pltpu.VMEM((ny // ky, ky * lx), dtype) for _ in range(4)]

    # Aux protocol: the geometry planes ride the jit boundary as ARGUMENTS.
    # Baked-closure constants would be materialised into the lowered module,
    # and over this environment's remote-TPU tunnel every closed-over device
    # array costs a host round-trip fetch at .lower() time (minutes per
    # compile for 1024²-class planes — the engine's make_step_aux contract
    # exists precisely for this).
    aux = (scale2, ay_lo, ay_hi, ay_diag, src, axT_lo, axT_diag, axT_hi,
           srcT, ay_diag, ay_hi)  # trailing entries kept positional below

    def step_aux(state: jax.Array, aux_arrays) -> jax.Array:
        (scale2_, ay_lo_, ay_hi_, ay_diag_, src_, axT_lo_, axT_diag_,
         axT_hi_, srcT_, _, _) = aux_arrays
        u = state.astype(sdtype)
        u_starT = pl.pallas_call(
            kern_x,
            grid=grid_x,
            in_specs=[smem_spec, ux_spec, up_spec, dn_spec,
                      natx_spec, natx_spec, natx_spec, natx_spec,
                      solx_spec, solx_spec, solx_spec],
            out_specs=outT_spec,
            out_shape=jax.ShapeDtypeStruct((u.shape[0], nx, ny), sdtype),
            scratch_shapes=scratch_x,
            interpret=interpret,
        )(scale2_, u, u, u, ay_lo_, ay_hi_, ay_diag_, src_, axT_lo_, axT_diag_, axT_hi_)
        out = pl.pallas_call(
            kern_y,
            grid=grid_y,
            in_specs=[smem_spec, vy_spec, lf_spec, rt_spec,
                      natyT_spec, natyT_spec, natyT_spec, natyT_spec,
                      soly_spec, soly_spec, soly_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(u.shape, sdtype),
            scratch_shapes=scratch_y,
            interpret=interpret,
        )(scale2_, u_starT, u_starT, u_starT, axT_lo_, axT_hi_, axT_diag_, srcT_,
          ay_lo_, ay_diag_, ay_hi_)
        return out if state_dtype is not None else out.astype(state.dtype)

    if as_aux:
        return step_aux, aux

    def step(state: jax.Array) -> jax.Array:
        return step_aux(state, aux)

    return step
