"""Separable-operator fused Pallas ADI with host-prefactored Wang sweeps.

The general fused kernels (`pallas_adi.py`) stream seven (Ny, Nx)
coefficient planes through VMEM every half-step and re-eliminate the CN
tridiagonal factors in-kernel.  At nb > 1 the bin-innermost grid order lets
Mosaic skip the plane refetch across bins, so the plane traffic amortizes;
at nb == 1 — the engine's scalar mode and the headline benchmark — every
step pays the full ~56 MB of plane DMA at 1024² and a reciprocal per sweep
row.

On the most common geometry (a full rectangle with one uniform BC per
face — the reference's intrinsic-rectangle setups, `qpsim/geometry.py:
245-262`) the directional operators are *separable*: the x-direction
coefficients are functions of x alone and the y-direction coefficients
functions of y alone, and the BC source splits as sx(x) + sy(y).  This
module exploits that:

* the stencil planes collapse to four 1D vectors per direction (a few KB
  instead of 4 MB each), shipped once per kernel launch;
* the Wang-partition elimination chains (`pallas_adi._wang_stages` stages
  1–2 and the stage-3 interface recurrences) depend only on the
  coefficients, so they are **prefactored on the host** in float64: the
  kernel's per-row sweep work drops from ~12 vector ops + a reciprocal to
  2 FMAs + 1 multiply (forward), 1 FMA (backward), 2 FMAs
  (back-substitution);
* per-step HBM traffic drops to the state itself (one read + one write per
  half-step) plus a launch-constant factor pack.

Numerics: identical recurrences to `_wang_stages` evaluated in f64 on the
host and rounded once to the compute dtype — agrees with the general
kernel to f32 roundoff (exactly, under f64 interpret mode; see
tests/test_pallas_adi_sep.py).  Zero coefficient rows (masked cells,
decoupled intervals) reduce to identity rows in the prefactored form too.

Scope: any ``num_bins`` with a lazy ``bin_scale`` (uniform-gap operators).
At nb == 1 (scalar mode, the headline benchmark) this is the engine
default.  At nb > 1 each bin gets its own factor pack — prefactorizations
of the SAME 1D stencil vectors at the bin's α·s — streamed once per bin
per half-step on a (nb, tiles) grid; whether the eliminated in-kernel
re-elimination work beats the extra ~5 planes of pack DMA is the r5
hardware A/B (VERDICT r4 weak #3), so the engine engages the multi-bin
form only under ``QPSIM_ADI_SEPARABLE_MB=1`` until measured.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_adi import _pick_chunks, _pick_tile

__all__ = [
    "build_pallas_adi_sep_step",
    "separable_stencil_vectors",
]

_VEC_LANES = 128


def separable_stencil_vectors(op):
    """1D stencil vectors of a separable SplitOperator, or None.

    Returns ``(xlo, xhi, xdiag, sx), (ylo, yhi, ydiag, sy)`` — each a 1D
    float64 vector over x (length Nx) or y (length Ny) — when the operator's
    x-direction planes are constant along y, its y-direction planes constant
    along x, and the sources split likewise.  Holds exactly for full
    rectangles with per-face-uniform BCs; any interior mask structure or
    per-segment BC variation breaks it and returns None.

    Any ``num_bins`` qualifies as long as the operator is lazy-scaled
    (``bin_scale`` carries the per-bin α factors over shared (1, Ny, Nx)
    planes — the uniform-gap form).
    """
    if op.bin_scale is None:
        return None
    xs, ys = [], []
    for p in (op.ax_lo, op.ax_hi, op.ax_diag, op.sx):
        q = np.asarray(p, dtype=np.float64)
        if q.shape[0] != 1 or not np.all(q == q[:, 0:1, :]):
            return None
        xs.append(q[0, 0, :].copy())
    for p in (op.ay_lo, op.ay_hi, op.ay_diag, op.sy):
        q = np.asarray(p, dtype=np.float64)
        if q.shape[0] != 1 or not np.all(q == q[:, :, 0:1]):
            return None
        ys.append(q[0, :, 0].copy())
    return tuple(xs), tuple(ys)


def _wang_prefactor_1d(a, b, c, k):
    """Host prefactorization of the Wang-partition solve for 1D coefficients.

    Mirrors ``pallas_adi._wang_stages`` stages 1–3 with the rhs left
    symbolic.  Returns ``(pack, ifc)``: ``pack`` is (5, M, K) chunk-major —
    [a_rt, inv, cp, A, C] where the runtime sweeps are

        forward:  dp_i = (d_i − a_rt_i·dp_{i−1})·inv_i        (dp_{−1} := 0)
        backward: D_i  = dp_i − cp_i·D_{i+1}                  (D_{M−1} = dp)
        final:    x_i  = D_i − A_i·X_L − C_i·X_R

    and ``ifc`` is (K, 6) = [aL, invI, aR, arw, q, w] per chunk for the
    interface recurrence

        p_j = (dL_j − aL_j·g_{j−1})·invI_j
        g_j = dR_j − aR_j·g_{j−1} + arw_j·p_j
        L_j = p_j − q_j·L_{j+1};  R_j = g_j − w_j·L_{j+1}.
    """
    n = a.size
    m = n // k
    a_c = a.reshape(k, m).T.copy()
    b_c = b.reshape(k, m).T
    c_c = c.reshape(k, m).T
    inv = np.empty((m, k))
    cp = np.empty((m, k))
    ap = np.empty((m, k))
    inv[0] = 1.0 / b_c[0]
    cp[0] = c_c[0] * inv[0]
    ap[0] = a_c[0] * inv[0]
    for i in range(1, m):
        inv[i] = 1.0 / (b_c[i] - a_c[i] * cp[i - 1])
        cp[i] = c_c[i] * inv[i]
        ap[i] = -a_c[i] * ap[i - 1] * inv[i]
    A = np.empty((m, k))
    C = np.empty((m, k))
    A[m - 1] = ap[m - 1]
    C[m - 1] = cp[m - 1]
    for i in range(m - 2, -1, -1):
        C[i] = -cp[i] * C[i + 1]
        A[i] = ap[i] - cp[i] * A[i + 1]
    aL, cL = A[0].copy(), C[0].copy()
    aR, cR = A[m - 1].copy(), C[m - 1].copy()
    invI = np.empty(k)
    q = np.empty(k)
    w_arr = np.empty(k)
    arw = np.empty(k)
    w_prev = 0.0
    for j in range(k):
        invI[j] = 1.0 / (1.0 - aL[j] * w_prev)
        q[j] = cL[j] * invI[j]
        arw[j] = aR[j] * w_prev
        w_prev = cR[j] + arw[j] * q[j]
        w_arr[j] = w_prev
    a_rt = a_c
    a_rt[0] = 0.0  # row 0 of each chunk: X_L coupling lives in A, not in dp
    pack = np.stack([a_rt, inv, cp, A, C])
    ifc = np.stack([aL, invI, aR, arw, q, w_arr], axis=1)
    return pack, ifc


def _lane_replicate(pack: np.ndarray, lanes: int) -> np.ndarray:
    """(5, M, K) chunk scalars → (5, M, K·lanes) rows matching the scratch."""
    f, m, k = pack.shape
    return np.ascontiguousarray(
        np.broadcast_to(pack[..., None], (f, m, k, lanes)).reshape(f, m, k * lanes)
    )


def _prefactored_sweep(d_c, fget, iget, m: int, k: int, lanes: int, dtype):
    """Run the prefactored Wang sweeps on the chunk-major rhs scratch.

    ``fget(f, i)`` reads factor-pack row i of field f and ``iget(j, i)``
    interface scalar i of chunk j (accessors, so the single-bin and
    bin-gridded kernels share this body).  Returns the per-chunk boundary
    solutions ``(Ls, Rs)``; ``d_c`` holds the post-backward D values for
    the final back-substitution.
    """
    carry0 = d_c[0, :] * fget(1, 0)
    d_c[0, :] = carry0

    def forward(i, carry):
        v = (d_c[i, :] - fget(0, i) * carry) * fget(1, i)
        d_c[i, :] = v
        return v

    carry = jax.lax.fori_loop(1, m, forward, carry0)

    def backward(j, carry):
        i = m - 2 - j
        v = d_c[i, :] - fget(2, i) * carry
        d_c[i, :] = v
        return v

    jax.lax.fori_loop(0, m - 1, backward, carry)

    col = lambda j: slice(j * lanes, (j + 1) * lanes)
    g = jnp.zeros((lanes,), dtype=dtype)
    ps, gs = [], []
    for j in range(k):
        aL = iget(j, 0)
        invI = iget(j, 1)
        aR = iget(j, 2)
        arw = iget(j, 3)
        dL = d_c[0, col(j)]
        dR = d_c[m - 1, col(j)]
        p = (dL - aL * g) * invI
        g = dR - aR * g + arw * p
        ps.append(p)
        gs.append(g)
    L_next = jnp.zeros((lanes,), dtype=dtype)
    Ls, Rs = [None] * k, [None] * k
    for j in range(k - 1, -1, -1):
        Ls[j] = ps[j] - iget(j, 4) * L_next
        Rs[j] = gs[j] - iget(j, 5) * L_next
        L_next = Ls[j]
    return Ls, Rs


def _ref_accessors(yv_ref, xr_ref, fac_ref, ifc_ref, mb: bool):
    """Read accessors shared by the single-bin and bin-gridded kernels.

    Single-bin blocks: yv (4, L, 128), xr (1, 8, n), fac (5, M, K·L) with
    ifc (K, 6) whole in SMEM.  Bin-gridded blocks carry a leading
    size-1 bin dim selected by the BlockSpec index map — except ifc, which
    stays whole in SMEM and is indexed by the bin program id.
    """
    if not mb:
        return (
            lambda i: yv_ref[i, :, 0:1],
            xr_ref[0, 0:1, :],
            lambda f, i: fac_ref[f, i, :],
            lambda f: fac_ref[f],
            lambda j, i: ifc_ref[j, i],
        )
    b = pl.program_id(0)
    return (
        lambda i: yv_ref[0, i, :, 0:1],
        xr_ref[0, 0:1, :],
        lambda f, i: fac_ref[0, f, i, :],
        lambda f: fac_ref[0, f],
        lambda j, i: ifc_ref[b, j, i],
    )


def _make_sep_x_kernel(nx: int, ly: int, k: int, has_src: bool, mb: bool = False):
    """x-implicit half on a natural-layout (ly, nx) tile → swapped output.

    rhs stencil from the y-direction 1D vectors ((ly, 1) column broadcasts,
    pre-scaled by α·s on the host), in-VMEM transpose, prefactored Wang
    solve along x.  Mirrors ``pallas_adi._make_fused_x_kernel`` with the
    coefficient assembly and elimination replaced by the factor pack.
    ``mb=True`` grids over (bin, tile) with per-bin packs.
    """
    m = nx // k

    def kernel(u_ref, up_ref, dn_ref, yv_ref, xr_ref, fac_ref, ifc_ref,
               outT_ref, d_c):
        yv, xr_row, fget, ffield, iget = _ref_accessors(
            yv_ref, xr_ref, fac_ref, ifc_ref, mb
        )
        u = u_ref[0]
        prev = jnp.concatenate([up_ref[0, 7:8, :], u[:-1]], axis=0)
        nxt = jnp.concatenate([u[1:], dn_ref[0, 0:1, :]], axis=0)
        rhs = u + yv(0) * prev + yv(1) * nxt + yv(2) * u
        if has_src:
            rhs = rhs + yv(3) + xr_row
        rhsT = rhs.T  # (nx, ly): x lines on sublanes

        for c in range(k):
            d_c[:, c * ly:(c + 1) * ly] = rhsT[c * m:(c + 1) * m, :]

        Ls, Rs = _prefactored_sweep(d_c, fget, iget, m, k, ly, rhs.dtype)

        A_f = ffield(3)
        C_f = ffield(4)
        col = lambda j: slice(j * ly, (j + 1) * ly)
        zero = jnp.zeros((ly,), dtype=rhs.dtype)
        for c in range(k):
            XL = Rs[c - 1] if c > 0 else zero
            XR = Ls[c + 1] if c < k - 1 else zero
            outT_ref[0, c * m:(c + 1) * m, :] = (
                d_c[:, col(c)] - A_f[:, col(c)] * XL - C_f[:, col(c)] * XR
            )

    return kernel


def _make_sep_y_kernel(ny: int, lx: int, k: int, has_src: bool, mb: bool = False):
    """y-implicit half on a swapped-layout (lx, ny) tile → natural output."""
    m = ny // k

    def kernel(vT_ref, up_ref, dn_ref, xv_ref, yr_ref, fac_ref, ifc_ref,
               out_ref, d_c):
        xv, yr_row, fget, ffield, iget = _ref_accessors(
            xv_ref, yr_ref, fac_ref, ifc_ref, mb
        )
        v = vT_ref[0]
        prev = jnp.concatenate([up_ref[0, 7:8, :], v[:-1]], axis=0)
        nxt = jnp.concatenate([v[1:], dn_ref[0, 0:1, :]], axis=0)
        rhsT = v + xv(0) * prev + xv(1) * nxt + xv(2) * v
        if has_src:
            rhsT = rhsT + xv(3) + yr_row
        rhs = rhsT.T  # (ny, lx): y lines on sublanes

        for c in range(k):
            d_c[:, c * lx:(c + 1) * lx] = rhs[c * m:(c + 1) * m, :]

        Ls, Rs = _prefactored_sweep(d_c, fget, iget, m, k, lx, rhs.dtype)

        A_f = ffield(3)
        C_f = ffield(4)
        col = lambda j: slice(j * lx, (j + 1) * lx)
        zero = jnp.zeros((lx,), dtype=rhs.dtype)
        for c in range(k):
            XL = Rs[c - 1] if c > 0 else zero
            XR = Ls[c + 1] if c < k - 1 else zero
            out_ref[0, c * m:(c + 1) * m, :] = (
                d_c[:, col(c)] - A_f[:, col(c)] * XL - C_f[:, col(c)] * XR
            )

    return kernel


def _auto_tile(other_extent: int, coupled: bool = False) -> int | None:
    # Hardware sweep (.dev/sep_adi_hw.json, v5e 1024²): tile 128 / K=32 is
    # the measured winner — 0.0456 ms/step vs 0.0488 (t256/k32) and 0.0518
    # (t256/k16, the pre-r5 auto default).  Working set per block ≈ state
    # in/out (double-buffered) + factor pack (5 rows) + rhs scratch ≈ 10
    # tile-sized buffers; the budget guard only bites at pathological
    # extents.  Coupled compositions use the conservative budget (the
    # 2026-08 libtpu's scoped-VMEM over-accounting, CLAUDE.md).
    budget = 12_500_000 if coupled else 14_000_000
    if 10 * 128 * other_extent * 4 <= budget:
        return 128
    # even the narrowest legal lane tile (128 — Mosaic needs the lane dim
    # 128-divisible) over-budget: signal the caller to refuse so the
    # dispatch falls back to the general fused kernels instead of
    # submitting a known-over-budget Mosaic compile
    return None


def _auto_chunks(n: int, lane_tile: int) -> int:
    # K=32 wherever it divides (the hardware-swept winner at both tile
    # widths); _pick_chunks already prefers it.
    del lane_tile
    return _pick_chunks(n)


def build_pallas_adi_sep_step(op, dt: float, dtype=jnp.float32, *,
                              tile: int | None = None, chunks: int | None = None,
                              as_aux: bool = False, interpret: bool = False,
                              coupled: bool = False):
    """Fused PR-ADI step for a separable nb==1 operator (see module doc).

    Raises ``ValueError`` when the operator is not separable or the grid
    doesn't tile — callers fall back to the general fused kernels.
    Matches ``build_pallas_adi_fused_step`` to compute-dtype roundoff (the
    factor chains are evaluated in f64 on the host).

    nb == 1 uses a 1D tile grid; nb > 1 grids over (bin, tile) with
    per-bin factor packs (same 1D vectors prefactored at each bin's α·s).
    """
    vecs = separable_stencil_vectors(op)
    if vecs is None:
        raise ValueError(
            "separable ADI kernels need a lazy-scaled operator with "
            "separable directional planes"
        )
    (xlo, xhi, xdiag, sx), (ylo, yhi, ydiag, sy) = vecs
    mask = np.asarray(op.mask, dtype=bool)
    ny, nx = mask.shape
    nb = int(op.num_bins)
    mb = nb > 1

    ty = _auto_tile(nx, coupled) if tile is None else tile
    tx = _auto_tile(ny, coupled) if tile is None else tile
    if ty is None or tx is None:
        raise ValueError(
            "separable ADI working set exceeds the scoped-VMEM budget at "
            "this extent — the general fused kernels take over"
        )
    ly = _pick_tile(ny, ty)
    lx = _pick_tile(nx, tx)
    kx = _auto_chunks(nx, ly or 0) if chunks is None else int(chunks)
    ky = _auto_chunks(ny, lx or 0) if chunks is None else int(chunks)
    if ly is None or lx is None or kx < 2 or ky < 2 or ny % 8 or nx % 8:
        raise ValueError(
            f"separable ADI kernels need tileable extents, got {ny}x{nx}"
        )

    alpha = 0.5 * float(dt)
    scales = alpha * np.asarray(op.bin_scale, dtype=np.float64).reshape(-1)
    if scales.size != nb:
        raise ValueError(
            f"bin_scale carries {scales.size} factors for {nb} bins"
        )

    has_src = bool(np.any(sx) or np.any(sy))
    np_dtype = jnp.dtype(dtype)

    def vec_pack(vs, n):
        out = np.empty((4, n, _VEC_LANES))
        for i, v in enumerate(vs):
            out[i] = v[:, None]
        return out

    # Per-bin packs, stacked on a leading bin axis (squeezed at nb == 1 so
    # the scalar path keeps its r4-hardware-witnessed layout exactly).
    yv_b, xv_b, xr_b, yr_b = [], [], [], []
    facx_b, facy_b, ifx_b, ify_b = [], [], [], []
    for a_s in scales:
        packx, ifcx = _wang_prefactor_1d(
            -a_s * xlo, 1.0 - a_s * xdiag, -a_s * xhi, kx
        )
        packy, ifcy = _wang_prefactor_1d(
            -a_s * ylo, 1.0 - a_s * ydiag, -a_s * yhi, ky
        )
        yv_b.append(vec_pack((a_s * ylo, a_s * yhi, a_s * ydiag, a_s * sy), ny))
        xv_b.append(vec_pack((a_s * xlo, a_s * xhi, a_s * xdiag, a_s * sx), nx))
        xr_b.append(np.broadcast_to(a_s * sx, (8, nx)))
        yr_b.append(np.broadcast_to(a_s * sy, (8, ny)))
        facx_b.append(_lane_replicate(packx, ly))
        facy_b.append(_lane_replicate(packy, lx))
        ifx_b.append(ifcx)
        ify_b.append(ifcy)

    def dev(stack, keep_bin_axis):
        arr = np.stack(stack)
        if not keep_bin_axis:
            arr = arr[0]
        return jnp.asarray(arr, dtype=np_dtype)

    yv = dev(yv_b, mb)
    xv = dev(xv_b, mb)
    xr = dev(xr_b, mb) if mb else dev(xr_b, True)  # (nb, 8, nx) / (1, 8, nx)
    yr = dev(yr_b, mb) if mb else dev(yr_b, True)
    facx = dev(facx_b, mb)
    facy = dev(facy_b, mb)
    ifx = dev(ifx_b, mb)
    ify = dev(ify_b, mb)

    vmem = pltpu.VMEM
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if mb:
        fix = lambda *shape: pl.BlockSpec(
            shape, lambda b, j: (0,) * len(shape), memory_space=vmem
        )
        binned = lambda *shape: pl.BlockSpec(
            (1,) + shape, lambda b, j: (b,) + (0,) * len(shape),
            memory_space=vmem,
        )
    else:
        fix = lambda *shape: pl.BlockSpec(
            shape, lambda j: (0,) * len(shape), memory_space=vmem
        )

    # ---- x half
    nyg = ny // 8
    if mb:
        grid_x = (nb, ny // ly)
        in_specs_x = [
            pl.BlockSpec((1, ly, nx), lambda b, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, 8, nx),
                lambda b, j: (b, jnp.maximum(j * (ly // 8) - 1, 0), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 8, nx),
                lambda b, j: (b, jnp.minimum((j + 1) * (ly // 8), nyg - 1), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 4, ly, _VEC_LANES), lambda b, j: (b, 0, j, 0),
                memory_space=vmem,
            ),
            binned(8, nx),
            binned(5, nx // kx, kx * ly),
            smem_spec,
        ]
        outT_spec = pl.BlockSpec(
            (1, nx, ly), lambda b, j: (b, 0, j), memory_space=vmem
        )
    else:
        grid_x = (ny // ly,)
        in_specs_x = [
            pl.BlockSpec((1, ly, nx), lambda j: (0, j, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, 8, nx),
                lambda j: (0, jnp.maximum(j * (ly // 8) - 1, 0), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 8, nx),
                lambda j: (0, jnp.minimum((j + 1) * (ly // 8), nyg - 1), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec((4, ly, _VEC_LANES), lambda j: (0, j, 0), memory_space=vmem),
            fix(1, 8, nx),
            fix(5, nx // kx, kx * ly),
            smem_spec,
        ]
        outT_spec = pl.BlockSpec((1, nx, ly), lambda j: (0, 0, j), memory_space=vmem)
    kern_x = _make_sep_x_kernel(nx, ly, kx, has_src, mb)
    scratch_x = [pltpu.VMEM((nx // kx, kx * ly), np_dtype)]

    # ---- y half
    nxg = nx // 8
    if mb:
        grid_y = (nb, nx // lx)
        in_specs_y = [
            pl.BlockSpec((1, lx, ny), lambda b, j: (b, j, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, 8, ny),
                lambda b, j: (b, jnp.maximum(j * (lx // 8) - 1, 0), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 8, ny),
                lambda b, j: (b, jnp.minimum((j + 1) * (lx // 8), nxg - 1), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 4, lx, _VEC_LANES), lambda b, j: (b, 0, j, 0),
                memory_space=vmem,
            ),
            binned(8, ny),
            binned(5, ny // ky, ky * lx),
            smem_spec,
        ]
        out_spec = pl.BlockSpec(
            (1, ny, lx), lambda b, j: (b, 0, j), memory_space=vmem
        )
    else:
        grid_y = (nx // lx,)
        in_specs_y = [
            pl.BlockSpec((1, lx, ny), lambda j: (0, j, 0), memory_space=vmem),
            pl.BlockSpec(
                (1, 8, ny),
                lambda j: (0, jnp.maximum(j * (lx // 8) - 1, 0), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec(
                (1, 8, ny),
                lambda j: (0, jnp.minimum((j + 1) * (lx // 8), nxg - 1), 0),
                memory_space=vmem,
            ),
            pl.BlockSpec((4, lx, _VEC_LANES), lambda j: (0, j, 0), memory_space=vmem),
            fix(1, 8, ny),
            fix(5, ny // ky, ky * lx),
            smem_spec,
        ]
        out_spec = pl.BlockSpec((1, ny, lx), lambda j: (0, 0, j), memory_space=vmem)
    kern_y = _make_sep_y_kernel(ny, lx, ky, has_src, mb)
    scratch_y = [pltpu.VMEM((ny // ky, ky * lx), np_dtype)]

    aux = (yv, xr, facx, ifx, xv, yr, facy, ify)

    def step_aux(state: jax.Array, aux_arrays) -> jax.Array:
        if state.shape[0] != nb:
            # The grid's bin axis is sized at build time — a mismatched
            # leading dim would silently return uninitialized memory.
            raise ValueError(
                f"separable ADI step was built for {nb} bin(s), got state "
                f"shape {state.shape}"
            )
        yv_, xr_, facx_, ifx_, xv_, yr_, facy_, ify_ = aux_arrays
        u = state.astype(np_dtype)
        u_starT = pl.pallas_call(
            kern_x,
            grid=grid_x,
            in_specs=in_specs_x,
            out_specs=outT_spec,
            out_shape=jax.ShapeDtypeStruct((nb, nx, ny), np_dtype),
            scratch_shapes=scratch_x,
            interpret=interpret,
        )(u, u, u, yv_, xr_, facx_, ifx_)
        out = pl.pallas_call(
            kern_y,
            grid=grid_y,
            in_specs=in_specs_y,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(u.shape, np_dtype),
            scratch_shapes=scratch_y,
            interpret=interpret,
        )(u_starT, u_starT, u_starT, xv_, yr_, facy_, ify_)
        return out.astype(state.dtype)

    if as_aux:
        return step_aux, aux

    def step(state: jax.Array) -> jax.Array:
        return step_aux(state, aux)

    return step
