"""Batched tridiagonal solves for ADI sweeps (JAX).

``tridiag_solve`` runs the Thomas algorithm along the **last** axis, batched
over all leading axes — one ``lax.scan`` forward elimination and one reversed
back-substitution, each step a fused multiply-add over the whole batch, so a
(NE, Ny, Nx) sweep keeps the VPU busy with NE·Ny lanes per scan step.

Block-diagonal systems (masked geometries produce independent intervals in
one grid line) need no special casing: a zero sub-diagonal entry restarts the
forward recurrence and a zero super-diagonal entry terminates the backward
one, so interval boundaries decouple exactly.

A Pallas kernel with identical semantics can be substituted for the scans on
TPU via ``qpsim_tpu.ops.pallas_tridiag`` (optional fast path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "wang_eliminate",
    "wang_interface_sweep",
    "wang_apply_interface",
    "wang_apply_rhs",
    "wang_externals",
    "tridiag_solve",
    "tridiag_solve_along",
    "tridiag_solve_pcr",
    "tridiag_solve_wang",
    "wang_factor",
    "wang_apply",
    "set_default_solver",
]


def _shift_fwd(arr: jax.Array, s: int, fill: float) -> jax.Array:
    """Value of index i−s along the last axis (fill past the edge)."""
    pad = jnp.full(arr.shape[:-1] + (s,), fill, dtype=arr.dtype)
    return jnp.concatenate([pad, arr[..., :-s]], axis=-1)


def _shift_bwd(arr: jax.Array, s: int, fill: float) -> jax.Array:
    """Value of index i+s along the last axis (fill past the edge)."""
    pad = jnp.full(arr.shape[:-1] + (s,), fill, dtype=arr.dtype)
    return jnp.concatenate([arr[..., s:], pad], axis=-1)


def tridiag_solve_pcr(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Parallel cyclic reduction along the last axis (TPU fast path).

    Thomas (`tridiag_solve`) is a length-N sequential scan — latency-bound on
    TPU where each scan step is a tiny fused op.  PCR does ⌈log₂N⌉ levels of
    fully vectorised elimination (a handful of shifted multiply-adds each),
    so a 1024-long solve is ~10 bandwidth-bound passes instead of 2048
    dispatches.  Stable for the diagonally dominant Crank–Nicolson systems
    this framework produces; identical block-decoupling semantics (zero
    couplings isolate intervals exactly: eliminations multiply through the
    zero coefficients).
    """
    n = rhs.shape[-1]
    if n == 1:
        return rhs / diag
    a = sub.at[..., 0].set(0.0)
    c = sup.at[..., -1].set(0.0)
    b = diag
    d = rhs
    s = 1
    while s < n:
        b_m = _shift_fwd(b, s, 1.0)
        b_p = _shift_bwd(b, s, 1.0)
        alpha = -a / b_m
        gamma = -c / b_p
        b = b + alpha * _shift_fwd(c, s, 0.0) + gamma * _shift_bwd(a, s, 0.0)
        d = d + alpha * _shift_fwd(d, s, 0.0) + gamma * _shift_bwd(d, s, 0.0)
        a = alpha * _shift_fwd(a, s, 0.0)
        c = gamma * _shift_bwd(c, s, 0.0)
        s *= 2
    return d / b



def wang_eliminate(a_s, b_s, c_s, d_s):
    """Stages 1–2 of the Wang partition: per-partition elimination scans.

    Inputs are laid out (M, *lanes) — M the in-partition position, lanes any
    batch shape (in-device: (M, K, B...); distributed: (m, nb, nx) with the
    partitions living on different shards).  Returns ``(C, A, D)`` with every
    unknown expressed as  x_i = D_i − A_i·X_L − C_i·X_R  in terms of the
    neighbouring partitions' boundary values.  Shared by
    :func:`tridiag_solve_wang` and the sharded step's distributed y-solve
    (``parallel.sharded._wang_solve_y``) so the two can never diverge.
    """
    lane = a_s[0]

    def forward(carry, row):
        cp, ap, dp = carry
        a_i, b_i, c_i, d_i = row
        inv = 1.0 / (b_i - a_i * cp)
        cp_i = c_i * inv
        ap_i = -a_i * ap * inv
        dp_i = (d_i - a_i * dp) * inv
        return (cp_i, ap_i, dp_i), (cp_i, ap_i, dp_i)

    init = (jnp.zeros_like(lane), -jnp.ones_like(lane), jnp.zeros_like(lane))
    _, (cp, ap, dp) = jax.lax.scan(forward, init, (a_s, b_s, c_s, d_s))

    def backward(carry, row):
        c_nxt, a_nxt, d_nxt = carry
        cp_i, ap_i, dp_i = row
        d_i = dp_i - cp_i * d_nxt
        a_i = ap_i - cp_i * a_nxt
        c_i = -cp_i * c_nxt
        return (c_i, a_i, d_i), (c_i, a_i, d_i)

    # at i=M−1 the final form is the stage-1 row itself (its sup couples X_R)
    init_b = (jnp.full_like(lane, -1.0), jnp.zeros_like(lane), jnp.zeros_like(lane))
    _, (C, A, D) = jax.lax.scan(backward, init_b, (cp, ap, dp), reverse=True)
    return C, A, D


def wang_interface_sweep(aL, cL, dL, aR, cR, dR, k):
    """Stage 3 of the Wang partition: the 2K-unknown interface recurrence.

    ``aL..dR`` are (K, *lanes) stacks of each partition's first/last row
    coefficients;  L_k + aL·R_{k−1} + cL·L_{k+1} = dL  and
    R_k + aR·R_{k−1} + cR·L_{k+1} = dR.  K is small and static, so the
    sweep unrolls.  Returns the boundary unknowns ``(Ls, Rs)`` as K-lists.
    """
    zero = jnp.zeros_like(aL[0])
    g = zero  # R_{k−1} = g − w·L_k
    w = zero
    ps, qs, gs, ws = [], [], [], []
    for j in range(k):
        inv = 1.0 / (1.0 - aL[j] * w)
        p = (dL[j] - aL[j] * g) * inv
        q = cL[j] * inv
        g = dR[j] - aR[j] * g + aR[j] * w * p
        w = cR[j] + aR[j] * w * q
        ps.append(p)
        qs.append(q)
        gs.append(g)
        ws.append(w)
    L_next = zero
    Ls, Rs = [None] * k, [None] * k
    for j in range(k - 1, -1, -1):
        Ls[j] = ps[j] - qs[j] * L_next
        Rs[j] = gs[j] - ws[j] * L_next
        L_next = Ls[j]
    return Ls, Rs


def tridiag_solve_wang(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
    chunk: int = 128,
) -> jax.Array:
    """Wang's partition method along the last axis (chunked Thomas + reduced
    interface system).

    Splits each length-N line into K = ⌈N/chunk⌉ chunks.  Two in-chunk
    elimination scans (length ``chunk`` instead of N, batched over B·K lanes)
    express every unknown as  x_i = D_i − A_i·R_{k−1} − C_i·L_{k+1}  in terms
    of the neighbouring chunks' boundary values; those satisfy a 2K-unknown
    interface recurrence solved by an unrolled scalar sweep (K is small and
    static).  Compared to PCR (⌈log₂N⌉ full-array passes) this is ~3 passes
    of HBM traffic, and compared to Thomas it has K× the lanes per scan step
    and 1/K the scan depth — the sweet spot for mid-sized batches on TPU.

    Decoupling semantics match Thomas/PCR exactly: a zero ``sub`` entry kills
    the left fill-in (A becomes 0 downstream) and a zero ``sup`` entry kills
    the right fill-in, so masked-interval boundaries — wherever they fall
    relative to chunk edges — stay exact.  Stable for the diagonally dominant
    CN systems this framework produces (no pivoting).
    """
    n = rhs.shape[-1]
    if n == 1:
        return rhs / diag
    chunk = int(min(chunk, n))
    k = -(-n // chunk)
    pad = k * chunk - n
    a = sub.at[..., 0].set(0.0)
    c = sup.at[..., -1].set(0.0)
    b, d = diag, rhs
    if pad:
        # identity padding rows: decoupled (a=c=0), x=0
        pw = [(0, 0)] * (rhs.ndim - 1) + [(0, pad)]
        a = jnp.pad(a, pw)
        c = jnp.pad(c, pw)
        b = jnp.pad(b, pw, constant_values=1.0)
        d = jnp.pad(d, pw)
    batch_shape = rhs.shape[:-1]

    # (M, K, B) layout: scan over in-chunk position, lanes contiguous in B
    def to_scan(t):
        t = t.reshape(batch_shape + (k, chunk))  # (..., K, M)
        t = jnp.moveaxis(t, -1, 0)  # (M, ..., K)
        return jnp.moveaxis(t, -1, 1)  # (M, K, ...)

    a_s, b_s, c_s, d_s = to_scan(a), to_scan(b), to_scan(c), to_scan(d)

    # Stages 1–3: shared Wang recurrences (wang_eliminate docstring has the
    # per-row relations); chunks ride the lane/batch axes here.
    C, A, D = wang_eliminate(a_s, b_s, c_s, d_s)
    Ls, Rs = wang_interface_sweep(A[0], C[0], D[0], A[-1], C[-1], D[-1], k)
    XL, XR = wang_externals(Ls, Rs)  # (K, ...) each

    # Stage 4 — back-substitution, one fused elementwise pass.
    x = D - A * XL[None] - C * XR[None]  # (M, K, ...)
    x = jnp.moveaxis(jnp.moveaxis(x, 1, -1), 0, -1)  # (..., K, M)
    x = x.reshape(batch_shape + (k * chunk,))
    return x[..., :n] if pad else x


def _wang_layout(t: jax.Array, k: int, chunk: int) -> jax.Array:
    """(..., K·M) → (M, K, ...): scan over in-chunk position, lanes in batch."""
    t = t.reshape(t.shape[:-1] + (k, chunk))
    return jnp.moveaxis(jnp.moveaxis(t, -1, 0), -1, 1)


def _wang_unlayout(t: jax.Array) -> jax.Array:
    """(M, K, ...) → (..., K·M)."""
    t = jnp.moveaxis(jnp.moveaxis(t, 1, -1), 0, -1)  # (..., K, M)
    return t.reshape(t.shape[:-2] + (t.shape[-2] * t.shape[-1],))


def wang_factor(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    chunk: int = 128,
) -> dict[str, jax.Array]:
    """Precompute the Wang-partition factorization of a tridiagonal system.

    The returned pytree of device arrays is consumed by :func:`wang_apply`;
    together they split :func:`tridiag_solve_wang` into a once-per-operator
    factor stage and a per-step solve stage.  In a jit-compiled time loop,
    pass the factor pytree as an *argument* (not a closure capture) so the
    arrays ship to the device once instead of being baked into the compile
    payload — the solve then runs only the rhs recurrences: ~1.4x over the
    fused Thomas scan at (16·1024 lines × N=1024) on v5e, where the
    coefficient eliminations cannot be hoisted out of the fused scan.
    """
    n = diag.shape[-1]
    chunk = int(min(chunk, n))
    k = -(-n // chunk)
    pad = k * chunk - n
    a = sub.at[..., 0].set(0.0)
    c = sup.at[..., -1].set(0.0)
    b = diag
    if pad:
        pw = [(0, 0)] * (diag.ndim - 1) + [(0, pad)]
        a = jnp.pad(a, pw)
        c = jnp.pad(c, pw)
        b = jnp.pad(b, pw, constant_values=1.0)
    a_s = _wang_layout(a, k, chunk)
    b_s = _wang_layout(b, k, chunk)
    c_s = _wang_layout(c, k, chunk)
    lane = a_s[0]

    def forward(carry, row):
        cp, ap = carry
        a_i, b_i, c_i = row
        inv = 1.0 / (b_i - a_i * cp)
        cp_i = c_i * inv
        ap_i = -a_i * ap * inv
        return (cp_i, ap_i), (cp_i, ap_i, a_i * inv, inv)

    init = (jnp.zeros_like(lane), -jnp.ones_like(lane))
    _, (cp, ap, m, inv) = jax.lax.scan(forward, init, (a_s, b_s, c_s))

    def backward(carry, row):
        c_nxt, a_nxt = carry
        cp_i, ap_i = row
        a_i = ap_i - cp_i * a_nxt
        c_i = -cp_i * c_nxt
        return (c_i, a_i), (c_i, a_i)

    init_b = (jnp.full_like(lane, -1.0), jnp.zeros_like(lane))
    _, (C, A) = jax.lax.scan(backward, init_b, (cp, ap), reverse=True)

    # interface coefficients (unrolled over the K chunks — K small & static)
    aL, cL = A[0], C[0]
    aR, cR = A[-1], C[-1]
    w = jnp.zeros_like(lane[0])
    inv_if, q_if, w_pre, w_post = [], [], [], []
    for j in range(k):
        invj = 1.0 / (1.0 - aL[j] * w)
        qj = cL[j] * invj
        w_new = cR[j] + aR[j] * w * qj
        inv_if.append(invj)
        q_if.append(qj)
        w_pre.append(w)
        w_post.append(w_new)
        w = w_new
    return {
        "cp": cp,
        "m": m,
        "inv": inv,
        "C": C,
        "A": A,
        "if_inv": jnp.stack(inv_if),
        "if_q": jnp.stack(q_if),
        "if_w_pre": jnp.stack(w_pre),
        "if_w_post": jnp.stack(w_post),
        "if_aL": aL,
        "if_aR": aR,
    }



def wang_apply_interface(dL, dR, aL, aR, if_inv, if_q, w_pre, w_post, k):
    """Prefactored stage-3 rhs sweep: boundary unknowns from interface rhs.

    Coefficient parts (``aL, aR, if_inv, if_q, w_pre, w_post`` — all
    (K, *lanes) stacks from :func:`wang_factor`) are time-invariant; only
    ``dL, dR`` change per solve.  Shared by :func:`wang_apply` and the
    sharded step's prefactored distributed y-solve.  Returns ``(Ls, Rs)``
    as K-lists of boundary values.
    """
    g = jnp.zeros_like(dL[0])
    ps, gs = [], []
    for j in range(k):
        p = (dL[j] - aL[j] * g) * if_inv[j]
        g = dR[j] - aR[j] * g + aR[j] * w_pre[j] * p
        ps.append(p)
        gs.append(g)
    L_next = jnp.zeros_like(g)
    Ls, Rs = [None] * k, [None] * k
    for j in range(k - 1, -1, -1):
        Ls[j] = ps[j] - if_q[j] * L_next
        Rs[j] = gs[j] - w_post[j] * L_next
        L_next = Ls[j]
    return Ls, Rs



def wang_apply_rhs(d, m, inv, cp):
    """Prefactored stages 1–2 rhs recurrences: d → D (boundary-coupled form).

    ``m = a·inv``, ``inv``, ``cp`` come from :func:`wang_factor`; layouts are
    (M, *lanes).  Shared by :func:`wang_apply` and the sharded step's
    prefactored distributed y-solve so the recurrences can never diverge.
    """

    def forward(dp, row):
        d_i, m_i, inv_i = row
        dp_i = d_i * inv_i - m_i * dp
        return dp_i, dp_i

    _, dp = jax.lax.scan(forward, jnp.zeros_like(d[0]), (d, m, inv))

    def backward(d_nxt, row):
        dp_i, cp_i = row
        d_i = dp_i - cp_i * d_nxt
        return d_i, d_i

    _, D = jax.lax.scan(backward, jnp.zeros_like(d[0]), (dp, cp), reverse=True)
    return D


def wang_externals(Ls, Rs):
    """Per-partition externals from the boundary unknowns: stacked
    ``(XL, XR)`` with X_L of partition j = R_{j−1} (zero at the top) and
    X_R = L_{j+1} (zero at the bottom)."""
    zero = jnp.zeros_like(Ls[0])
    return jnp.stack([zero] + Rs[:-1]), jnp.stack(Ls[1:] + [zero])


def wang_apply(fac: dict[str, jax.Array], rhs: jax.Array) -> jax.Array:
    """Solve with a :func:`wang_factor` factorization (rhs recurrences only)."""
    cp, m, inv = fac["cp"], fac["m"], fac["inv"]
    chunk, k = cp.shape[0], cp.shape[1]
    n = rhs.shape[-1]
    pad = k * chunk - n
    d = rhs
    if pad:
        pw = [(0, 0)] * (rhs.ndim - 1) + [(0, pad)]
        d = jnp.pad(d, pw)
    d = _wang_layout(d, k, chunk)
    D = wang_apply_rhs(d, m, inv, cp)

    dL, dR = D[0], D[-1]
    Ls, Rs = wang_apply_interface(
        dL, dR, fac["if_aL"], fac["if_aR"], fac["if_inv"], fac["if_q"],
        fac["if_w_pre"], fac["if_w_post"], k,
    )
    XL, XR = wang_externals(Ls, Rs)
    x = D - fac["A"] * XL[None] - fac["C"] * XR[None]
    x = _wang_unlayout(x)
    return x[..., :n] if pad else x


_DEFAULT_SOLVER = "auto"

#: with at least this many lines solved together, the sequential Thomas scan
#: amortises its per-step dispatch across enough lanes to beat PCR's
#: log-depth passes (measured on v5e at N=1024: PCR wins at 1–2k lines,
#: Thomas wins 3–6x from ~8k lines up).
_THOMAS_BATCH_THRESHOLD = 8192

#: Wang partition chunk length (measured on v5e, standalone solves: at
#: 16384 lines × N=1024 Wang-64 beats Thomas 2.2x and PCR 5x; at 512
#: lines × N=512 PCR still wins by ~10%).
_WANG_CHUNK = 64


def set_default_solver(name: str) -> None:
    """Select the batched tridiagonal algorithm.

    'auto'   — shape-based choice on TPU/GPU (Wang partition when the
               chunked problem has enough lanes, Thomas at huge batches,
               PCR otherwise); Thomas on CPU (lower flop count, cheap scans);
    'thomas' — sequential two-scan Thomas;
    'pcr'    — parallel cyclic reduction (XLA; best fused inside lax.scan);
    'wang'   — Wang partition (chunked Thomas + reduced interface system);
    'pallas' — in-VMEM Thomas Pallas kernel (TPU only; single HBM pass per
               solve, but its in-kernel sequential sweep is latency-bound —
               measured slightly slower than scan-fused PCR at 1024², kept
               as an alternative backend).
    """
    global _DEFAULT_SOLVER
    if name not in ("auto", "thomas", "pcr", "wang", "pallas"):
        raise ValueError(f"Unknown tridiagonal solver: {name!r}")
    _DEFAULT_SOLVER = name


def _use_pcr() -> bool:
    if _DEFAULT_SOLVER == "pcr":
        return True
    if _DEFAULT_SOLVER == "thomas":
        return False
    return jax.default_backend() in ("tpu", "gpu")


def tridiag_solve(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Solve T x = rhs with T tridiagonal along the last axis.

    ``sub[..., i]`` couples row i to i−1 (entry ignored at i=0) and
    ``sup[..., i]`` couples row i to i+1 (ignored at the last row).
    All arrays share one shape; batching is over the leading axes.
    Dispatches by shape on TPU/GPU (Wang partition / Thomas / PCR) and to
    the Thomas scan on CPU (see :func:`set_default_solver`).
    """
    if _DEFAULT_SOLVER == "pallas":
        from .pallas_tridiag import tridiag_solve_pallas

        return tridiag_solve_pallas(sub, diag, sup, rhs)
    if _DEFAULT_SOLVER == "wang":
        return tridiag_solve_wang(sub, diag, sup, rhs, chunk=_WANG_CHUNK)
    if _use_pcr():
        batch = int(np.prod(rhs.shape[:-1])) if rhs.ndim > 1 else 1
        if _DEFAULT_SOLVER == "auto" and batch >= _THOMAS_BATCH_THRESHOLD:
            # NOTE: standalone, Wang-64 beats Thomas 2.2x here, but fused
            # inside a lax.scan time loop it loses (XLA hoists the constant
            # coefficient eliminations out of the loop for Thomas/PCR, while
            # Wang's layout shuffles stay); auto keeps Thomas/PCR — use
            # set_default_solver('wang') or the prefactored API for the
            # standalone-solve regime.
            return _tridiag_solve_thomas(sub, diag, sup, rhs)
        return tridiag_solve_pcr(sub, diag, sup, rhs)
    return _tridiag_solve_thomas(sub, diag, sup, rhs)


#: scan unroll for the Thomas sweeps: the per-iteration bodies are tiny
#: fused multiply-adds, so loop overhead is a real cost — unroll=8 measured
#: 17% faster than unroll=1 at (16·1024 lines × N=1024) on v5e, with 16/32/64
#: regressing again (instruction-cache pressure).
_THOMAS_UNROLL = 8


def _tridiag_solve_thomas(
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Sequential Thomas algorithm via two lax.scans."""
    n = rhs.shape[-1]
    if n == 1:
        return rhs / diag

    a = jnp.moveaxis(sub, -1, 0)
    b = jnp.moveaxis(diag, -1, 0)
    c = jnp.moveaxis(sup, -1, 0)
    r = jnp.moveaxis(rhs, -1, 0)
    a = a.at[0].set(0.0)
    c = c.at[-1].set(0.0)

    def forward(carry, row):
        w_prev, g_prev = carry
        a_i, b_i, c_i, r_i = row
        inv = 1.0 / (b_i - a_i * w_prev)
        w_i = c_i * inv
        g_i = (r_i - a_i * g_prev) * inv
        return (w_i, g_i), (w_i, g_i)

    zeros = jnp.zeros_like(r[0])
    _, (w, g) = jax.lax.scan(forward, (zeros, zeros), (a, b, c, r), unroll=_THOMAS_UNROLL)

    def backward(x_next, row):
        w_i, g_i = row
        x_i = g_i - w_i * x_next
        return x_i, x_i

    _, x = jax.lax.scan(backward, zeros, (w, g), reverse=True, unroll=_THOMAS_UNROLL)
    return jnp.moveaxis(x, 0, -1)


def tridiag_solve_along(
    axis: int,
    sub: jax.Array,
    diag: jax.Array,
    sup: jax.Array,
    rhs: jax.Array,
) -> jax.Array:
    """Tridiagonal solve along an arbitrary axis (moves it last and back)."""
    if axis in (-1, rhs.ndim - 1):
        return tridiag_solve(sub, diag, sup, rhs)
    move = lambda t: jnp.moveaxis(t, axis, -1)
    out = tridiag_solve(move(sub), move(diag), move(sup), move(rhs))
    return jnp.moveaxis(out, -1, axis)
