"""Crank–Nicolson diffusion backends for TPU.

Two interchangeable implementations of one step contract:

    step(state) -> state        # state: (NB, Ny, Nx), dt baked in at build

* :class:`DenseSpectralDiffusion` — **exact unsplit CN**.  The masked P×P
  operator L is symmetric (interior couplings are reciprocal and boundary
  terms are diagonal), so one host-side eigendecomposition L = Q Λ Qᵀ turns
  every CN solve into two dense matmuls:

      u⁺ = Q · diag((1+αλ)/(1−αλ)) · Qᵀ u  +  const

  This is the replacement for the reference's per-bin SuperLU factorisations
  (``/root/reference/qpsim/solver.py:221-232,1139-1174``): the per-step work
  is MXU matmuls instead of sparse triangular solves, and it is bit-level
  equivalent to unsplit CN — used for parity/validation and small grids.

* :class:`ADIDiffusion` — Peaceman–Rachford alternating-direction splitting
  with batched Thomas solves (``qpsim_tpu.ops.tridiag``).  Exactly CN for 1D
  strips; O(dt²) consistent with unsplit CN in 2D; linear cost in grid size,
  so it is the scalable path for 512²–1024² grids.

Both backends treat masked-out cells as inert identity rows.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

# Outcome of the separable-ADI Mosaic compile probe, per kernel config —
# one AOT compile per config per process, shared across backend instances.
_SEP_COMPILE_OK: dict[tuple, bool] = {}

from ..ops.diffusion import (
    SplitOperator,
    active_indices,
    assemble_dense_operator,
)
from ..ops.tridiag import tridiag_solve, tridiag_solve_along, wang_apply, wang_factor

__all__ = [
    "DenseSpectralDiffusion",
    "ADIDiffusion",
    "PrefactoredWangADI",
    "CGDiffusion",
    "PallasADI",
    "choose_backend",
]

#: grids with at most this many interior cells default to the dense backend.
DENSE_BACKEND_MAX_CELLS = 4096


class _AuxStepMixin:
    """Default aux-step protocol: no auxiliary arrays.

    ``make_step_aux(dt)`` returns ``(step_fn, aux)`` where the engine calls
    ``step_fn(state, aux)`` and passes ``aux`` through its jit boundary as an
    *argument*.  Backends whose per-step data is too large to bake into the
    compile payload (the remote TPU compiler caps request size) override
    this to ship the data as device arrays instead.
    """

    def make_step_aux(self, dt: float):
        step = self.make_step(dt)
        return (lambda state, aux: step(state)), ()


class DenseSpectralDiffusion(_AuxStepMixin):
    """Exact unsplit CN via spectral decomposition of the masked operator."""

    def __init__(self, op: SplitOperator, dtype=jnp.float64):
        self.dtype = dtype
        self.mask = np.asarray(op.mask, dtype=bool)
        self._flat_active = jnp.asarray(active_indices(self.mask))
        self.num_bins = op.num_bins
        L, src = assemble_dense_operator(op)  # (NB,P,P), (NB,P) float64
        self.p = L.shape[-1]
        # One eigendecomposition per distinct operator.  With a per-bin
        # uniform D the bins share eigenvectors only if D is folded outside;
        # here D is already folded, so detect shared structure cheaply.
        self._shared = all(np.array_equal(L[0], L[b]) for b in range(1, L.shape[0]))
        if self._shared:
            lam, Q = np.linalg.eigh(L[0])
            self._lam = lam[None, :]
            self._Q = Q[None, :, :]
        else:
            lams, Qs = [], []
            for b in range(L.shape[0]):
                lam, Q = np.linalg.eigh(L[b])
                lams.append(lam)
                Qs.append(Q)
            self._lam = np.stack(lams)
            self._Q = np.stack(Qs)
        self._src = src

    def make_step(self, dt: float):
        """Return a jit-composable CN step with this dt baked in."""
        alpha = 0.5 * float(dt)
        ratio = (1.0 + alpha * self._lam) / (1.0 - alpha * self._lam)  # (nb?,P)
        # Constant source response: dt·(I−αL)⁻¹ s, precomputed in f64.
        gain = float(dt) / (1.0 - alpha * self._lam)
        proj_src = np.einsum("bqp,bp->bq", np.swapaxes(self._Q, -1, -2), self._src)
        s_eff = np.einsum("bpq,bq->bp", self._Q, gain * proj_src)

        Q = jnp.asarray(self._Q, dtype=self.dtype)
        ratio_d = jnp.asarray(ratio, dtype=self.dtype)
        s_eff_d = jnp.asarray(s_eff, dtype=self.dtype)
        mask_flat = self._flat_active
        ny, nx = self.mask.shape
        shared = self._shared

        # this backend exists for exactness: force full-f32 MXU passes (the
        # TPU default matmul precision is bf16, costing ~1e-3 relative)
        precision = jax.lax.Precision.HIGHEST

        def step(state: jax.Array) -> jax.Array:
            nb = state.shape[0]
            u = state.reshape(nb, ny * nx)[:, mask_flat]  # (NB, P)
            if shared:
                q = Q[0]
                v = jnp.matmul(u, q, precision=precision)  # projections onto eigenbasis
                u_new = jnp.matmul(v * ratio_d, q.T, precision=precision)
            else:
                v = jnp.einsum("bqp,bq->bp", Q, u, precision=precision)
                u_new = jnp.einsum("bpq,bq->bp", Q, v * ratio_d, precision=precision)
            u_new = u_new + s_eff_d
            out = jnp.zeros((nb, ny * nx), dtype=state.dtype)
            out = out.at[:, mask_flat].set(u_new.astype(state.dtype))
            return out.reshape(nb, ny, nx)

        return step


class ADIDiffusion(_AuxStepMixin):
    """Peaceman–Rachford ADI with batched tridiagonal solves.

    Uniform-per-bin operators arrive factored (unit-D geometry ×
    ``bin_scale``); the scale multiplies lazily in-graph so (NB, Ny, Nx)
    coefficient constants are never materialised in HBM or compile payloads.
    """

    #: factored operators with at most this many coefficient elements are
    #: pre-multiplied on the host (cheaper per step); larger ones multiply
    #: lazily in-graph to keep coefficients out of HBM/compile payloads.
    MATERIALIZE_MAX_ELEMENTS = 4_000_000

    def __init__(self, op: SplitOperator, dtype=jnp.float64):
        self.dtype = dtype
        self.mask = np.asarray(op.mask, dtype=bool)
        as_dev = lambda a: jnp.asarray(a, dtype=dtype)
        ny, nx = self.mask.shape
        if (
            op.bin_scale is not None
            and op.num_bins * ny * nx <= self.MATERIALIZE_MAX_ELEMENTS
        ):
            fold = op.materialized
            self.scale = None
        else:
            fold = lambda a: a
            self.scale = None if op.bin_scale is None else as_dev(op.bin_scale)
        self.ax_lo, self.ax_hi, self.ax_diag = (
            as_dev(fold(op.ax_lo)),
            as_dev(fold(op.ax_hi)),
            as_dev(fold(op.ax_diag)),
        )
        self.ay_lo, self.ay_hi, self.ay_diag = (
            as_dev(fold(op.ay_lo)),
            as_dev(fold(op.ay_hi)),
            as_dev(fold(op.ay_diag)),
        )
        self.src = as_dev(fold(op.source_total()))
        self.num_bins = op.num_bins

    @staticmethod
    def _apply_dir(u, a_lo, a_hi, diag, axis):
        """L_d u for one direction: a_lo·u_prev + a_hi·u_next + diag·u."""
        u_prev = jnp.roll(u, 1, axis=axis)
        u_next = jnp.roll(u, -1, axis=axis)
        # roll wraps around, but a_lo is zero on the first slice and a_hi on
        # the last (boundary faces are never interior couplings), so the
        # wrapped values are multiplied by zero.
        return a_lo * u_prev + a_hi * u_next + diag * u

    def make_step(self, dt: float):
        alpha = 0.5 * float(dt)
        apply_dir = self._apply_dir
        scale = self.scale
        fax_lo, fax_hi, fax_diag = self.ax_lo, self.ax_hi, self.ax_diag
        fay_lo, fay_hi, fay_diag = self.ay_lo, self.ay_hi, self.ay_diag
        fsrc = self.src

        def step(state: jax.Array) -> jax.Array:
            # bin_scale folds in here, INSIDE the trace: the (NB, Ny, Nx)
            # coefficients exist only as fused values, never as constants.
            if scale is not None:
                ax_lo, ax_hi, ax_diag = scale * fax_lo, scale * fax_hi, scale * fax_diag
                ay_lo, ay_hi, ay_diag = scale * fay_lo, scale * fay_hi, scale * fay_diag
                src = scale * fsrc
            else:
                ax_lo, ax_hi, ax_diag = fax_lo, fax_hi, fax_diag
                ay_lo, ay_hi, ay_diag = fay_lo, fay_hi, fay_diag
                src = fsrc

            u = state
            # x-implicit half: (I − αLx) u* = u + α·Ly u + α·s
            rhs = u + alpha * apply_dir(u, ay_lo, ay_hi, ay_diag, axis=-2) + alpha * src
            u_star = tridiag_solve(
                jnp.broadcast_to(-alpha * ax_lo, rhs.shape),
                jnp.broadcast_to(1.0 - alpha * ax_diag, rhs.shape),
                jnp.broadcast_to(-alpha * ax_hi, rhs.shape),
                rhs,
            )
            # y-implicit half: (I − αLy) u⁺ = u* + α·Lx u* + α·s
            rhs2 = (
                u_star
                + alpha * apply_dir(u_star, ax_lo, ax_hi, ax_diag, axis=-1)
                + alpha * src
            )
            u_new = tridiag_solve_along(
                -2,
                jnp.broadcast_to(-alpha * ay_lo, rhs2.shape),
                jnp.broadcast_to(1.0 - alpha * ay_diag, rhs2.shape),
                jnp.broadcast_to(-alpha * ay_hi, rhs2.shape),
                rhs2,
            )
            return u_new

        return step


class PrefactoredWangADI(ADIDiffusion):
    """ADI with once-per-operator Wang-partition factorizations.

    The CN tridiagonal systems are fixed for a run, but inside a fused scan
    XLA cannot split their coefficient eliminations from the rhs recurrences
    (one ``lax.scan`` op), so Thomas/PCR redo them every step.  This backend
    factors both directional systems once (device arrays, shipped through
    the engine's jit boundary as arguments — never compile-payload
    constants) and solves each step with the rhs recurrences only.

    Measured on v5e at (16·1024 lines × N=1024): 1.4x over fused Thomas
    when the coefficients are full (NB, Ny, Nx) arrays (per-pixel gaps),
    but a net LOSS on uniform-gap operators whose coefficients broadcast
    from (1, Ny, Nx) — there the factor-array traffic (10 full-size reads
    per step) exceeds what the eliminations cost to redo.  Hence opt-in
    (``diffusion_backend='wang'``), not part of 'auto'.  Factor memory:
    10 arrays of (NB, Ny, Nx).
    """

    #: Wang chunk length (lanes per scan step = batch × N/chunk)
    CHUNK = 64

    def make_step_aux(self, dt: float):
        alpha = 0.5 * float(dt)
        ny, nx = self.mask.shape
        nb = self.num_bins
        scale = self.scale

        def build_factors(ax_lo, ax_hi, ax_diag, ay_lo, ay_hi, ay_diag, sc=None):
            def mat(t):
                if sc is not None:
                    t = sc * t
                return jnp.broadcast_to(t, (nb, ny, nx))

            fx = wang_factor(
                -alpha * mat(ax_lo),
                1.0 - alpha * mat(ax_diag),
                -alpha * mat(ax_hi),
                chunk=self.CHUNK,
            )
            mv = lambda t: jnp.moveaxis(mat(t), -2, -1)
            fy = wang_factor(
                -alpha * mv(ay_lo),
                1.0 - alpha * mv(ay_diag),
                -alpha * mv(ay_hi),
                chunk=self.CHUNK,
            )
            return fx, fy

        coeff_args = (
            self.ax_lo, self.ax_hi, self.ax_diag,
            self.ay_lo, self.ay_hi, self.ay_diag,
        )
        if scale is None:
            aux = jax.jit(build_factors)(*coeff_args)
        else:
            aux = jax.jit(build_factors)(*coeff_args, scale)

        apply_dir = self._apply_dir
        fax_lo, fax_hi, fax_diag = self.ax_lo, self.ax_hi, self.ax_diag
        fay_lo, fay_hi, fay_diag = self.ay_lo, self.ay_hi, self.ay_diag
        fsrc = self.src

        def step(state: jax.Array, aux) -> jax.Array:
            fx, fy = aux
            if scale is not None:
                ax_lo, ax_hi, ax_diag = scale * fax_lo, scale * fax_hi, scale * fax_diag
                ay_lo, ay_hi, ay_diag = scale * fay_lo, scale * fay_hi, scale * fay_diag
                src = scale * fsrc
            else:
                ax_lo, ax_hi, ax_diag = fax_lo, fax_hi, fax_diag
                ay_lo, ay_hi, ay_diag = fay_lo, fay_hi, fay_diag
                src = fsrc
            u = state
            rhs = u + alpha * apply_dir(u, ay_lo, ay_hi, ay_diag, axis=-2) + alpha * src
            u_star = wang_apply(fx, rhs)
            rhs2 = (
                u_star
                + alpha * apply_dir(u_star, ax_lo, ax_hi, ax_diag, axis=-1)
                + alpha * src
            )
            u_new = jnp.moveaxis(wang_apply(fy, jnp.moveaxis(rhs2, -2, -1)), -1, -2)
            return u_new

        return step, aux

    def make_step(self, dt: float):
        # closure-capture variant: convenient for tests/small grids, but the
        # factor arrays land in the compile payload — prefer make_step_aux
        # in jitted time loops.
        step, aux = self.make_step_aux(dt)
        return lambda state: step(state, aux)


class CGDiffusion(ADIDiffusion):
    """Exact **unsplit** CN via Jacobi-preconditioned conjugate gradient.

    The masked CN matrix (I − αL) is symmetric positive definite (interior
    couplings are reciprocal, boundary terms diagonal, harmonic-mean
    variable-D preserves symmetry), so matrix-free CG converges fast and
    needs only the directional stencil applications — no factorization, no
    O(P²) eigendecomposition.  This is the parity-exact backend for masked
    grids too large for :class:`DenseSpectralDiffusion` (its host eigh is
    O(P³)): unlike ADI there is no O(dt²) splitting error, so it reproduces
    the reference's unsplit SuperLU CN (solver.py:221-232) to solver
    tolerance.  Opt-in via ``diffusion_backend='cg'``.
    """

    #: CG stops at ||r|| <= tol·||b|| or after maxiter iterations
    TOL = 1e-12
    MAXITER = 400

    def make_step(self, dt: float):
        alpha = 0.5 * float(dt)
        apply_dir = self._apply_dir
        scale = self.scale
        fax_lo, fax_hi, fax_diag = self.ax_lo, self.ax_hi, self.ax_diag
        fay_lo, fay_hi, fay_diag = self.ay_lo, self.ay_hi, self.ay_diag
        fsrc = self.src
        tol = self.TOL if self.dtype == jnp.float64 else 1e-7
        maxiter = self.MAXITER

        def step(state: jax.Array) -> jax.Array:
            if scale is not None:
                ax_lo, ax_hi, ax_diag = scale * fax_lo, scale * fax_hi, scale * fax_diag
                ay_lo, ay_hi, ay_diag = scale * fay_lo, scale * fay_hi, scale * fay_diag
                src = scale * fsrc
            else:
                ax_lo, ax_hi, ax_diag = fax_lo, fax_hi, fax_diag
                ay_lo, ay_hi, ay_diag = fay_lo, fay_hi, fay_diag
                src = fsrc

            def L(u):
                return apply_dir(u, ax_lo, ax_hi, ax_diag, axis=-1) + apply_dir(
                    u, ay_lo, ay_hi, ay_diag, axis=-2
                )

            A = lambda u: u - alpha * L(u)
            diag_A = 1.0 - alpha * (ax_diag + ay_diag)
            M = lambda u: u / diag_A  # Jacobi preconditioner
            b = state + alpha * L(state) + float(dt) * src
            u_new, _ = jax.scipy.sparse.linalg.cg(
                A, b, x0=state, tol=tol, maxiter=maxiter, M=M
            )
            return u_new

        return step


class PallasADI(_AuxStepMixin):
    """PR-ADI via fused Pallas TPU kernels (``ops.pallas_adi``).

    Each half-step is one kernel pass: explicit stencil, in-VMEM CN
    coefficient assembly from the small geometry planes × per-bin D, and a
    Wang-partition tridiagonal solve with the lines on sublanes.  Measured
    4.9x over :class:`ADIDiffusion` at 1024²×16 f32 on v5e (5.18 → 1.06
    ms/step).  Same splitting as ADI — agrees to f32 roundoff.

    TPU + float32 only (Pallas has no f64 story on TPU); ``choose_backend``
    enforces that for explicit requests and auto-selection.  Grids whose
    extents don't tile for the two-pass fused form fall back to the
    single-solve kernels with XLA glue (still fused coefficients).
    """

    def __init__(
        self,
        op: SplitOperator,
        dtype=jnp.float32,
        *,
        interpret: bool = False,
        tile: int | None = None,
        chunks: int | None = None,
        coupled: bool = False,
    ):
        self.dtype = dtype
        self.mask = np.asarray(op.mask, dtype=bool)
        self.num_bins = op.num_bins
        self._op = op
        self._interpret = interpret
        # explicit lane-tile / Wang-chunk overrides (None = measured auto
        # defaults).  The 2026-08 libtpu charges the auto (256, K=16) config
        # 16.12 MB of scoped VMEM inside coupled compositions (128 KB over
        # the limit) while standalone it fits — callers composing this step
        # with collision kernels pass a smaller config.
        self._tile = tile
        self._chunks = chunks
        self._coupled = coupled

    def _try_separable(self, dt: float, as_aux: bool):
        """Separable nb==1 fast path (``ops.pallas_adi_sep``): 1D stencil
        vectors + host-prefactored Wang sweeps — plane DMA and per-row
        reciprocals vanish.  Raises ``ValueError`` when the operator is not
        scalar/separable (the general kernels take over) or when disabled
        via ``QPSIM_ADI_SEPARABLE=0`` (part of the engine program-cache
        fingerprint)."""
        if os.environ.get("QPSIM_ADI_SEPARABLE", "1") == "0":
            raise ValueError("separable ADI kernels disabled by env")
        if self.num_bins > 1:
            # r5 hardware A/B (SEP_NB_AB_r05.json, v5e): the per-bin
            # factor-pack kernel beats the best currently-compilable fused
            # config at 1024²×16 (1.066 vs 1.323 ms, same harness — the
            # 0.805 ms tile-256 fused config OOMs on the current libtpu)
            # but loses at 256² (0.195 vs 0.170).  Auto engages it for
            # STANDALONE builds at 1024-class extents; coupled
            # compositions keep the fused kernel until the composition has
            # its own hardware witness (the probe only compiles
            # standalone).  QPSIM_ADI_SEPARABLE_MB=1/0 forces either way
            # (fingerprinted).
            mode = os.environ.get("QPSIM_ADI_SEPARABLE_MB", "auto")
            if mode == "0":
                raise ValueError("multi-bin separable ADI disabled by env")
            if mode != "1" and (self._coupled or min(self.mask.shape) < 512):
                raise ValueError(
                    "multi-bin separable ADI auto-engages only for "
                    "standalone builds at >=512 extents "
                    "(QPSIM_ADI_SEPARABLE_MB=1 forces it)"
                )
        from ..ops.pallas_adi_sep import build_pallas_adi_sep_step

        fn, aux = build_pallas_adi_sep_step(
            self._op, dt, self.dtype, as_aux=True, interpret=self._interpret,
            tile=self._tile, chunks=self._chunks, coupled=self._coupled,
        )
        self._probe_separable_compile(fn, aux)
        if as_aux:
            return fn, aux
        return lambda state: fn(state, aux)

    def _probe_separable_compile(self, fn, aux) -> None:
        self._probe_kernel_compile(
            "separable", fn, aux, (self._tile, self._chunks, self._coupled)
        )

    def _probe_kernel_compile(self, kind: str, fn, aux, cfg) -> None:
        """AOT-compile a standalone ADI kernel once per config.

        A Mosaic compile failure surfaces at jit time, where nothing can
        fall back — interpret-clean is not Mosaic-clean on this repo's
        record, and the scoped-VMEM envelope has tightened on TWO libtpu
        releases now (the 2026-08 coupled-composition over-accounting;
        the 2026-08-21 standalone tile-256 fused charge of 22.12 MB).
        Probing with ShapeDtypeStructs moves no data; the compile is paid
        once per (kind, shape, bins, cfg, dtype) per process (and once
        per machine under the persistent XLA cache).  Any failure raises
        ValueError so the caller's fallback chain takes over instead of
        crashing the program build.  num_bins is part of the key: the
        nb>1 kernels grid differently from nb==1 on the same mask.
        """
        if self._interpret or jax.default_backend() != "tpu":
            return
        key = (
            kind, self.mask.shape, self.num_bins,
            str(jnp.dtype(self.dtype)),
        ) + tuple(cfg)
        ok = _SEP_COMPILE_OK.get(key)
        if ok is None:
            try:
                s = jax.ShapeDtypeStruct(
                    (self.num_bins,) + self.mask.shape, self.dtype
                )
                aux_s = jax.tree_util.tree_map(
                    lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), aux
                )
                jax.jit(fn).lower(s, aux_s).compile()
                ok = True
            except Exception as exc:  # Mosaic errors are not ValueErrors
                warnings.warn(
                    f"{kind} ADI kernel failed its Mosaic compile probe "
                    f"({type(exc).__name__}: {exc}); falling back"
                )
                ok = False
            _SEP_COMPILE_OK[key] = ok
        if not ok:
            raise ValueError(f"{kind} ADI kernel failed Mosaic compile")

    def make_step(self, dt: float):
        from ..ops.pallas_adi import build_pallas_adi_fused_step, build_pallas_adi_step

        try:
            return self._try_separable(dt, as_aux=False)
        except ValueError:
            pass
        try:
            return build_pallas_adi_fused_step(
                self._op, dt, self.dtype, interpret=self._interpret,
                tile=self._tile, chunks=self._chunks, coupled=self._coupled,
            )
        except ValueError:
            return build_pallas_adi_step(
                self._op, dt, self.dtype, interpret=self._interpret
            )

    def make_step_aux(self, dt: float):
        """Geometry planes as jit-boundary ARGUMENTS, not closure constants.

        Over the remote-TPU tunnel every closed-over device array costs a
        host round-trip fetch at ``.lower()`` time (minutes per compile at
        1024²-class planes); the aux form compiles in seconds.
        """
        from ..ops.pallas_adi import build_pallas_adi_fused_step

        try:
            return self._try_separable(dt, as_aux=True)
        except ValueError:
            pass
        try:
            fn, aux = build_pallas_adi_fused_step(
                self._op, dt, self.dtype, as_aux=True, interpret=self._interpret,
                tile=self._tile, chunks=self._chunks, coupled=self._coupled,
            )
            self._probe_kernel_compile(
                "fused", fn, aux, (self._tile, self._chunks, self._coupled)
            )
            return fn, aux
        except ValueError:
            pass
        if not self._coupled and self._tile is None and self._chunks is None:
            # the standalone wide-tile auto config OOMed scoped VMEM on
            # this libtpu (first seen 2026-08-21: 22.12 MB at 1024²×16) —
            # retry with the conservative coupled budget (tile 128 / K=32
            # at 1024-class extents) before surrendering to the XLA path
            try:
                fn, aux = build_pallas_adi_fused_step(
                    self._op, dt, self.dtype, as_aux=True,
                    interpret=self._interpret, coupled=True,
                )
                self._probe_kernel_compile("fused", fn, aux, (None, None, True))
                return fn, aux
            except ValueError:
                pass
        return super().make_step_aux(dt)


def _pallas_adi_ok(dtype) -> str | None:
    """None when the Pallas ADI backend can run here, else the reason."""
    if jax.default_backend() != "tpu":
        return "the Pallas ADI backend requires a TPU backend"
    if jnp.dtype(dtype) != jnp.float32:
        return "the Pallas ADI backend requires float32 (TPU Pallas has no f64)"
    return None


def choose_backend(op: SplitOperator, dtype, preference: str = "auto", *, coupled: bool = False):
    """Pick a diffusion backend: 'dense', 'adi', 'wang', 'cg', 'pallas', or 'auto'.

    ``coupled=True`` means the step will be composed with collision kernels
    in one compiled program — the Pallas ADI backend then uses its
    conservative lane-tile budget (the 2026-08 libtpu charges the wide-tile
    config ~130 KB over the 16 MB scoped-VMEM limit in that context while
    standalone it fits).
    """
    if preference == "dense":
        return DenseSpectralDiffusion(op, dtype)
    if preference == "adi":
        return ADIDiffusion(op, dtype)
    if preference == "wang":
        return PrefactoredWangADI(op, dtype)
    if preference == "cg":
        return CGDiffusion(op, dtype)
    if preference == "pallas":
        reason = _pallas_adi_ok(dtype)
        if reason is not None:
            raise ValueError(f"diffusion_backend='pallas' requested but {reason}")
        return PallasADI(op, dtype, coupled=coupled)
    if preference != "auto":
        raise ValueError(f"Unknown diffusion backend: {preference!r}")
    n_cells = int(np.asarray(op.mask, dtype=bool).sum())
    if n_cells <= DENSE_BACKEND_MAX_CELLS:
        return DenseSpectralDiffusion(op, dtype)
    if _pallas_adi_ok(dtype) is None and min(op.mask.shape) >= 8:
        # Degenerate/1D grids stay on XLA ADI: the Pallas solve pads the
        # short axis to full 128-lane tiles (~128x wasted work on a 1xN
        # wire), and a long wire's single-tile working set (5 line blocks +
        # 4 Wang scratch buffers) presses against the 16 MB VMEM budget.
        return PallasADI(op, dtype, coupled=coupled)
    # NOTE: PrefactoredWangADI stays out of 'auto': on v5e at 1024²×16 its
    # factor-array traffic (10 full-size reads/step) costs more than the
    # coefficient eliminations it saves, because the uniform-gap operators
    # broadcast from (1, Ny, Nx) and are nearly free to re-eliminate
    # (measured 15.1 vs 14.4 ms/step on the full coupled step).
    return ADIDiffusion(op, dtype)
