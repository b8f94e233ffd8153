"""Differentiable simulation: gradients through the solver.

A capability the reference cannot offer: because the whole time step is
traced JAX, observables are differentiable with respect to physical
parameters — enabling gradient-based fitting of D₀, τₛ, τᵣ, pulse energies
etc. against measured decay curves (the standard MKID analysis task).

``make_differentiable_sim`` builds a pure function ``params -> observables``
over an **arbitrary masked 2D geometry** with per-edge boundary conditions,
where ``params = {"D0", "tau_s", "tau_r"[, "gap"]}`` are traced scalars: the
diffusion coefficients and collision kernels are reconstructed *inside* the
trace (K ∝ 1/τ, D(E) = D₀√(1−(Δ/E)²)), so ``jax.grad`` / ``jax.jacfwd``
flow end-to-end through the Strang-split integrator.  The optional ``gap``
parameter makes the superconducting gap Δ itself differentiable — the BCS
DOS, both collision kernels (affine in Δ²) and D(E) are rebuilt from Δ in
the trace, enabling gradient-based gap extraction from decay curves (the
energy grid and the initial state stay at the nominal construction-time
gap: fixed discretization, varying physics).  Observables:

* ``"total"``   — (n_steps+1,) energy-integrated QP number trace;
* ``"spatial"`` — (n_stored, Ny, Nx) energy-integrated density frames
  (zero outside the mask), every ``store_every`` steps;
* ``"mkid"``    — differentiable readout traces ``mkid_df``/``mkid_dq``
  (δf/f and δ(1/Q) via the traced Mattis–Bardeen integrals,
  ``mkid_readout_ghz=``/``mkid_alpha=``) — fit measured pulses directly;
* ``"phonon_spectrum"`` — (NW,) final phonon occupation per ω bin, summed
  over pixels;
* ``"phonon_total"`` — (n_steps+1,) total phonon occupation trace.

Uses the XLA collision path (the Pallas kernel has no VJP) and ADI
diffusion with on-the-fly coefficients.  ``make_differentiable_decay`` is
the 1D-wire total-trace convenience wrapper; ``fit_parameters`` fits one
curve and ``fit_ensemble`` fits a whole batch of curves at once (vmapped
loss, independent per-member parameters).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .constants import K_B_UEV_PER_K
from .geometry.mask import extract_edge_segments
from .models.params import BoundaryCondition
from .ops.dos import dynes_density_of_states, thermal_phonon_occupation
from .ops.energy_grid import build_energy_grid
from .ops.phonon_map import build_phonon_frequency_map
from .ops.diffusion import build_directional_stencils, fold_diffusion
from .ops.tridiag import tridiag_solve, tridiag_solve_along

__all__ = [
    "make_differentiable_sim",
    "make_differentiable_decay",
    "fit_parameters",
    "fit_ensemble",
]

_OBSERVABLES = ("total", "spatial", "phonon_spectrum", "phonon_total", "mkid")


def _traced_kernels(E: jnp.ndarray, gap: float, T_c: float):
    """Base collision kernels as traced functions of 1/τ (K ∝ 1/τ)."""
    kTc = K_B_UEV_PER_K * T_c
    e_sum = E[:, None] + E[None, :]
    e_diff = E[:, None] - E[None, :]
    e_prod = jnp.maximum(E[:, None] * E[None, :], 1e-30)
    kr_shape = (e_sum / kTc) ** 2 / kTc * (1.0 + gap**2 / e_prod)
    ks_shape = e_diff**2 / kTc**3 * jnp.maximum(1.0 - gap**2 / e_prod, 0.0)
    ks_shape = ks_shape * (1.0 - jnp.eye(E.shape[0]))
    return kr_shape, ks_shape


def make_differentiable_sim(
    *,
    mask: np.ndarray | None = None,
    edges: list | None = None,
    edge_conditions: dict | None = None,
    nx: int = 64,
    gap: float = 180.0,
    num_energy_bins: int = 8,
    energy_max_factor: float = 4.0,
    T_c: float = 1.2,
    bath_temperature: float = 0.2,
    dt: float = 0.05,
    n_steps: int = 40,
    n0: float = 1e-4,
    initial_field: np.ndarray | None = None,
    dtype=jnp.float64,
    phonon_feedback: bool = True,
    observables: tuple[str, ...] = ("total",),
    store_every: int = 1,
    pulse_window: tuple[float, float] | None = None,
    photon_omega: float | None = None,
    photon_window: tuple[float, float] | None = None,
    remat: bool = True,
    remat_chunk: int | None = None,
    mkid_readout_ghz: float = 5.0,
    mkid_alpha: float = 1.0,
) -> Callable:
    """Build ``sim(params) -> {observable: array}`` on a masked 2D geometry.

    ``params``: dict with traced scalars ``D0``, ``tau_s``, ``tau_r``
    (optionally ``gap``, and — with ``pulse_window=(start, duration)`` —
    ``pulse_rate``: a window-gated uniform forward-Euler source at the
    reference's per-step contract, so photon pulse energy becomes a
    differentiable parameter to fit).

    ``photon_omega`` (µeV) enables the Fischer-2024 photon drive
    (``ops/photon_drive.py``) with TRACED ``photon_coupling`` and
    ``photon_occupancy`` params — the paper's experimental inference
    problem (photon number in the mode from the measured QP response)
    becomes a gradient fit.  ``photon_window=(start, duration)`` gates it
    in time; the pair/offset index structure is grid-snapped at the
    nominal gap (static), the coefficients stay closed-form.
    Defaults to a reflective 1×nx wire when no geometry is given; pass
    ``mask``/``edges``/``edge_conditions`` for arbitrary 2D films with the
    full per-edge boundary-condition set.

    ``phonon_feedback=False`` freezes the bath at thermal occupation — the
    standard "phonons escape to the substrate instantly" modelling limit, in
    which recombination is a true loss channel and decay curves carry strong
    τᵣ sensitivity.  With feedback on (closed film) re-breaking largely
    cancels recombination and total QP number is nearly conserved.

    **Gradient memory** (``remat``, ``remat_chunk``): the backward pass of a
    plain ``lax.scan`` stores every step's intermediates — dominated by the
    (P, NE, NE) pair tensors of the collision contraction, ~P·NE²·8 bytes
    PER STEP (≈130 MB/step on a 64² film at 16 bins), which forbids long 2D
    fits outright.  ``remat=True`` (default) checkpoints the step body, so
    the backward stores only the (q, ph) carries and recomputes one step's
    interior at a time — memory drops from O(n·P·NE²) to O(n·P·(NE+NW)) at
    the cost of one extra forward evaluation per step inside ``grad`` (a
    forward-only call is unaffected).  ``remat_chunk=c`` additionally nests
    the scan two levels (checkpointed chunks of ``c`` steps), storing only
    the ~n/c chunk-boundary carries plus one chunk's carries during its
    recompute — the classic O(√n) memory schedule at ``c ≈ √n`` — for
    fitting 10⁴–10⁵-step traces.  Both variants are bit-identical to the
    plain scan in outputs and agree with its gradients to roundoff.
    """
    for obs in observables:
        if obs not in _OBSERVABLES:
            raise ValueError(f"Unknown observable {obs!r}; pick from {_OBSERVABLES}")
    from .observables import PLANCK_UEV_PER_GHZ

    mkid_hnu = PLANCK_UEV_PER_GHZ * float(mkid_readout_ghz)
    if "mkid" in observables and mkid_hnu >= 2 * gap:
        raise ValueError(
            f"'mkid' observable needs a non-pair-breaking readout: "
            f"hnu = {mkid_hnu:g} µeV >= 2·gap = {2 * gap:g} µeV."
        )
    if mask is None:
        mask = np.ones((1, nx), dtype=bool)
    mask = np.asarray(mask, dtype=bool)
    if edges is None:
        edges = extract_edge_segments(mask)
    if edge_conditions is None:
        edge_conditions = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    ny_g, nx_g = mask.shape
    E_np, dE = build_energy_grid(gap, 1.0, energy_max_factor, num_energy_bins)
    pmap = build_phonon_frequency_map(E_np)
    rho_np = dynes_density_of_states(E_np, gap, 0.0)

    # unit-D stencils; D(E) folds in at trace time so dD/dD0 flows
    x_st, y_st = build_directional_stencils(mask, edges, edge_conditions, 1.0)
    unit = fold_diffusion(x_st, y_st, mask, 1.0, 1.0)
    ax_lo = jnp.asarray(unit.ax_lo, dtype=dtype)
    ax_hi = jnp.asarray(unit.ax_hi, dtype=dtype)
    ax_diag = jnp.asarray(unit.ax_diag, dtype=dtype)
    ay_lo = jnp.asarray(unit.ay_lo, dtype=dtype)
    ay_hi = jnp.asarray(unit.ay_hi, dtype=dtype)
    ay_diag = jnp.asarray(unit.ay_diag, dtype=dtype)
    # boundary source terms (dirichlet g, neumann flux, robin injection);
    # like the couplings they scale linearly with the local D, which folds
    # in at trace time
    src_unit = jnp.asarray(unit.source_total(), dtype=dtype)  # (1, Ny, Nx)

    E = jnp.asarray(E_np, dtype=dtype)
    rho = jnp.asarray(rho_np, dtype=dtype)
    kr_shape, ks_shape = _traced_kernels(E, gap, T_c)
    idx_diff = jnp.asarray(pmap.idx_diff.reshape(-1))
    idx_sum = jnp.asarray(pmap.idx_sum.reshape(-1))
    emit = jnp.asarray((pmap.diff_sign > 0).astype(np.float64), dtype=dtype)
    absorb = jnp.asarray((pmap.diff_sign < 0).astype(np.float64), dtype=dtype)
    scatter_diff = jnp.asarray(pmap.scatter_diff, dtype=dtype)
    scatter_sum = jnp.asarray(pmap.scatter_sum, dtype=dtype)
    nw = pmap.num_omega
    ne = num_energy_bins

    if photon_omega is not None:
        from .ops.photon_drive import (
            _relax as _ph_relax,
            build_photon_drive_plan,
            photon_loss_gain,
            photon_plan_device,
        )

        _ph_plan = build_photon_drive_plan(
            E_bins=E_np, dE=dE, gap=gap, rho=rho_np, omega=float(photon_omega),
            coupling=1.0, occupancy=0.0,
        )
        _ph_dev = photon_plan_device(_ph_plan, dtype)

    ph0_np = np.zeros((nw, ny_g, nx_g))
    ph0_np[:, mask] = thermal_phonon_occupation(pmap.omega_bins, bath_temperature)[:, None]
    ph0 = jnp.asarray(ph0_np, dtype=dtype)
    if initial_field is None:
        field = np.where(mask, n0, 0.0)
    else:
        field = np.where(mask, np.asarray(initial_field, dtype=np.float64), 0.0)
    weights = rho_np / max(1e-30, float(np.sum(rho_np) * dE))
    q0 = jnp.asarray(weights[:, None, None] * field[None], dtype=dtype)
    mask_dev = jnp.asarray(mask)
    n_mask = float(mask.sum())

    def collide(q, ph, K_r0, K_s0, dt_c, rho_c):
        # pixel-batched: q (NE, Ny, Nx), ph (NW, Ny, Nx)
        qT = q.reshape(ne, -1).T  # (P, NE)
        phT = ph.reshape(nw, -1).T  # (P, NW)
        f = qT / jnp.maximum(rho_c[None, :], 1e-30)
        omf = jnp.maximum(1.0 - f, 0.0)
        partner = rho_c[None, :] * omf
        n_diff = jnp.take(phT, idx_diff, axis=-1).reshape(-1, ne, ne)
        n_sum = jnp.take(phT, idx_sum, axis=-1).reshape(-1, ne, ne)
        np_diff = emit * (1.0 + n_diff) + absorb * n_diff
        Ks_eff = K_s0 * np_diff
        # fidelity path: full-f32 contractions (TPU default matmuls are bf16)
        hi = jax.lax.Precision.HIGHEST
        gain = dE * partner * jnp.einsum("cji,cj->ci", Ks_eff, qT, precision=hi)
        loss = dE * jnp.einsum("cij,cj->ci", Ks_eff, partner, precision=hi)
        loss = loss + 2.0 * dE * jnp.einsum("ij,cij,cj->ci", K_r0, 1.0 + n_sum, qT, precision=hi)
        gain = gain + 2.0 * dE * partner * jnp.einsum(
            "ij,cij,cj->ci", K_r0, n_sum, partner, precision=hi
        )
        mu = jnp.maximum(loss, 0.0)
        coeff = jnp.where(mu < 1e-14, dt_c, -jnp.expm1(-mu * dt_c) / jnp.maximum(mu, 1e-14))
        q_new = jnp.maximum(jnp.exp(-mu * dt_c) * qT + coeff * jnp.maximum(gain, 0.0), 0.0)
        base_sc = dE * (qT[:, :, None] * K_s0 * partner[:, None, :])
        mm = lambda a, b: jnp.matmul(a, b, precision=hi)
        e_flat = mm((base_sc * emit).reshape(-1, ne * ne), scatter_diff)
        a_flat = mm((base_sc * absorb).reshape(-1, ne * ne), scatter_diff)
        base_rec = dE * (qT[:, :, None] * K_r0 * qT[:, None, :])
        rec = mm(base_rec.reshape(-1, ne * ne), scatter_sum)
        base_pb = dE * (partner[:, :, None] * K_r0 * partner[:, None, :])
        pb = mm(base_pb.reshape(-1, ne * ne), scatter_sum)
        a_ph = e_flat + rec
        b_ph = e_flat - a_flat + rec - pb
        x = jnp.clip(b_ph * dt_c, -80.0, 80.0)
        safe_b = jnp.where(jnp.abs(b_ph) < 1e-14, 1.0, b_ph)
        cph = jnp.where(jnp.abs(b_ph) < 1e-14, dt_c, jnp.expm1(x) / safe_b)
        ph_new = jnp.maximum(jnp.exp(x) * phT + cph * a_ph, 0.0)
        if not phonon_feedback:
            ph_new = phT
        return q_new.T.reshape(ne, ny_g, nx_g), ph_new.T.reshape(nw, ny_g, nx_g)

    def diffuse(q, D0, dt_d, gap_d):
        # safe-gradient form: the unselected branch is constant, so a
        # traced gap cannot produce NaN grads at the sqrt(0) edge
        inner = 1.0 - (gap_d / E) ** 2
        D_bins = D0 * jnp.where(inner > 0, jnp.sqrt(jnp.maximum(inner, 1e-30)), 0.0)
        D = D_bins[:, None, None]
        alpha = 0.5 * dt_d
        u = q  # (NE, Ny, Nx)
        src = D * src_unit  # boundary sources scale with the local D
        rhs = u + alpha * D * (
            ay_lo * jnp.roll(u, 1, -2) + ay_hi * jnp.roll(u, -1, -2) + ay_diag * u
        ) + alpha * src
        shape = rhs.shape
        u_star = tridiag_solve(
            jnp.broadcast_to(-alpha * D * ax_lo, shape),
            jnp.broadcast_to(1.0 - alpha * D * ax_diag, shape),
            jnp.broadcast_to(-alpha * D * ax_hi, shape),
            rhs,
        )
        rhs2 = u_star + alpha * D * (
            ax_lo * jnp.roll(u_star, 1, -1) + ax_hi * jnp.roll(u_star, -1, -1) + ax_diag * u_star
        ) + alpha * src
        return tridiag_solve_along(
            -2,
            jnp.broadcast_to(-alpha * D * ay_lo, shape),
            jnp.broadcast_to(1.0 - alpha * D * ay_diag, shape),
            jnp.broadcast_to(-alpha * D * ay_hi, shape),
            rhs2,
        )

    want_spatial = "spatial" in observables
    want_mkid = "mkid" in observables

    def sim(params) -> dict[str, jax.Array]:
        D0 = params["D0"]
        if "gap" in params:
            # traced gap: kernels/DOS/D(E) rebuilt from Δ inside the trace so
            # jax.grad flows through the superconducting gap itself (the
            # energy grid and initial state stay at the nominal gap — fixed
            # discretization, varying physics)
            gap_t = params["gap"]
            kr_t, ks_t = _traced_kernels(E, gap_t, T_c)
            rho_t = jnp.where(
                E > gap_t,
                E / jnp.sqrt(jnp.maximum(E**2 - gap_t**2, 1e-30)),
                0.0,
            )
        else:
            gap_t, kr_t, ks_t, rho_t = gap, kr_shape, ks_shape, rho
        K_r0 = kr_t / params["tau_r"]
        K_s0 = ks_t / params["tau_s"]
        if pulse_window is not None:
            start, duration = float(pulse_window[0]), float(pulse_window[1])
            rate = params["pulse_rate"]
        if photon_omega is not None:
            ph_c = params["photon_coupling"]
            ph_nbar = params["photon_occupancy"]

        def photon_substep(q, t):
            # same positivity-preserving exponential relaxation as the
            # engine substep, with traced coupling/occupancy
            qf = q.reshape(ne, -1)
            rho_col = jnp.maximum(rho_t, 1e-30)[:, None]
            f = qf / rho_col
            partner = rho_col * jnp.maximum(1.0 - f, 0.0)
            mu, gain = photon_loss_gain(qf, partner, ph_nbar, _ph_dev)
            if photon_window is not None:
                w0, wd = float(photon_window[0]), float(photon_window[1])
                amp = jnp.where((t >= w0) & (t < w0 + wd), ph_c, 0.0)
            else:
                amp = ph_c
            mu = amp * mu
            out = _ph_relax(qf, mu, partner * (amp * gain), dt)
            # off-mask cells carry q = 0 but partner = ρ > 0 — the mask
            # multiply keeps pair-breaking gains on the film only
            return out.reshape(q.shape) * mask_dev[None]

        def step(state, k):
            q, ph = state
            if pulse_window is not None:
                t = k.astype(q.dtype) * dt
                amp = jnp.where((t >= start) & (t < start + duration), rate, 0.0)
                q = q + (dt * amp) * mask_dev[None]
            if photon_omega is not None:
                q = photon_substep(q, k.astype(q.dtype) * dt)
            q, ph = collide(q, ph, K_r0, K_s0, 0.5 * dt, rho_t)
            q = diffuse(q, D0, dt, gap_t)
            q, ph = collide(q, ph, K_r0, K_s0, 0.5 * dt, rho_t)
            out = (jnp.sum(q) * dE, jnp.sum(ph))
            if want_spatial:
                out = out + (jnp.sum(q, axis=0) * dE,)
            if want_mkid:
                out = out + (jnp.sum(q * mask_dev[None], axis=(1, 2)) / n_mask,)
            return (q, ph), out

        body = jax.checkpoint(step) if remat else step
        if remat and remat_chunk is not None and 1 < remat_chunk < n_steps:
            # two-level O(√n) schedule: the outer scan stores only chunk-
            # boundary carries; each chunk recomputes under its own
            # checkpoint, whose inner steps are themselves checkpointed
            c = int(remat_chunk)
            n_outer, rem = divmod(n_steps, c)
            chunk = jax.checkpoint(lambda s, ks: jax.lax.scan(body, s, ks))
            state, ys = jax.lax.scan(
                chunk, (q0, ph0), jnp.arange(n_outer * c).reshape(n_outer, c)
            )
            ys = jax.tree_util.tree_map(
                lambda y: y.reshape((n_outer * c,) + y.shape[2:]), ys
            )
            if rem:
                state, tail = jax.lax.scan(
                    body, state, jnp.arange(n_outer * c, n_steps)
                )
                ys = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=0), ys, tail
                )
            q_f, ph_f = state
        else:
            (q_f, ph_f), ys = jax.lax.scan(body, (q0, ph0), jnp.arange(n_steps))
        totals, ph_totals = ys[0], ys[1]
        result: dict[str, jax.Array] = {}
        if "total" in observables:
            result["total"] = jnp.concatenate(
                [jnp.array([jnp.sum(q0) * dE], dtype=dtype), totals]
            )
        if "phonon_total" in observables:
            result["phonon_total"] = jnp.concatenate(
                [jnp.array([jnp.sum(ph0)], dtype=dtype), ph_totals]
            )
        if want_spatial:
            frames = ys[2][store_every - 1 :: store_every]
            first = (jnp.sum(q0, axis=0) * dE)[None]
            result["spatial"] = jnp.concatenate([first, frames], axis=0) * mask_dev
        if "phonon_spectrum" in observables:
            result["phonon_spectrum"] = jnp.sum(ph_f, axis=(-2, -1))
        if want_mkid:
            from .observables import mattis_bardeen_conductivity_traced

            nbar = ys[-1]  # (n_steps, NE) masked-mean spectral density
            nbar0 = (jnp.sum(q0 * mask_dev[None], axis=(1, 2)) / n_mask)[None]
            f_tr = jnp.concatenate([nbar0, nbar]) / jnp.maximum(rho_t, 1e-30)
            s1s, s2s = jax.vmap(
                lambda fo: mattis_bardeen_conductivity_traced(
                    fo, E_np, gap_t, mkid_hnu
                )
            )(f_tr)
            result["mkid_df"] = 0.5 * mkid_alpha * (s2s - s2s[0]) / s2s[0]
            result["mkid_dq"] = mkid_alpha * (s1s - s1s[0]) / s2s[0]
        return result

    return sim


def make_differentiable_decay(
    *,
    nx: int = 64,
    gap: float = 180.0,
    num_energy_bins: int = 8,
    energy_max_factor: float = 4.0,
    T_c: float = 1.2,
    bath_temperature: float = 0.2,
    dt: float = 0.05,
    n_steps: int = 40,
    n0: float = 1e-4,
    dtype=jnp.float64,
    phonon_feedback: bool = True,
    remat: bool = True,
    remat_chunk: int | None = None,
) -> Callable:
    """Build ``decay(params) -> (n_steps+1,) total-QP trace`` on a 1D wire.

    Convenience wrapper over :func:`make_differentiable_sim` with the
    ``"total"`` observable only.
    """
    sim = make_differentiable_sim(
        nx=nx,
        gap=gap,
        num_energy_bins=num_energy_bins,
        energy_max_factor=energy_max_factor,
        T_c=T_c,
        bath_temperature=bath_temperature,
        dt=dt,
        n_steps=n_steps,
        n0=n0,
        dtype=dtype,
        phonon_feedback=phonon_feedback,
        observables=("total",),
        remat=remat,
        remat_chunk=remat_chunk,
    )
    return lambda params: sim(params)["total"]


def fit_parameters(
    observed: jnp.ndarray,
    initial_params: dict,
    *,
    decay_fn: Callable,
    learning_rate: float = 0.05,
    n_iters: int = 100,
) -> dict:
    """Fit (log-space) physical parameters to an observed decay curve.

    Plain Adam via optax on ``log params`` (positivity-preserving); returns
    the fitted parameter dict.
    """
    import optax

    log_params = {k: jnp.log(jnp.asarray(v, dtype=jnp.float64)) for k, v in initial_params.items()}

    def loss_fn(lp):
        params = {k: jnp.exp(v) for k, v in lp.items()}
        pred = decay_fn(params)
        return jnp.mean((pred - observed) ** 2 / jnp.maximum(observed, 1e-30) ** 2)

    opt = optax.adam(learning_rate)
    state = opt.init(log_params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(n_iters):
        _, grads = grad_fn(log_params)
        updates, state = opt.update(grads, state)
        log_params = optax.apply_updates(log_params, updates)
    return {k: float(jnp.exp(v)) for k, v in log_params.items()}


def fit_ensemble(
    observed: jnp.ndarray,
    initial_params: dict,
    *,
    decay_fn: Callable,
    learning_rate: float = 0.05,
    n_iters: int = 100,
) -> dict:
    """Fit a batch of decay curves at once (one parameter set per member).

    ``observed`` is (B, n_steps+1); each value in ``initial_params`` is a
    (B,) array.  The loss vmaps ``decay_fn`` over the batch and sums the
    per-member relative errors — members' gradients are independent, so this
    is B simultaneous fits in one optimizer at on-chip batch throughput.
    Returns {name: (B,) fitted values}.
    """
    import optax

    observed = jnp.asarray(observed, dtype=jnp.float64)
    log_params = {
        k: jnp.log(jnp.asarray(v, dtype=jnp.float64)) for k, v in initial_params.items()
    }

    def member_loss(lp_member, obs):
        params = {k: jnp.exp(v) for k, v in lp_member.items()}
        pred = decay_fn(params)
        return jnp.mean((pred - obs) ** 2 / jnp.maximum(obs, 1e-30) ** 2)

    def loss_fn(lp):
        losses = jax.vmap(member_loss)(lp, observed)
        return jnp.sum(losses)

    opt = optax.adam(learning_rate)
    state = opt.init(log_params)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(n_iters):
        _, grads = grad_fn(log_params)
        updates, state = opt.update(grads, state)
        log_params = optax.apply_updates(log_params, updates)
    return {k: np.exp(np.asarray(v)) for k, v in log_params.items()}
