"""On-chip ensemble sweeps: vmap over simulation parameters.

The reference runs one simulation per process; on TPU a parameter sweep
(e.g. 32 diffusion coefficients, or 32 pulse energies) is a single vmapped
program — the MXU sees a 32× larger batch for free.  Combined with the
``ensemble`` mesh axis this scales sweeps across chips with zero hot-loop
communication.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.mask import extract_edge_segments
from ..models.params import BoundaryCondition
from ..ops.diffusion import build_directional_stencils, fold_diffusion
from ..ops.tridiag import tridiag_solve, tridiag_solve_along

__all__ = [
    "build_diffusion_sweep_step",
    "sweep_diffusion_decay",
    "FilmEnsemble",
    "build_film_ensemble",
]


def build_diffusion_sweep_step(
    mask: np.ndarray,
    edges,
    edge_conditions: dict[str, BoundaryCondition],
    dx: float,
    dt: float,
    dtype=jnp.float32,
) -> Callable:
    """Return ``step(states, D_values)`` vmapped over ensemble members.

    ``states``: (B, NB, Ny, Nx); ``D_values``: (B,) member diffusion
    coefficients.  One Peaceman–Rachford step per call; the D-scaling is
    applied inside the vmap so every member shares the same unscaled stencil
    arrays (read once from HBM).
    """
    x_st, y_st = build_directional_stencils(mask, edges, edge_conditions, dx)
    unit = fold_diffusion(x_st, y_st, mask, dx, 1.0)
    ax_lo = jnp.asarray(unit.ax_lo, dtype=dtype)
    ax_hi = jnp.asarray(unit.ax_hi, dtype=dtype)
    ax_diag = jnp.asarray(unit.ax_diag, dtype=dtype)
    ay_lo = jnp.asarray(unit.ay_lo, dtype=dtype)
    ay_hi = jnp.asarray(unit.ay_hi, dtype=dtype)
    ay_diag = jnp.asarray(unit.ay_diag, dtype=dtype)
    src = jnp.asarray(unit.source_total(), dtype=dtype)
    alpha0 = 0.5 * float(dt)

    def apply_dir(u, a_lo, a_hi, diag, axis):
        return (
            a_lo * jnp.roll(u, 1, axis=axis)
            + a_hi * jnp.roll(u, -1, axis=axis)
            + diag * u
        )

    def one_member(u, d_val):
        a = alpha0 * d_val
        rhs = u + a * apply_dir(u, ay_lo, ay_hi, ay_diag, -2) + alpha0 * d_val * src
        u_star = tridiag_solve(
            jnp.broadcast_to(-a * ax_lo, rhs.shape),
            jnp.broadcast_to(1.0 - a * ax_diag, rhs.shape),
            jnp.broadcast_to(-a * ax_hi, rhs.shape),
            rhs,
        )
        rhs2 = u_star + a * apply_dir(u_star, ax_lo, ax_hi, ax_diag, -1) + alpha0 * d_val * src
        return tridiag_solve_along(
            -2,
            jnp.broadcast_to(-a * ay_lo, rhs2.shape),
            jnp.broadcast_to(1.0 - a * ay_diag, rhs2.shape),
            jnp.broadcast_to(-a * ay_hi, rhs2.shape),
            rhs2,
        )

    return jax.jit(jax.vmap(one_member, in_axes=(0, 0)))


def sweep_diffusion_decay(
    width: int = 64,
    height: int = 32,
    D_values: np.ndarray | None = None,
    steps: int = 50,
    dt: float = 0.05,
    dtype=jnp.float32,
) -> np.ndarray:
    """Convenience sweep: peak decay curves for a batch of D values.

    Returns (B, steps+1) center-pixel traces — the vmapped analogue of
    running the reference B times.
    """
    if D_values is None:
        D_values = np.linspace(1.0, 8.0, 8)
    mask = np.ones((height, width), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    step = build_diffusion_sweep_step(mask, edges, bcs, 1.0, dt, dtype)
    b = len(D_values)
    states = np.zeros((b, 1, height, width), dtype=np.float64)
    states[:, 0, height // 2, width // 2] = 1.0
    u = jnp.asarray(states, dtype=dtype)
    d = jnp.asarray(np.asarray(D_values), dtype=dtype)
    traces = [np.asarray(u[:, 0, height // 2, width // 2])]
    for _ in range(steps):
        u = step(u, d)
        traces.append(np.asarray(u[:, 0, height // 2, width // 2]))
    return np.stack(traces, axis=1)


# ---------------------------------------------------------------------------
# film ensembles: B independent films as one masked super-grid
# ---------------------------------------------------------------------------
#
# An ensemble of B identical-geometry films stacked along y IS a single
# masked film whose members are disconnected components: the directional
# stencils already zero couplings across member boundaries (each member has
# its own boundary faces), so the ordinary single-chip step — diffusion,
# collisions, Pallas kernels — batches the whole sweep with no new machinery.
# Per-member collision parameters (τ_s, τ_r) ride the same unique-kernel
# mechanism used for non-uniform gaps: member id → kernel stack index.

from dataclasses import dataclass as _dataclass

from ..ops.collisions import build_collision_plan_arrays, make_collision_step
from ..ops.dos import (
    diffusion_coefficient_of_energy,
    dynes_density_of_states,
    thermal_phonon_occupation,
)
from ..ops.energy_grid import build_energy_grid
from ..ops.kernels import recombination_kernel_base, scattering_kernel_base
from ..ops.phonon_map import build_phonon_frequency_map
from ..solver.diffusion_backends import ADIDiffusion


@_dataclass
class FilmEnsemble:
    """A B-member sweep materialised as one super-grid simulation step.

    The super-grid stacks members along y with one masked-off separator row
    between them (member m occupies rows [m·(ny+1), m·(ny+1)+ny)).
    """

    step: Callable  # (q, ph) -> (q, ph)
    n_members: int
    member_shape: tuple[int, int]
    super_shape: tuple[int, int]
    num_energy_bins: int
    num_omega: int
    E_bins: np.ndarray
    omega_bins: np.ndarray
    dE: float
    dt: float = 0.0
    gaps: np.ndarray | None = None  # (B,) per-member Δ (photon-drive chunks)
    dynes_gamma: float = 0.0

    @property
    def _stride(self) -> int:
        return self.member_shape[0] + 1

    def _member_rows(self, m: int) -> slice:
        return slice(m * self._stride, m * self._stride + self.member_shape[0])

    def pack(self, q_members: np.ndarray, ph_members: np.ndarray):
        """(B, NE, ny, nx), (B, NW, ny, nx) → super-grid (NE, Y, nx), (NW, Y, nx)."""
        ne = q_members.shape[1]
        nw = ph_members.shape[1]
        q = np.zeros((ne, *self.super_shape), dtype=np.float64)
        ph = np.zeros((nw, *self.super_shape), dtype=np.float64)
        for m in range(self.n_members):
            q[:, self._member_rows(m), :] = q_members[m]
            ph[:, self._member_rows(m), :] = ph_members[m]
        return q, ph

    def unpack(self, q, ph):
        q = np.asarray(q)
        ph = np.asarray(ph)
        qm = np.stack([q[:, self._member_rows(m), :] for m in range(self.n_members)])
        pm_ = np.stack([ph[:, self._member_rows(m), :] for m in range(self.n_members)])
        return qm, pm_

    def thermal_phonons(self, bath_temperatures: np.ndarray) -> np.ndarray:
        """(B,) bath temperatures → (B, NW, ny, nx) thermal member states."""
        ny, nx = self.member_shape
        out = np.empty((self.n_members, self.num_omega, ny, nx))
        for m, t in enumerate(np.asarray(bath_temperatures)):
            out[m] = thermal_phonon_occupation(self.omega_bins, float(t))[:, None, None]
        return out

    def generation_plane(self, rates: np.ndarray) -> np.ndarray:
        """(B,) per-member injection rates → a (Y, nx) super-grid plane
        (zeros on the separator rows) for :meth:`make_chunk`."""
        out = np.zeros(self.super_shape, dtype=np.float64)
        for m, r in enumerate(np.broadcast_to(np.asarray(rates), (self.n_members,))):
            out[self._member_rows(m), :] = float(r)
        return out

    def make_chunk(
        self,
        n_steps: int,
        *,
        unroll: int = 8,
        gen_plane: np.ndarray | None = None,
        pulse_window: tuple[float, float] | None = None,
        photon=None,
        photon_occupancy: np.ndarray | None = None,
        photon_coupling: np.ndarray | None = None,
    ):
        """Jitted chunk advancing n_steps with an unrolled scan — amortizes
        the TPU while-loop back-edge cost on big carries.

        With ``gen_plane`` (a (Y, nx) per-pixel rate plane, see
        :meth:`generation_plane`) each step injects dt·g forward-Euler
        before the Strang step (the reference's external-generation
        contract, solver.py:1459-1464) — e.g. a per-member pulse-energy
        sweep.  ``pulse_window=(start, duration)`` gates the source in
        time; ``start``/``duration`` may be scalars or (B,) arrays for
        per-member photon arrival times.  The returned chunk then takes
        ``(q, ph, t0_ns)`` and all planes ride the jit boundary as
        arguments (never baked constants).  With a ``pulse_window`` the
        start time is REQUIRED — chaining chunks with an implicit t0=0
        would silently re-fire the pulse at the start of every chunk.
        Without ``gen_plane`` the chunk is ``(q, ph)`` as before.

        ``photon=PhotonDriveSpec(...)`` adds the Fischer-2024 photon-drive
        substep after the generation add (the engine's operator order);
        ``photon_occupancy`` / ``photon_coupling`` are optional (B,)
        per-member overrides riding as n̄/weight planes — a Q-vs-n̄
        calibration curve becomes ONE compiled ensemble step.  Per-member
        gaps use the Δ²-affine per-pixel substep automatically.  A windowed
        drive requires the absolute chunk start time like ``pulse_window``.
        """
        step = self.step

        if photon is None and (
            photon_occupancy is not None or photon_coupling is not None
        ):
            raise ValueError(
                "photon_occupancy/photon_coupling need photon=PhotonDriveSpec"
            )

        if gen_plane is None and photon is None:
            if pulse_window is not None:
                raise ValueError("pulse_window requires gen_plane (the rate plane)")

            @jax.jit
            def chunk(q, ph):
                def body(carry, _):
                    return step(*carry), None

                return jax.lax.scan(
                    body, (q, ph), None, length=n_steps, unroll=min(unroll, n_steps)
                )[0]

            return chunk

        if not self.dt:
            raise ValueError("generation chunks need the ensemble dt (build_film_ensemble sets it)")
        dt = float(self.dt)
        b = self.n_members

        gp_host = None if gen_plane is None else np.asarray(gen_plane, dtype=np.float64)
        if pulse_window is not None:
            if gp_host is None:
                raise ValueError("pulse_window requires gen_plane (the rate plane)")
            # scalars or (B,) per-member windows, broadcast to planes so the
            # gate is a per-pixel compare (members fire at their own times)
            starts = np.broadcast_to(
                np.asarray(pulse_window[0], np.float64), (self.n_members,)
            )
            durations = np.broadcast_to(
                np.asarray(pulse_window[1], np.float64), (self.n_members,)
            )
            start_host = self.generation_plane(starts)
            end_host = self.generation_plane(starts + durations)
        else:
            start_host = end_host = None

        # --- photon drive (Fischer 2024): build the plan host-side once ---
        ph_window = None
        ph_plan = None
        ph_weight_host = ph_nbar_host = ph_delta2_host = ph_rho_host = None
        ph_per_pixel = False
        if photon is not None:
            if isinstance(photon, (list, tuple)):
                raise ValueError(
                    "multi-tone photon drives are not supported on the "
                    "ensemble path; pass one PhotonDriveSpec (chain chunks "
                    "for sequential tones)"
                )
            photon.validate()
            if not photon.enabled:
                raise ValueError("photon spec has mode='none' — pass None instead")
            if self.gaps is None:
                raise ValueError("this FilmEnsemble predates photon support")
            coup = np.broadcast_to(
                np.asarray(
                    photon.coupling if photon_coupling is None else photon_coupling,
                    np.float64,
                ),
                (b,),
            )
            # the weight plane carries the (per-member) coupling c; the
            # plans below are built with coupling=1 so rate = amp·weight
            ph_weight_host = self.generation_plane(coup)
            if photon_occupancy is not None:
                ph_nbar_host = self.generation_plane(
                    np.broadcast_to(np.asarray(photon_occupancy, np.float64), (b,))
                )
            gaps = self.gaps
            ph_per_pixel = not bool(np.all(gaps == gaps[0]))
            if ph_per_pixel:
                from ..ops.photon_drive import build_photon_drive_plan_analytic

                ph_plan = build_photon_drive_plan_analytic(
                    E_bins=self.E_bins,
                    dE=self.dE,
                    omega=photon.photon_energy,
                    coupling=1.0,
                    occupancy=float(photon.occupancy),
                    include_scattering=photon.include_scattering,
                    include_pair_breaking=photon.include_pair_breaking,
                )
                ph_delta2_host = self.generation_plane(gaps**2)
                ph_rho_host = np.zeros(
                    (self.num_energy_bins, *self.super_shape), dtype=np.float64
                )
                for m, g in enumerate(gaps):
                    ph_rho_host[:, self._member_rows(m), :] = dynes_density_of_states(
                        self.E_bins, float(g), self.dynes_gamma
                    )[:, None, None]
            else:
                from ..ops.photon_drive import build_photon_drive_plan

                ph_plan = build_photon_drive_plan(
                    E_bins=self.E_bins,
                    dE=self.dE,
                    gap=float(gaps[0]),
                    rho=dynes_density_of_states(
                        self.E_bins, float(gaps[0]), self.dynes_gamma
                    ),
                    omega=photon.photon_energy,
                    coupling=1.0,
                    occupancy=float(photon.occupancy),
                    include_scattering=photon.include_scattering,
                    include_pair_breaking=photon.include_pair_breaking,
                )
            if photon.window_start is not None:
                ph_window = (
                    float(photon.window_start),
                    float(photon.window_start) + float(photon.window_duration),
                )

        needs_t0 = start_host is not None or ph_window is not None

        def build_chunk(key):
            """Per-dtype jitted chunk (the photon substeps bake the dtype)."""
            psub = None
            if ph_plan is not None:
                if ph_per_pixel:
                    from ..ops.photon_drive import make_photon_substep_per_pixel

                    psub = make_photon_substep_per_pixel(ph_plan, dt, key)
                else:
                    from ..ops.photon_drive import make_photon_substep

                    psub = make_photon_substep(ph_plan, dt, key)

            @jax.jit
            def chunk_gen(q, ph, t0, gpa, windows, ph_planes):
                def body(carry, k):
                    q, ph = carry
                    t = t0 + k.astype(q.dtype) * dt
                    if gpa is not None:
                        if windows is not None:
                            sp, ep = windows
                            amp = jnp.where((t >= sp) & (t < ep), dt, 0.0)
                        else:
                            amp = dt
                        q = q + amp * gpa
                    if psub is not None:
                        if ph_window is None:
                            pamp = jnp.asarray(1.0, q.dtype)
                        else:
                            pamp = (
                                (t >= ph_window[0]) & (t < ph_window[1])
                            ).astype(q.dtype)
                        weight, nbar, extra = ph_planes
                        q = psub(q, pamp, weight, *extra, nbar=nbar)
                    return step(q, ph), None

                return jax.lax.scan(
                    body, (q, ph), jnp.arange(n_steps), unroll=min(unroll, n_steps)
                )[0]

            return chunk_gen

        by_dtype: dict = {}  # (jitted chunk, uploaded planes) once per dtype

        def run(q, ph, t0=None):
            if t0 is None:
                if needs_t0:
                    raise TypeError(
                        "this chunk gates a time window: pass its absolute start "
                        "time, chunk(q, ph, t0_ns) — an implicit t0=0 would "
                        "re-fire the window at the start of every chained chunk"
                    )
                t0 = 0.0
            key = jnp.dtype(q.dtype)
            if key not in by_dtype:
                gpa = None if gp_host is None else jnp.asarray(gp_host, dtype=key)
                windows = (
                    None
                    if start_host is None
                    else (
                        jnp.asarray(start_host, dtype=key),
                        jnp.asarray(end_host, dtype=key),
                    )
                )
                extra = (
                    (
                        jnp.asarray(ph_delta2_host, dtype=key),
                        jnp.asarray(ph_rho_host, dtype=key),
                    )
                    if ph_per_pixel
                    else ()
                )
                ph_planes = (
                    None if ph_weight_host is None else jnp.asarray(ph_weight_host, dtype=key),
                    None if ph_nbar_host is None else jnp.asarray(ph_nbar_host, dtype=key),
                    extra,
                )
                by_dtype[key] = (build_chunk(key), (gpa, windows, ph_planes))
            chunk_gen, (gpa, windows, ph_planes) = by_dtype[key]
            return chunk_gen(q, ph, jnp.asarray(t0, dtype=key), gpa, windows, ph_planes)

        return run


def build_film_ensemble(
    *,
    n_members: int,
    member_shape: tuple[int, int] = (64, 64),
    gap: np.ndarray | float = 180.0,
    num_energy_bins: int = 8,
    energy_max_factor: float = 4.0,
    D0: float = 6.0,
    tau_s: np.ndarray | float = 440.0,
    tau_r: np.ndarray | float = 440.0,
    T_c: float = 1.2,
    dt: float = 0.05,
    dtype=jnp.float32,
    dynes_gamma: float = 0.0,
) -> FilmEnsemble:
    """Build a Strang step over a B-member film ensemble (reflective walls).

    ``tau_s``/``tau_r``/``gap`` may be scalars or (B,) arrays — per-member
    values become per-member physics: collision times via per-member kernel
    stacks selected by a member-id plane; per-member gaps (film-to-film Δ
    variation) via the analytic-gap Pallas kernel and per-member variable-D
    diffusion.  The energy grid is built once from the largest member gap so
    every bin sits above every member's gap.
    """
    ny, nx = member_shape
    b = int(n_members)
    tau_s = np.broadcast_to(np.asarray(tau_s, dtype=np.float64), (b,))
    tau_r = np.broadcast_to(np.asarray(tau_r, dtype=np.float64), (b,))
    gaps = np.broadcast_to(np.asarray(gap, dtype=np.float64), (b,))
    gaps_vary = not bool(np.all(gaps == gaps[0]))
    gap_nom = float(gaps.max())

    # members stacked along y with one masked-off separator row between them
    gapped = np.zeros(((ny + 1) * b - 1, nx), dtype=bool)
    for m in range(b):
        gapped[m * (ny + 1) : m * (ny + 1) + ny, :] = True
    edges = extract_edge_segments(gapped)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}

    E_bins, dE = build_energy_grid(gap_nom, 1.0, energy_max_factor, num_energy_bins)
    pmap = build_phonon_frequency_map(E_bins)
    rho = dynes_density_of_states(E_bins, gap_nom, dynes_gamma)

    x_st, y_st = build_directional_stencils(gapped, edges, bcs, 1.0)
    if gaps_vary:
        # per-member D(E, Δ_m): per-bin planes, harmonic-mean interfaces
        gap_plane = np.full(gapped.shape, gap_nom)
        for m in range(b):
            gap_plane[m * (ny + 1) : m * (ny + 1) + ny, :] = gaps[m]
        D_dense = np.stack(
            [
                D0 * np.sqrt(np.maximum(0.0, 1.0 - (gap_plane / e) ** 2))
                for e in E_bins
            ]
        )
        op = fold_diffusion(x_st, y_st, gapped, 1.0, D_dense)
    else:
        op = fold_diffusion(
            x_st, y_st, gapped, 1.0, diffusion_coefficient_of_energy(D0, E_bins, gap_nom)
        )
    diff = ADIDiffusion(op, dtype=dtype).make_step(dt)

    uniform_taus = bool(np.all(tau_s == tau_s[0]) and np.all(tau_r == tau_r[0]))
    interpret = jax.default_backend() != "tpu"
    # Mosaic has no practical f64 support — x64 ensembles forced onto TPU
    # stay on the XLA integrator (same guard as engine.py / sharded.py)
    pallas_ok = jnp.dtype(dtype) != jnp.float64 or interpret
    col_half = None
    if pallas_ok and gaps_vary and uniform_taus:
        # per-member gaps: exact per-pixel kernels from the Δ² plane
        from ..ops.pallas_collisions import build_pallas_collision_step_analytic

        col_half = build_pallas_collision_step_analytic(
            E_bins=E_bins,
            dE=dE,
            gap_plane=gap_plane,
            pmap=pmap,
            dt=0.5 * dt,
            tau_s=float(tau_s[0]),
            tau_r=float(tau_r[0]),
            T_c=T_c,
            dynes_gamma=dynes_gamma,
            update_phonons=True,
            interpret=interpret,
        )
    elif pallas_ok and uniform_taus:
        # identical member kernels: the Pallas collision kernel applies
        from ..ops.pallas_collisions import build_pallas_collision_step

        col_half = build_pallas_collision_step(
            E_bins=E_bins,
            dE=dE,
            rho=rho,
            K_s0=scattering_kernel_base(E_bins, gap_nom, float(tau_s[0]), T_c),
            K_r0=recombination_kernel_base(E_bins, gap_nom, float(tau_r[0]), T_c),
            pmap=pmap,
            dt=0.5 * dt,
            update_phonons=True,
            interpret=interpret,
        )
    if col_half is None:
        # per-member (gap, τ) kernel stacks selected by the member-id plane
        member_id = np.zeros(gapped.shape, dtype=np.int32)
        for m in range(b):
            member_id[m * (ny + 1) : m * (ny + 1) + ny, :] = m
        plan = build_collision_plan_arrays(
            dE=dE,
            rho_by_gap=np.stack(
                [dynes_density_of_states(E_bins, float(g), dynes_gamma) for g in gaps]
            ),
            K_r0_by_gap=np.stack(
                [
                    recombination_kernel_base(E_bins, float(g), float(t), T_c)
                    for g, t in zip(gaps, tau_r)
                ]
            ),
            K_s0_by_gap=np.stack(
                [
                    scattering_kernel_base(E_bins, float(g), float(t), T_c)
                    for g, t in zip(gaps, tau_s)
                ]
            ),
            gap_id=member_id,
            pmap=pmap,
            enable_recombination=True,
            enable_scattering=True,
            update_phonons=True,
            dtype=dtype,
            pixel_chunk=gapped.size,
        )
        col_half = make_collision_step(plan, 0.5 * dt)

    def step(q, ph):
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return q, ph

    return FilmEnsemble(
        step=step,
        n_members=b,
        member_shape=(ny, nx),
        super_shape=gapped.shape,
        num_energy_bins=num_energy_bins,
        num_omega=pmap.num_omega,
        E_bins=E_bins,
        omega_bins=pmap.omega_bins,
        dE=dE,
        dt=float(dt),
        gaps=gaps,
        dynes_gamma=float(dynes_gamma),
    )
