"""Multi-chip spatially-sharded simulation step (shard_map + ICI collectives).

The single-chip step (``qpsim_tpu.solver.engine``) becomes multi-chip by
sharding the dense state ``(NE, Ny, Nx)`` by **rows** over the mesh's
``space`` axis:

* collisions are pixel-local → no communication;
* the explicit Ly application needs a **one-row halo** from each neighbour
  (``lax.ppermute``);
* the implicit y-sweep of Peaceman–Rachford ADI needs whole columns → a
  **pencil transpose** (``lax.all_to_all``: rows-sharded → cols-sharded),
  solve locally, transpose back;
* the x-sweep is fully local (rows are complete in x);
* mass / Pauli diagnostics reduce with ``psum``.

This is the TPU-native replacement for a distributed sparse solver: two all_to_alls
and two ppermutes per step, all riding ICI, everything else local compute.
Strang composition matches the single-chip engine.  Non-uniform gap maps are
supported: the dense Δ plane (or its gap-id plane) rides shard_map as a
rows-sharded argument — on TPU the analytic-gap Pallas kernel consumes each
shard's Δ² slice directly, elsewhere the XLA gather integrator takes the
shard's gap ids at call time — and variable-D diffusion uses the per-bin
coefficient planes, which shard exactly like the state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.collisions import CollisionPlan, build_collision_plan_arrays, make_collision_step
from ..ops.diffusion import SplitOperator
from ..ops.phonon_map import PhononFrequencyMap
from ..ops.tridiag import (
    tridiag_solve,
    tridiag_solve_along,
    wang_apply_interface,
    wang_apply_rhs,
    wang_eliminate,
    wang_externals,
    wang_interface_sweep,
)
from .mesh import SPACE_AXIS

__all__ = ["ShardedStep", "build_sharded_step"]


def _halo_apply_y(u, a_lo, a_hi, diag, axis_name):
    """L_y u on a rows-sharded block, exchanging one halo row each way."""
    n_shards = jax.lax.axis_size(axis_name)
    # row above our first row lives on the previous shard's last row
    from_above = jax.lax.ppermute(
        u[:, -1:, :], axis_name, perm=[(i, i + 1) for i in range(n_shards - 1)]
    )
    from_below = jax.lax.ppermute(
        u[:, :1, :], axis_name, perm=[(i + 1, i) for i in range(n_shards - 1)]
    )
    u_prev = jnp.concatenate([from_above, u[:, :-1, :]], axis=1)
    u_next = jnp.concatenate([u[:, 1:, :], from_below], axis=1)
    return a_lo * u_prev + a_hi * u_next + diag * u


def _apply_x(u, a_lo, a_hi, diag):
    u_prev = jnp.roll(u, 1, axis=-1)
    u_next = jnp.roll(u, -1, axis=-1)
    return a_lo * u_prev + a_hi * u_next + diag * u


def _wang_solve_y(rhs, ay_lo, ay_hi, ay_diag, alpha, axis_name):
    """Distributed Wang-partition solve of (I − α·L_y) x = rhs along GLOBAL y.

    Each shard is one Wang partition (the same math as
    ``ops.tridiag.tridiag_solve_wang`` with chunk = local rows, K = n_shards,
    partitions living on different chips): two local elimination scans
    express every unknown as x_i = D_i − A_i·X_L − C_i·X_R in terms of the
    neighbour shards' boundary values, ONE ``all_gather`` of six (nb, nx)
    interface rows feeds a redundantly-computed 2K-unknown interface sweep
    (K = chips, static), and a local back-substitution finishes.

    Communication: 6·K·nb·nx values per step — at 1024²×16 on 8 chips
    ≈ 3 MB/chip vs the pencil transposes' 2·nb·ny·nx·(K−1)/K ≈ 112 MB/chip.
    Decoupling semantics match Thomas exactly (zero sub/sup entries kill the
    fill-ins), so masked-interval boundaries stay exact wherever they fall
    relative to shard edges.  Numerics = Wang reordering of the same
    diagonally-dominant CN solve (differences at f64 roundoff).
    """
    n_shards = jax.lax.axis_size(axis_name)
    p = jax.lax.axis_index(axis_name)
    a = jnp.broadcast_to(-alpha * ay_lo, rhs.shape).astype(rhs.dtype)
    b = jnp.broadcast_to(1.0 - alpha * ay_diag, rhs.shape).astype(rhs.dtype)
    c = jnp.broadcast_to(-alpha * ay_hi, rhs.shape).astype(rhs.dtype)
    # kill the global-boundary fill-ins (defensive, as tridiag_solve_wang)
    edge0 = jnp.where(p == 0, 0.0, 1.0).astype(rhs.dtype)
    edge1 = jnp.where(p == n_shards - 1, 0.0, 1.0).astype(rhs.dtype)
    a = a.at[:, 0, :].multiply(edge0)
    c = c.at[:, -1, :].multiply(edge1)

    # local scans over the shard's rows: (m, nb, nx); stages 1–3 are the
    # SHARED Wang recurrences (ops.tridiag.wang_eliminate docstring has the
    # per-row relations) — partitions live on different shards here, so one
    # all_gather of this shard's six interface rows feeds the sweep, which
    # every chip computes redundantly (cheaper than scattering)
    a_s, b_s, c_s, d_s = (
        jnp.moveaxis(t, 1, 0) for t in (a, b, c, jnp.asarray(rhs))
    )
    C, A, D = wang_eliminate(a_s, b_s, c_s, d_s)
    iface = jnp.stack([A[0], C[0], D[0], A[-1], C[-1], D[-1]])
    gathered = jax.lax.all_gather(iface, axis_name, axis=0)
    Ls, Rs = wang_interface_sweep(
        gathered[:, 0], gathered[:, 1], gathered[:, 2],
        gathered[:, 3], gathered[:, 4], gathered[:, 5], n_shards,
    )
    # this shard's externals: X_L = R_{p−1} (0 at the top), X_R = L_{p+1}
    XLs, XRs = wang_externals(Ls, Rs)
    XL = jax.lax.dynamic_index_in_dim(XLs, p, 0, keepdims=False)
    XR = jax.lax.dynamic_index_in_dim(XRs, p, 0, keepdims=False)

    x = D - A * XL[None] - C * XR[None]
    return jnp.moveaxis(x, 0, 1)


def _wang_apply_y_prefactored(rhs, raw, axis_name):
    """Prefactored distributed Wang y-solve: rhs recurrences only.

    The CN coefficients are time-invariant, so the per-shard elimination
    factors (``wfp_cp/m/inv/C/A`` — rows-sharded planes built once at
    construction from :func:`ops.tridiag.wang_factor`) and the interface
    sweep's coefficient parts (``wfp_if``, replicated) are precomputed;
    per step only the d-recurrences run and only TWO interface rows gather
    (vs six for the unfactored path) — ~1 MB/chip at 1024²×16 on 8 chips.
    """
    n_shards = jax.lax.axis_size(axis_name)
    p = jax.lax.axis_index(axis_name)

    def to_scan(t):  # (nb, m, nx) -> (m, nb, nx)
        return jnp.moveaxis(t, 1, 0)

    D = wang_apply_rhs(
        to_scan(rhs), to_scan(raw["wfp_m"]), to_scan(raw["wfp_inv"]),
        to_scan(raw["wfp_cp"]),
    )

    iface = jnp.stack([D[0], D[-1]])
    gathered = jax.lax.all_gather(iface, axis_name, axis=0)  # (K, 2, nb, nx)
    wif = raw["wfp_if"]  # (6, K, nb, nx): aL, aR, if_inv, if_q, w_pre, w_post
    Ls, Rs = wang_apply_interface(
        gathered[:, 0], gathered[:, 1],
        wif[0], wif[1], wif[2], wif[3], wif[4], wif[5], n_shards,
    )
    XLs, XRs = wang_externals(Ls, Rs)
    XL = jax.lax.dynamic_index_in_dim(XLs, p, 0, keepdims=False)
    XR = jax.lax.dynamic_index_in_dim(XRs, p, 0, keepdims=False)
    x = D - to_scan(raw["wfp_A"]) * XL[None] - to_scan(raw["wfp_C"]) * XR[None]
    return jnp.moveaxis(x, 0, 1)


@dataclass
class ShardedStep:
    """Compiled multi-chip step: ``(q, ph) -> (q, ph, mass)``.

    ``q_sharding`` / ``ph_sharding`` describe the expected input placement;
    ``step`` is jit-compiled over the mesh.  For many steps prefer
    :meth:`make_chunk` over calling ``step`` in a Python loop or scanning
    it yourself: TPU while-loops pay a per-iteration back-edge cost that
    scales with the carry size, which the chunk amortizes by unrolling.

    ``apply``/``aux`` expose the un-jitted step with its operator arrays as
    explicit ARGUMENTS: callers embedding the step in their own jit (the
    engine's mesh path, custom scan loops) must thread ``aux`` through
    their jit boundary instead of letting the arrays become closure
    constants — over a remote-TPU tunnel every closed-over device array
    costs a host round-trip fetch at ``.lower()`` time.
    """

    mesh: Mesh
    step: Callable
    q_sharding: NamedSharding
    ph_sharding: NamedSharding
    grid_shape: tuple[int, int]
    apply: Callable = None  # (q, ph[, grow], raw_arrays, src) -> (q, ph, mass)
    aux: tuple = ()  # (raw_arrays, src)
    takes_gen: bool = False  # apply/step take a grow plane before aux
    # merged-Strang pieces (built with pieces=True, non-ensemble only):
    # the engine's mesh runner composes C(dt/2) [D C(dt)]^(L-1) D C(dt/2)
    # from these instead of scanning the full exact step.  All un-jitted,
    # operator arrays as explicit arguments like ``apply``.
    apply_col_half: Callable | None = None  # (q, ph, raw) -> (q, ph)
    apply_col_half_gen: Callable | None = None  # (q, ph, grow, raw) -> (q, ph)
    apply_col_full: Callable | None = None  # (q, ph, raw) -> (q, ph)
    apply_col_full_gen: Callable | None = None  # (q, ph, grow, raw) -> (q, ph)
    apply_diffuse: Callable | None = None  # (q, raw, src) -> q

    def make_chunk(self, n_steps: int, *, unroll: int = 8) -> Callable:
        """Return a jitted chunk advancing n_steps; ``mass`` is from the
        final step.  The scan body is unrolled (default 8 — the measured
        optimum for 1024²-class carries; use 4 for 256²-class).

        Signature follows the step: ``(q, ph) -> (q, ph, mass)``, or —
        when the step was built with ``gen_input=True`` — ``(q, ph, grow)
        -> (q, ph, mass)`` with the same dt·g plane injected every step
        of the chunk (a constant-rate source; time-varying windows need
        per-step driving, e.g. the engine's segment runner).
        """
        import jax

        apply = self.apply
        aux = self.aux

        if self.takes_gen:

            @jax.jit
            def chunk_g(q, ph, grow, raw, src):
                def body(carry, _):
                    q, ph = carry
                    q, ph, mass = apply(q, ph, grow, raw, src)
                    return (q, ph), mass

                (q, ph), masses = jax.lax.scan(
                    body, (q, ph), None, length=n_steps, unroll=min(unroll, n_steps)
                )
                return q, ph, masses[-1]

            return lambda q, ph, grow: chunk_g(q, ph, grow, *aux)

        @jax.jit
        def chunk_a(q, ph, raw, src):
            def body(carry, _):
                q, ph = carry
                q, ph, mass = apply(q, ph, raw, src)
                return (q, ph), mass

            (q, ph), masses = jax.lax.scan(
                body, (q, ph), None, length=n_steps, unroll=min(unroll, n_steps)
            )
            return q, ph, masses[-1]

        return lambda q, ph: chunk_a(q, ph, *aux)


def build_sharded_step(
    mesh: Mesh,
    op: SplitOperator,
    dt: float,
    *,
    dx: float = 1.0,
    collisions: dict[str, Any] | None = None,
    dtype=jnp.float32,
    ensemble: bool = False,
    tridiag_backend: str = "auto",
    gen_input: bool = False,
    pieces: bool = False,
    y_solve: str = "pencil",
) -> ShardedStep:
    """Build a rows-sharded Strang step over ``mesh``'s 'space' axis.

    Parameters
    ----------
    op:
        Split diffusion operator — uniform-gap (coefficients broadcastable
        to (NB, Ny, Nx)) or variable-D (full per-bin planes from
        ``fold_diffusion`` with a dense D field; they shard like the state).
    collisions:
        Optional dict with keys ``dE, rho, K_r0, K_s0, pmap`` (uniform-gap
        kernels and the static phonon map) plus toggles
        ``enable_recombination/enable_scattering/update_phonons``.

        **Non-uniform gap maps**: additionally pass ``gap_plane`` (dense
        (Ny, Nx) Δ in µeV) and ``tau_s/tau_r/T_c`` (+ optional
        ``dynes_gamma``).  On TPU the analytic-gap Pallas kernel evaluates
        exact per-pixel kernels from each shard's slice of Δ²; elsewhere
        (CPU-mesh dry runs, f64) the XLA gather integrator receives each
        shard's gap-id slice at call time.  ``rho/K_r0/K_s0`` then refer to
        the *nominal* gap and are only used to decide which channels exist.
    gen_input:
        When True the step takes a per-step generation plane:
        ``apply(q, ph, grow, raw, src)`` / ``step(q, ph, grow)`` with
        ``grow`` a dense (Ny, Nx) array of forward-Euler increments dt·g,
        rows-sharded like the state.  The injection happens inside the
        shard: fused into the Pallas collision kernels where they support
        a gen input (uniform and analytic-gap), an in-shard XLA pre-add
        otherwise.  Not available with ``ensemble=True``.
    pieces:
        When True (non-ensemble only) additionally expose the step's
        internals as separately shard_map'd callables
        (``apply_col_half/full[_gen]``, ``apply_diffuse``) so callers can
        compose merged-Strang segments — C(dt/2) [D C(dt)]^(L−1) D C(dt/2)
        — over the mesh: one collision substep per step instead of two,
        identical communication (the collision pieces are pixel-local).
    y_solve:
        How the implicit y-sweep crosses shards.  ``"pencil"`` (default):
        two ``all_to_all`` pencil transposes bracket a full-column local
        solve — moves 2·nb·ny·nx·(K−1)/K elements per step but keeps the
        local solve on the fastest (Pallas) path.  ``"wang"``: the
        distributed Wang partition (:func:`_wang_solve_y`) — one
        ``all_gather`` of 6·K·(nb, nx) interface rows (~40× less traffic
        at 1024²×16 on 8 chips) at the cost of two local XLA elimination
        scans.  Traffic model says wang wins from ~2 chips up; pencil
        stays the measured-on-hardware default until a multi-chip slice
        can arbitrate.
    """
    if gen_input and ensemble:
        # reject before any kernel/table construction — film ensembles get
        # per-member generation via FilmEnsemble.make_chunk(gen_plane=...)
        raise ValueError("gen_input is not supported with ensemble=True")
    ny, nx = op.mask.shape
    n_space = mesh.shape[SPACE_AXIS]
    # Backend selection must follow the devices the step will RUN on, not the
    # process default: a CPU dry-run mesh can coexist with a TPU default
    # backend (this environment registers platforms "axon,cpu" side by side).
    mesh_platform = next(iter(np.asarray(mesh.devices).flat)).platform
    if ny % n_space or nx % n_space:
        raise ValueError(
            f"Grid {ny}x{nx} must divide by the {n_space}-way 'space' axis in "
            "both dimensions (rows for the x-sweep, columns for the pencil transpose)."
        )
    alpha = 0.5 * float(dt)

    # fold bin_scale on the host below the same budget the single-chip ADI
    # backend uses; above it, shard the unit-D geometry and multiply lazily
    # inside the sharded step (scale is tiny and replicated).
    from ..solver.diffusion_backends import ADIDiffusion

    eager = (
        op.bin_scale is None
        or op.num_bins * ny * nx <= ADIDiffusion.MATERIALIZE_MAX_ELEMENTS
    )

    def dev(a):
        if eager:
            a = op.materialized(a)
        nb = max(a.shape[0], op.num_bins if eager else 1)
        return jnp.asarray(np.broadcast_to(a, (nb, ny, nx)), dtype=dtype)

    lazy_scale = None if eager else jnp.asarray(op.bin_scale, dtype=dtype)
    ax_lo, ax_hi, ax_diag = dev(op.ax_lo), dev(op.ax_hi), dev(op.ax_diag)
    ay_lo, ay_hi, ay_diag = dev(op.ay_lo), dev(op.ay_hi), dev(op.ay_diag)
    src = dev(op.source_total())
    # swapped x-direction planes for the Pallas local solve (lines on the
    # sublane axis need the (NB, Nx, Ny) layout); sharded over their last
    # (y) axis so each shard holds its own rows, pre-transposed.
    axT_lo, axT_hi, axT_diag = (
        jnp.swapaxes(ax_lo, -1, -2),
        jnp.swapaxes(ax_hi, -1, -2),
        jnp.swapaxes(ax_diag, -1, -2),
    )

    # local tridiagonal solves: the in-VMEM Pallas solve (fused coefficient
    # assembly + Wang partition, ops.pallas_adi) on TPU f32; the XLA scan
    # Thomas elsewhere (CPU-mesh dry runs, f64 parity).
    on_tpu_solve = mesh_platform == "tpu"
    if tridiag_backend == "auto":
        pallas_solve = on_tpu_solve and jnp.dtype(dtype) == jnp.float32
        pallas_interpret = False
    elif tridiag_backend == "pallas":
        pallas_solve = True
        pallas_interpret = not on_tpu_solve
    elif tridiag_backend == "xla":
        pallas_solve = False
        pallas_interpret = False
    else:
        raise ValueError(f"Unknown tridiag backend: {tridiag_backend!r}")
    if y_solve not in ("pencil", "wang"):
        raise ValueError(f"Unknown y_solve: {y_solve!r} (use 'pencil' or 'wang')")
    nb_total = op.num_bins
    if op.bin_scale is not None and not eager:
        scale_vec = jnp.asarray(np.asarray(op.bin_scale).reshape(-1), dtype=dtype)
    else:
        # planes already carry D (eager fold or variable-D): unit scale
        scale_vec = jnp.ones((nb_total,), dtype=dtype)

    plan_local: CollisionPlan | None = None
    col_half = None
    col_half_gen = None  # gen-input variant (gen_input=True builds only)
    # collision-substep factory: (sub_dt, gen) -> step | None.  The half-step
    # builds go through it, and the merged-Strang pieces (pieces=True) reuse
    # it at the full dt — one construction path, two substep sizes.
    col_factory: Callable[..., Any] | None = None
    col_mode = "baked"  # "baked" | "gap_plane" | "gap_id"
    gap_aux = None  # extra rows-sharded plane fed to the collision step
    gap_plane = None if collisions is None else collisions.get("gap_plane")
    if collisions is not None and gap_plane is not None:
        gap_plane = np.asarray(gap_plane, dtype=np.float64)
        if gap_plane.shape != (ny, nx):
            raise ValueError(
                f"gap_plane must have the dense grid shape ({ny}, {nx}); "
                f"got {gap_plane.shape}"
            )
        missing = [
            k
            for k in ("E_bins", "T_c")
            + (("tau_s",) if collisions.get("enable_scattering") else ())
            + (("tau_r",) if collisions.get("enable_recombination") else ())
            if collisions.get(k) is None
        ]
        if missing:
            raise ValueError(
                f"collisions with gap_plane requires {missing} in the dict "
                "(per-pixel kernels are built from the energy grid and taus)"
            )
        pmap_g: PhononFrequencyMap = collisions["pmap"]
        on_tpu_c = mesh_platform == "tpu"
        dtype_ok_c = jnp.dtype(dtype) != jnp.float64 or not on_tpu_c
        e_bins_g = collisions.get("E_bins")
        use_analytic = on_tpu_c and dtype_ok_c and e_bins_g is not None
        if use_analytic:
            from ..ops.pallas_collisions import (
                build_pallas_collision_step_analytic,
                pallas_analytic_collisions_supported,
            )

            use_analytic = pallas_analytic_collisions_supported(np.asarray(e_bins_g))
        if on_tpu_c and dtype_ok_c and e_bins_g is not None:
            # one keyword block for both analytic builders: the <=64-bin
            # pair-unrolled kernel and the NE>64 blocked fallback must never
            # silently diverge in how collision physics is threaded through
            kw_an = dict(
                E_bins=np.asarray(e_bins_g),
                dE=collisions["dE"],
                gap_plane=None,  # call-time arg: each shard passes its slice
                pmap=pmap_g,
                tau_s=collisions["tau_s"] if collisions.get("enable_scattering") else None,
                tau_r=collisions["tau_r"] if collisions.get("enable_recombination") else None,
                T_c=collisions["T_c"],
                dynes_gamma=collisions.get("dynes_gamma", 0.0),
                update_phonons=collisions.get("update_phonons", True),
            )

            def _analytic_factory(sub_dt: float, gen: bool = False):
                if use_analytic:
                    step = build_pallas_collision_step_analytic(
                        dt=float(sub_dt), gen_input=gen, **kw_an
                    )
                    if step is not None or gen:
                        return step
                if gen:
                    return None  # blocked kernel keeps the XLA pre-add
                # NE > 64: the blocked analytic-gap kernel (same
                # call-time-plane contract) beyond the pair-unroll cap
                from ..ops.pallas_collisions_blocked import (
                    build_pallas_collision_step_blocked_analytic,
                )

                return build_pallas_collision_step_blocked_analytic(
                    dt=float(sub_dt), **kw_an
                )

            col_half = _analytic_factory(0.5 * float(dt))
            if gen_input and col_half is not None:
                col_half_gen = _analytic_factory(0.5 * float(dt), gen=True)
        if col_half is not None:
            col_factory = _analytic_factory
            col_mode = "gap_plane"
            gap_aux = jnp.asarray(gap_plane, dtype=dtype)
        else:
            # XLA gather integrator with per-shard gap ids at call time
            from ..ops.dos import dynes_density_of_states
            from ..ops.kernels import recombination_kernel_base, scattering_kernel_base

            gamma = collisions.get("dynes_gamma", 0.0)
            unique_gaps = np.unique(gap_plane)
            gid_global = np.searchsorted(unique_gaps, gap_plane).astype(np.int32)
            plan_local = build_collision_plan_arrays(
                dE=collisions["dE"],
                rho_by_gap=np.stack(
                    [dynes_density_of_states(np.asarray(collisions["E_bins"]), float(g), gamma) for g in unique_gaps]
                ),
                K_r0_by_gap=(
                    np.stack(
                        [recombination_kernel_base(np.asarray(collisions["E_bins"]), float(g), collisions["tau_r"], collisions["T_c"]) for g in unique_gaps]
                    )
                    if collisions.get("enable_recombination", False)
                    else None
                ),
                K_s0_by_gap=(
                    np.stack(
                        [scattering_kernel_base(np.asarray(collisions["E_bins"]), float(g), collisions["tau_s"], collisions["T_c"]) for g in unique_gaps]
                    )
                    if collisions.get("enable_scattering", False)
                    else None
                ),
                gap_id=np.zeros((ny // n_space, nx), np.int32),  # local shape
                pmap=pmap_g,
                enable_recombination=collisions.get("enable_recombination", False),
                enable_scattering=collisions.get("enable_scattering", False),
                update_phonons=collisions.get("update_phonons", True),
                dtype=dtype,
                pixel_chunk=collisions.get("pixel_chunk", 4096),
            )
            col_factory = (
                lambda sub_dt, gen=False: None
                if gen
                else make_collision_step(plan_local, float(sub_dt), gap_id_arg=True)
            )
            col_half = col_factory(0.5 * float(dt))
            col_mode = "gap_id"
            gap_aux = jnp.asarray(gid_global)
        collisions = None  # uniform-path construction below is bypassed
    if collisions is not None:
        pmap: PhononFrequencyMap = collisions["pmap"]
        # collisions are pixel-local, so the VMEM Pallas kernel drops straight
        # into the per-shard step: auto-selected on TPU when the uniform-grid
        # envelope holds and E_bins are provided, XLA integrator otherwise
        # (including the CPU-mesh dry runs, where Pallas TPU kernels can't run).
        use_pallas = collisions.get("use_pallas", "auto")
        on_tpu = mesh_platform == "tpu"
        # Mosaic has no practical f64 support (same guard as the engine)
        dtype_ok = jnp.dtype(dtype) != jnp.float64 or not on_tpu
        want_pallas = use_pallas is True or (use_pallas == "auto" and on_tpu and dtype_ok)
        e_bins = collisions.get("E_bins")
        if use_pallas is True and e_bins is None:
            raise ValueError(
                "use_pallas=True requires 'E_bins' in the collisions dict "
                "(the kernel needs the energy grid to build its pair tables)"
            )
        if use_pallas is True and not dtype_ok:
            raise ValueError(
                "use_pallas=True is incompatible with float64 on TPU "
                "(Mosaic has no practical f64 support)"
            )
        if want_pallas and e_bins is not None:
            from ..ops.pallas_collisions import build_pallas_collision_step

            kw_u = dict(
                E_bins=np.asarray(e_bins),
                dE=collisions["dE"],
                rho=np.asarray(collisions["rho"]),
                K_s0=(
                    np.asarray(collisions["K_s0"])
                    if collisions.get("enable_scattering", False)
                    and collisions.get("K_s0") is not None
                    else None
                ),
                K_r0=(
                    np.asarray(collisions["K_r0"])
                    if collisions.get("enable_recombination", False)
                    and collisions.get("K_r0") is not None
                    else None
                ),
                pmap=pmap,
                update_phonons=collisions.get("update_phonons", True),
                interpret=not on_tpu,
            )

            def _uniform_pallas_factory(sub_dt: float, gen: bool = False):
                step = build_pallas_collision_step(
                    dt=float(sub_dt), gen_input=gen, **kw_u
                )
                if gen and not getattr(step, "takes_gen", False):
                    return None
                return step

            col_half = _uniform_pallas_factory(0.5 * float(dt))
            if gen_input and col_half is not None:
                col_half_gen = _uniform_pallas_factory(0.5 * float(dt), gen=True)
            if col_half is not None:
                col_factory = _uniform_pallas_factory
            if use_pallas is True and col_half is None:
                raise ValueError(
                    "use_pallas=True but the configuration is outside the "
                    "Pallas collision kernel's support envelope"
                )
    if collisions is not None and col_half is None:
        plan_local = build_collision_plan_arrays(
            dE=collisions["dE"],
            rho_by_gap=np.asarray(collisions["rho"])[None],
            K_r0_by_gap=(
                None
                if collisions.get("K_r0") is None
                else np.asarray(collisions["K_r0"])[None]
            ),
            K_s0_by_gap=(
                None
                if collisions.get("K_s0") is None
                else np.asarray(collisions["K_s0"])[None]
            ),
            gap_id=np.zeros((ny // n_space, nx), np.int32),
            pmap=pmap,
            enable_recombination=collisions.get("enable_recombination", False),
            enable_scattering=collisions.get("enable_scattering", False),
            update_phonons=collisions.get("update_phonons", True),
            dtype=dtype,
            pixel_chunk=collisions.get("pixel_chunk", 4096),
        )
        col_factory = (
            lambda sub_dt, gen=False: None
            if gen
            else make_collision_step(plan_local, float(sub_dt))
        )
        col_half = col_factory(0.5 * float(dt))

    rows = P(None, SPACE_AXIS, None)
    cols = P(None, None, SPACE_AXIS)

    # Prefactored distributed Wang: the CN coefficients are time-invariant,
    # so when they are materialized (no lazy bin scale) the per-shard
    # elimination factors and interface coefficients are built ONCE here
    # from the global operator — the per-step y solve then runs rhs-only
    # recurrences and gathers two interface rows instead of six.  Memory:
    # five extra (nb, ny, nx) planes; skipped under lazy scaling, where the
    # unfactored _wang_solve_y consumes the runtime-scaled planes instead.
    wang_fac_arrays: dict[str, jax.Array] | None = None
    if y_solve == "wang" and lazy_scale is None:
        from ..ops.tridiag import _wang_unlayout, wang_factor

        alpha_c = jnp.asarray(alpha, dtype)
        fac = wang_factor(
            jnp.swapaxes(-alpha_c * ay_lo, -1, -2),
            jnp.swapaxes(1.0 - alpha_c * ay_diag, -1, -2),
            jnp.swapaxes(-alpha_c * ay_hi, -1, -2),
            chunk=ny // n_space,
        )

        def plane(t):  # (M, K, nb, nx) -> rows-sharded (nb, ny, nx)
            return jnp.swapaxes(_wang_unlayout(t), -1, -2)

        wang_fac_arrays = {
            "wfp_cp": plane(fac["cp"]),
            "wfp_m": plane(fac["m"]),
            "wfp_inv": plane(fac["inv"]),
            "wfp_C": plane(fac["C"]),
            "wfp_A": plane(fac["A"]),
            "wfp_if": jnp.stack([
                fac["if_aL"], fac["if_aR"], fac["if_inv"], fac["if_q"],
                fac["if_w_pre"], fac["if_w_post"],
            ]),
        }

    def local_diffusion(u, raw, s):
        axl_r, axh_r, axd_r = raw["axl"], raw["axh"], raw["axd"]
        ayl_r, ayh_r, ayd_r = raw["ayl"], raw["ayh"], raw["ayd"]
        if lazy_scale is not None:
            axl, axh, axd = lazy_scale * axl_r, lazy_scale * axh_r, lazy_scale * axd_r
            ayl, ayh, ayd = lazy_scale * ayl_r, lazy_scale * ayh_r, lazy_scale * ayd_r
            s = lazy_scale * s
        else:
            axl, axh, axd = axl_r, axh_r, axd_r
            ayl, ayh, ayd = ayl_r, ayh_r, ayd_r
        # x-implicit half: (I − αLx) u* = u + α·Ly u + α·s   (halo for Ly)
        rhs = u + alpha * _halo_apply_y(u, ayl, ayh, ayd, SPACE_AXIS) + alpha * s
        if pallas_solve:
            from ..ops.pallas_adi import solve_lines_pallas

            u_star = jnp.swapaxes(
                solve_lines_pallas(
                    jnp.swapaxes(rhs, -1, -2),
                    raw["axlT"], raw["axdT"], raw["axhT"],
                    scale_vec, alpha=alpha, interpret=pallas_interpret,
                ),
                -1, -2,
            )
        else:
            u_star = tridiag_solve(
                jnp.broadcast_to(-alpha * axl, rhs.shape),
                jnp.broadcast_to(1.0 - alpha * axd, rhs.shape),
                jnp.broadcast_to(-alpha * axh, rhs.shape),
                rhs,
            )
        # y-implicit half: rhs local in x, then cross-shard solve
        rhs2 = u_star + alpha * _apply_x(u_star, axl, axh, axd) + alpha * s
        if y_solve == "wang":
            if "wfp_cp" in raw:
                return _wang_apply_y_prefactored(rhs2, raw, SPACE_AXIS)
            return _wang_solve_y(rhs2, ayl, ayh, ayd, alpha, SPACE_AXIS)
        rhs2_T = jax.lax.all_to_all(rhs2, SPACE_AXIS, split_axis=2, concat_axis=1, tiled=True)
        if pallas_solve:
            from ..ops.pallas_adi import solve_lines_pallas

            u_new_T = solve_lines_pallas(
                rhs2_T, raw["aylC"], raw["aydC"], raw["ayhC"],
                scale_vec, alpha=alpha, interpret=pallas_interpret,
            )
        else:
            aylT, ayhT, aydT = raw["aylC"], raw["ayhC"], raw["aydC"]
            if lazy_scale is not None:
                aylT, ayhT, aydT = (
                    lazy_scale * aylT, lazy_scale * ayhT, lazy_scale * aydT
                )
            u_new_T = tridiag_solve_along(
                -2,
                jnp.broadcast_to(-alpha * aylT, rhs2_T.shape),
                jnp.broadcast_to(1.0 - alpha * aydT, rhs2_T.shape),
                jnp.broadcast_to(-alpha * ayhT, rhs2_T.shape),
                rhs2_T,
            )
        return jax.lax.all_to_all(u_new_T, SPACE_AXIS, split_axis=1, concat_axis=2, tiled=True)

    def local_step(q, ph, raw, s, grow=None):
        def collide(q, ph):
            if col_mode == "baked":
                return col_half(q, ph)
            return col_half(q, ph, raw["gap_aux"])

        def collide_gen(q, ph, grow):
            # first substep with the forward-Euler injection fused in;
            # kernels without a gen input get an in-shard XLA pre-add
            if col_half_gen is not None:
                if col_mode == "baked":
                    return col_half_gen(q, ph, grow)
                return col_half_gen(q, ph, raw["gap_aux"], grow)
            return collide(q + grow[None].astype(q.dtype), ph)

        if col_half is not None:
            if grow is not None:
                q, ph = collide_gen(q, ph, grow)
            else:
                q, ph = collide(q, ph)
        elif grow is not None:
            q = q + grow[None].astype(q.dtype)
        q = local_diffusion(q, raw, s)
        if col_half is not None:
            q, ph = collide(q, ph)
        mass = jax.lax.psum(jnp.sum(q), SPACE_AXIS) * (dx * dx)
        return q, ph, mass

    raw_arrays = {
        "axl": ax_lo, "axh": ax_hi, "axd": ax_diag,
        "ayl": ay_lo, "ayh": ay_hi, "ayd": ay_diag,
        # x planes pre-swapped for the Pallas local solve (lines on sublanes)
        "axlT": axT_lo, "axdT": axT_diag, "axhT": axT_hi,
        # ay planes cols-sharded for the pencil-transposed y solve
        "aylC": ay_lo, "aydC": ay_diag, "ayhC": ay_hi,
    }
    raw_specs = {
        "axl": rows, "axh": rows, "axd": rows,
        "ayl": rows, "ayh": rows, "ayd": rows,
        "axlT": cols, "axdT": cols, "axhT": cols,
        "aylC": cols, "aydC": cols, "ayhC": cols,
    }
    if gap_aux is not None:
        # per-shard slice of the gap map / gap-id plane (2D, rows-sharded)
        raw_arrays["gap_aux"] = gap_aux
        raw_specs["gap_aux"] = P(SPACE_AXIS, None)
    if wang_fac_arrays is not None:
        for key, val in wang_fac_arrays.items():
            raw_arrays[key] = val
            raw_specs[key] = (
                P(None, None, None, None)  # (6, K, nb, nx): replicated
                if key == "wfp_if"
                else rows
            )

    piece_fns: dict[str, Callable] = {}
    if pieces and not ensemble and col_half is not None:
        # merged-Strang pieces: the same local physics, sharded one operator
        # at a time so the caller owns the composition.  The full-dt
        # collision substep comes from the same factory as the half.
        col_full = col_factory(float(dt)) if col_factory is not None else None
        col_full_gen = (
            col_factory(float(dt), gen=True)
            if gen_input and col_full is not None and col_factory is not None
            else None
        )
        if col_full is None:
            raise RuntimeError(
                "pieces=True: the collision factory built a half-step but "
                "refused the full-dt substep — inconsistent dispatch."
            )

        def _mk_local_col(col, col_gen):
            def local_col(q, ph, raw):
                if col_mode == "baked":
                    return col(q, ph)
                return col(q, ph, raw["gap_aux"])

            def local_col_gen(q, ph, grow, raw):
                if col_gen is not None:
                    if col_mode == "baked":
                        return col_gen(q, ph, grow)
                    return col_gen(q, ph, raw["gap_aux"], grow)
                return local_col(q + grow[None].astype(q.dtype), ph, raw)

            return local_col, local_col_gen

        lc_h, lc_h_gen = _mk_local_col(col_half, col_half_gen)
        lc_f, lc_f_gen = _mk_local_col(col_full, col_full_gen)

        grow_spec = P(SPACE_AXIS, None)

        def _sm(f, in_specs, out_specs):
            return shard_map(
                f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )

        piece_fns["apply_col_half"] = _sm(
            lc_h, (rows, rows, raw_specs), (rows, rows)
        )
        piece_fns["apply_col_full"] = _sm(
            lc_f, (rows, rows, raw_specs), (rows, rows)
        )
        piece_fns["apply_diffuse"] = _sm(
            local_diffusion, (rows, raw_specs, rows), rows
        )
        if gen_input:
            piece_fns["apply_col_half_gen"] = _sm(
                lc_h_gen, (rows, rows, grow_spec, raw_specs), (rows, rows)
            )
            piece_fns["apply_col_full_gen"] = _sm(
                lc_f_gen, (rows, rows, grow_spec, raw_specs), (rows, rows)
            )

    if ensemble:
        # each local shard carries a batch of independent ensemble members;
        # the 'ensemble' mesh axis shards the batch with zero communication.
        from .mesh import ENSEMBLE_AXIS

        batched = jax.vmap(local_step, in_axes=(0, 0, None, None), out_axes=(0, 0, 0))
        rows_b = P(ENSEMBLE_AXIS, None, SPACE_AXIS, None)
        sharded = shard_map(
            batched,
            mesh=mesh,
            in_specs=(rows_b, rows_b, raw_specs, rows),
            out_specs=(rows_b, rows_b, P(ENSEMBLE_AXIS)),
            check_vma=False,
        )
        q_sh = NamedSharding(mesh, rows_b)
        ph_sh = NamedSharding(mesh, rows_b)
    elif gen_input:
        # grow: a dense (Ny, Nx) plane of dt·g increments, rows-sharded
        def local_step_gen(q, ph, grow, raw, s):
            return local_step(q, ph, raw, s, grow=grow)

        sharded = shard_map(
            local_step_gen,
            mesh=mesh,
            in_specs=(rows, rows, P(SPACE_AXIS, None), raw_specs, rows),
            out_specs=(rows, rows, P()),
            check_vma=False,
        )
        q_sh = NamedSharding(mesh, rows)
        ph_sh = NamedSharding(mesh, rows)
    else:
        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(rows, rows, raw_specs, rows),
            out_specs=(rows, rows, P()),
            check_vma=False,
        )
        q_sh = NamedSharding(mesh, rows)
        ph_sh = NamedSharding(mesh, rows)

    jit_step = jax.jit(sharded)
    if gen_input and not ensemble:
        step = lambda q, ph, grow: jit_step(q, ph, grow, raw_arrays, src)
    else:
        step = lambda q, ph: jit_step(q, ph, raw_arrays, src)
    return ShardedStep(
        mesh=mesh, step=step, q_sharding=q_sh, ph_sharding=ph_sh,
        grid_shape=(ny, nx), apply=sharded, aux=(raw_arrays, src),
        takes_gen=gen_input and not ensemble,
        **piece_fns,
    )
