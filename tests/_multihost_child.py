"""Child process for the 2-process multi-host smoke test.

Run as:  python tests/_multihost_child.py <coordinator> <num_processes> <process_id>

Joins the local jax.distributed cluster through
qpsim_tpu.parallel.mesh.initialize_distributed, builds the multi-host
ensemble×space mesh, and runs one cross-process psum to prove the DCN init
path works end-to-end.  Prints one final line the parent asserts on.
"""

from __future__ import annotations

import sys


def main() -> int:
    coordinator, num_processes, process_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # The in-process config update is the only reliable CPU selection on this
    # box (the axon plugin rewrites JAX_PLATFORMS at interpreter startup).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, ".")
    from qpsim_tpu.parallel.mesh import (
        ENSEMBLE_AXIS,
        SPACE_AXIS,
        initialize_distributed,
        make_multihost_mesh,
        state_sharding,
    )

    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == num_processes * jax.local_device_count()

    mesh = make_multihost_mesh()
    assert mesh.shape[ENSEMBLE_AXIS] == num_processes
    assert mesh.shape[SPACE_AXIS] == n_global // num_processes

    # One real cross-process collective: a global-sum of an ensemble-sharded
    # batch of states, where each process contributes its own member.
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    # state_sharding lays rows (axis 2) over the space axis.
    ne, ny, nx = 3, 2 * mesh.shape[SPACE_AXIS], 4
    sharding = state_sharding(mesh, ensemble=True)
    member = np.full((1, ne, ny, nx), float(process_id + 1))
    batch = jax.make_array_from_process_local_data(
        sharding, member, global_shape=(num_processes, ne, ny, nx)
    )

    @jax.jit
    def total(x):
        return jnp.sum(x)

    got = float(total(batch))
    want = ne * ny * nx * sum(range(1, num_processes + 1))
    assert got == want, (got, want)

    # And a sharded elementwise update stays correctly laid out.
    out = jax.jit(lambda x: 2.0 * x, out_shardings=sharding)(batch)
    local = np.asarray(out.addressable_shards[0].data)
    assert np.all(local == 2.0 * (process_id + 1))

    # --- Phase 2 (r5): the actual sharded PHYSICS step across processes.
    # A coupled ShardedStep over a mesh whose SPACE axis spans both
    # processes: the per-step halo ppermutes and y-solve collectives cross
    # the process boundary (DCN in a pod), which no single-process test
    # reaches.  Each process checks its addressable rows against the
    # single-chip C(dt/2) D C(dt/2) oracle computed locally.
    from qpsim_tpu.geometry.mask import extract_edge_segments
    from qpsim_tpu.models.params import BoundaryCondition
    from qpsim_tpu.ops.collisions import build_collision_plan_arrays, make_collision_step
    from qpsim_tpu.ops.diffusion import build_directional_stencils, fold_diffusion
    from qpsim_tpu.ops.dos import dynes_density_of_states, thermal_phonon_occupation
    from qpsim_tpu.ops.energy_grid import build_energy_grid
    from qpsim_tpu.ops.kernels import (
        recombination_kernel_base,
        scattering_kernel_base,
    )
    from qpsim_tpu.ops.phonon_map import build_phonon_frequency_map
    from qpsim_tpu.parallel.sharded import build_sharded_step
    from qpsim_tpu.solver.diffusion_backends import ADIDiffusion

    gap, tau, tc, tbath, dt = 180.0, 440.0, 1.2, 0.2, 0.05
    mesh_sp = make_multihost_mesh(n_space=n_global, n_ensemble=1)
    assert mesh_sp.shape[SPACE_AXIS] == n_global
    # both grid dims must divide by the space axis (rows for the x-sweep,
    # columns for the pencil transpose)
    ny2, nx2, ne2 = 2 * n_global, max(8, n_global), 4
    mask = np.ones((ny2, nx2), dtype=bool)
    edges = extract_edge_segments(mask)
    bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
    E, dE = build_energy_grid(gap, 1.0, 3.0, ne2)
    pm = build_phonon_frequency_map(E)
    rho = dynes_density_of_states(E, gap, 0.0)
    Kr = recombination_kernel_base(E, gap, tau, tc)
    Ks = scattering_kernel_base(E, gap, tau, tc)
    D_bins = 6.0 * np.sqrt(np.maximum(0.0, 1.0 - (gap / E) ** 2))
    xs, ys = build_directional_stencils(mask, edges, bcs, 1.0)
    op = fold_diffusion(xs, ys, mask, 1.0, D_bins)

    sharded = build_sharded_step(
        mesh_sp, op, dt,
        collisions=dict(
            dE=dE, rho=rho, K_r0=Kr, K_s0=Ks, pmap=pm,
            enable_recombination=True, enable_scattering=True,
            update_phonons=True,
        ),
        dtype=jnp.float64,
    )

    rng = np.random.default_rng(42)  # same seed on every process
    q0 = rng.uniform(0, 1e-4, (ne2, ny2, nx2))
    ph0 = np.broadcast_to(
        thermal_phonon_occupation(pm.omega_bins, tbath)[:, None, None],
        (pm.num_omega, ny2, nx2),
    ).copy()
    q_g = jax.make_array_from_callback(
        q0.shape, sharded.q_sharding, lambda idx: q0[idx]
    )
    ph_g = jax.make_array_from_callback(
        ph0.shape, sharded.ph_sharding, lambda idx: ph0[idx]
    )

    plan = build_collision_plan_arrays(
        dE=dE, rho_by_gap=rho[None], K_r0_by_gap=Kr[None], K_s0_by_gap=Ks[None],
        gap_id=np.zeros((ny2, nx2), np.int32), pmap=pm,
        enable_recombination=True, enable_scattering=True, update_phonons=True,
    )
    col_half = make_collision_step(plan, 0.5 * dt)
    diff = ADIDiffusion(op, dtype=jnp.float64).make_step(dt)

    @jax.jit
    def single(q, ph):
        q, ph = col_half(q, ph)
        q = diff(q)
        q, ph = col_half(q, ph)
        return q, ph

    q_s, ph_s = jnp.asarray(q0), jnp.asarray(ph0)
    for _ in range(3):
        q_g, ph_g, mass = sharded.step(q_g, ph_g)
        q_s, ph_s = single(q_s, ph_s)
    # The global mass reduction crosses processes; every process sees it.
    assert abs(float(mass) - float(jnp.sum(q_s))) < 1e-10, (
        float(mass), float(jnp.sum(q_s)))
    # Shard-local rows against the oracle (the global array is not fully
    # addressable from one process — compare what this process owns).
    for shard in q_g.addressable_shards:
        want = q_s[shard.index]
        np.testing.assert_allclose(
            np.asarray(shard.data), np.asarray(want), atol=1e-13
        )
    for shard in ph_g.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), np.asarray(ph_s[shard.index]), atol=1e-13
        )

    print(f"MULTIHOST_OK process={process_id} devices={n_global}")
    print(f"MULTIHOST_STEP_OK process={process_id} space={n_global}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
