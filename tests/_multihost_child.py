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

    print(f"MULTIHOST_OK process={process_id} devices={n_global}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
