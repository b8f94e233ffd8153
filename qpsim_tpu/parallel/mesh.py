"""Device-mesh construction helpers.

The framework's scaling axes (see SURVEY.md §5):

* ``ensemble`` — data parallelism over independent simulations/parameter
  sweeps (perfectly parallel, no collectives in the hot loop);
* ``space``    — spatial sharding of the 2D grid by rows; ADI sweeps need a
  one-row halo (``ppermute``) and a pencil transpose (``all_to_all``), both
  riding ICI.

Energy bins stay local: the collision operator couples all bins at one pixel,
so energy sharding would force an all-gather per substep — rows don't.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "initialize_distributed",
    "state_sharding",
    "ENSEMBLE_AXIS",
    "SPACE_AXIS",
]

ENSEMBLE_AXIS = "ensemble"
SPACE_AXIS = "space"


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join a multi-host JAX cluster (no-op if already initialized).

    On Cloud TPU pods the arguments are discovered from the environment;
    elsewhere pass them explicitly.  After this, ``jax.devices()`` spans the
    whole pod and :func:`make_multihost_mesh` can lay the ``ensemble×space``
    axes so that the space axis (halo ppermutes + pencil all_to_alls every
    step) stays within each host's ICI-connected slice while the
    communication-free ensemble axis crosses hosts/DCN.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # RuntimeError: already initialized / single-process backend already
        # up; ValueError: nothing to auto-discover (not running on a pod).
        # Both mean "no cluster to join" when we end up single-process.
        if jax.process_count() == 1:
            return
        raise


def make_multihost_mesh(n_space: int | None = None, n_ensemble: int | None = None) -> Mesh:
    """Mesh over every device in a multi-host run, ensemble axis across hosts.

    Defaults: one ensemble group per process (``n_ensemble =
    jax.process_count()``), the per-process devices forming the space axis —
    the layout where every per-step collective rides intra-host ICI and
    nothing latency-critical crosses DCN.  Override ``n_space`` to shard
    space across hosts too (ICI-connected pod slices).
    """
    devs = jax.devices()
    if n_ensemble is None and n_space is None:
        n_ensemble = max(1, jax.process_count())
    if n_ensemble is None:
        n_ensemble = len(devs) // int(n_space)
    if n_space is None:
        n_space = len(devs) // int(n_ensemble)
    if n_ensemble * n_space != len(devs):
        raise ValueError(
            f"mesh {n_ensemble}x{n_space} does not match {len(devs)} devices."
        )
    from jax.experimental.mesh_utils import create_device_mesh

    # create_device_mesh orders devices so that the minor mesh axis maps to
    # physically adjacent chips (ICI neighbours) — exactly what the space
    # axis's ppermute halos and all_to_all transposes want.
    grid = create_device_mesh((n_ensemble, n_space), devices=devs)
    return Mesh(grid, (ENSEMBLE_AXIS, SPACE_AXIS))


def make_mesh(
    n_space: int | None = None,
    n_ensemble: int = 1,
    devices=None,
) -> Mesh:
    """Build an (ensemble × space) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_space is None:
        n_space = len(devs) // n_ensemble
    if n_ensemble * n_space != len(devs):
        raise ValueError(
            f"mesh {n_ensemble}x{n_space} does not match {len(devs)} devices."
        )
    grid = np.asarray(devs).reshape(n_ensemble, n_space)
    return Mesh(grid, (ENSEMBLE_AXIS, SPACE_AXIS))


def state_sharding(mesh: Mesh, *, ensemble: bool = False) -> NamedSharding:
    """Sharding for a state array: rows over 'space', optional leading batch."""
    if ensemble:
        return NamedSharding(mesh, P(ENSEMBLE_AXIS, None, SPACE_AXIS, None))
    return NamedSharding(mesh, P(None, SPACE_AXIS, None))
