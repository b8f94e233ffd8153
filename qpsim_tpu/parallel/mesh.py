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

__all__ = ["make_mesh", "state_sharding", "ENSEMBLE_AXIS", "SPACE_AXIS"]

ENSEMBLE_AXIS = "ensemble"
SPACE_AXIS = "space"


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
