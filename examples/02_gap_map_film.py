"""2D film with a non-uniform superconducting gap (bilayer step profile).

The gap map comes from a safe-eval expression; the engine auto-precomputes
per-gap DOS and collision kernels (the reference's unique-gap cache) and the
lower-gap half both traps quasiparticles (smaller Δ → more subgap states)
and diffuses them faster.

Usage: python examples/02_gap_map_film.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qpsim_tpu import run_2d_crank_nicolson
from qpsim_tpu.geometry.mask import extract_edge_segments
from qpsim_tpu.models.params import BoundaryCondition

mask = np.ones((8, 48), dtype=bool)
edges = extract_edge_segments(mask)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}
init = np.zeros(mask.shape)
init[:, 22:26] = 1e-4  # central bump straddling the gap step

times, frames, mass, *_ = run_2d_crank_nicolson(
    mask=mask,
    edges=edges,
    edge_conditions=bcs,
    initial_field=init,
    diffusion_coefficient=6.0,
    dt=0.05,
    total_time=4.0,
    dx=1.0,
    store_every=20,
    energy_gap=180.0,
    energy_max_factor=3.0,
    num_energy_bins=10,
    enable_recombination=True,
    enable_scattering=True,
    bath_temperature=0.2,
    gap_expression="return 150.0 + 30.0 * (x > 0.5)",  # Δ=150 left, 180 right
)

final = np.nan_to_num(frames[-1])
left, right = final[:, :24].sum(), final[:, 24:].sum()
print(f"QP number after {times[-1]:.1f} ns:  low-gap half {left:.3e}   "
      f"high-gap half {right:.3e}")
print(f"low-gap fraction: {left / (left + right):.1%} (asymmetric spread "
      "across the gap step)")
assert left != right
