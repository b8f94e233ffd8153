"""Headless result rendering: run a 2D pulse, save it, export PNGs + GIF.

The full displayless workflow for TPU hosts: run a setup through the
public runner, persist the reference-format simulation JSON, then render
frame heatmaps, phonon frames, a mass trace and an animated GIF with the
same helpers behind `python -m qpsim_tpu view`.

Usage: python examples/06_render_results.py  (CPU, a few seconds)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qpsim_tpu.fields import default_initial_condition
from qpsim_tpu.geometry.mask import create_intrinsic_geometry
from qpsim_tpu.models.params import (
    BoundaryCondition,
    ExternalGenerationSpec,
    SetupData,
    SimulationParameters,
)
from qpsim_tpu.runner import run_setup
from qpsim_tpu.ui.playback import export_simulation_images, write_gif

geo = create_intrinsic_geometry(width=48, height=24)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
ic = default_initial_condition()
ic.spatial_kind = "gaussian"
ic.spatial_params = {"amplitude": 1e-4, "x0": 0.3, "y0": 0.5, "sigma": 0.08}
setup = SetupData(
    setup_id="0006abcdef00",
    name="render demo",
    created_at="2026-08-18T00:00:00+00:00",
    geometry=geo,
    boundary_conditions=bcs,
    parameters=SimulationParameters(
        diffusion_coefficient=6.0,
        dt=0.05,
        total_time=2.0,
        mesh_size=1.0,
        store_every=4,
        energy_gap=180.0,
        energy_min_factor=1.0,
        energy_max_factor=3.0,
        num_energy_bins=8,
        enable_recombination=True,
        enable_scattering=True,
        bath_temperature=0.2,
        export_phonon_history=True,
        external_generation=ExternalGenerationSpec(
            mode="pulse", pulse_start=0.2, pulse_duration=0.4, pulse_rate=5e-5
        ),
    ),
    initial_condition=ic,
)

result, saved = run_setup(setup, save=True, save_path=pathlib.Path("render_demo.json"))
print(f"ran '{result.setup_name}': {len(result.times)} stored frames -> {saved}")

out = pathlib.Path("render_demo_frames")
written = export_simulation_images(result, out, frames="all", phonons=True)
gif = write_gif(
    sorted(p for p in written if p.name.startswith("frame_")), out / "movie.gif", fps=6
)
print(f"wrote {len(written)} PNGs and {gif} ({out}/)")
assert (out / "mass.png").exists() and gif.exists()
