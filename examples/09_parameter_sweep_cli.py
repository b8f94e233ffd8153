"""A τᵣ calibration curve through the sweep layer (the `sweep` CLI).

Where example 03 batches same-geometry films on device (one compiled step
for the whole sweep), the sweep layer re-runs a SAVED SETUP over a
parameter grid — any geometry, any field, reference-format result files,
one machine-readable summary.  This is what
``python -m qpsim_tpu sweep setup.json --vary tau_0=100:800:5`` does; here
the same thing through the library API.

Physics: after a photon pulse the excess quasiparticles recombine faster
for shorter Kaplan τ₀ — the decay ratio (final mass / peak mass) must rise
monotonically with τ₀.  The bath is frozen (``freeze_phonon_dynamics``):
in a closed reflective film with dynamic phonons the recombination phonons
re-break pairs and the QP number barely decays — the frozen bath is the
instantly-rethermalizing-substrate limit MKID analyses assume.

Usage: python examples/09_parameter_sweep_cli.py  (CPU, ~10 s)
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from qpsim_tpu.fields import default_initial_condition
from qpsim_tpu.geometry.mask import create_intrinsic_geometry
from qpsim_tpu.models.params import (
    BoundaryCondition,
    ExternalGenerationSpec,
    SetupData,
    SimulationParameters,
)
from qpsim_tpu.sweep import parse_vary, run_sweep

geo = create_intrinsic_geometry(width=24, height=8)
params = SimulationParameters(
    diffusion_coefficient=6.0,
    dt=0.05,
    total_time=20.0,
    mesh_size=1.0,
    store_every=10,
    energy_gap=180.0,
    energy_max_factor=3.0,
    num_energy_bins=6,
    enable_recombination=True,
    enable_scattering=True,
    bath_temperature=0.0,       # cold bath: pure decay after the pulse
    external_generation=ExternalGenerationSpec(
        mode="pulse", pulse_start=0.1, pulse_duration=0.4, pulse_rate=2e-2
    ),
)
ic = default_initial_condition()
ic.spatial_kind = "uniform"
ic.spatial_params = {"value": 1e-6}
setup = SetupData(
    setup_id="example09sweep",
    name="tau calibration",
    created_at="2026-08-18T00:00:00+00:00",
    geometry=geo,
    boundary_conditions={
        e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges
    },
    parameters=params,
    initial_condition=ic,
)

axes = [parse_vary("tau_0=60:300:4")]
with tempfile.TemporaryDirectory() as td:
    summary = run_sweep(
        setup,
        axes,
        out_dir=pathlib.Path(td) / "sweep",
        progress=lambda msg: print(f"  {msg}"),
        freeze_phonon_dynamics=True,
    )
    assert summary["n_failed"] == 0, summary
    print("\ntau_0 (ns) -> decay ratio (final/peak mass; slower tau decays less):")
    ratios = []
    for rec in summary["variants"]:
        ratio = rec["mass_final"] / rec["mass_peak"]
        ratios.append(ratio)
        print(f"  {rec['overrides']['tau_0']:6.1f}     {ratio:.4f}")
    assert all(b > a for a, b in zip(ratios, ratios[1:])), ratios
    print("\nmonotone in tau_0 — calibration curve OK")
    print(f"summary JSON: {summary['summary_path']}")
