"""Pair-breaking photons: the Fischer et al. (2024) resonator drive.

The reference repo lists this model in its own "Not yet Implemented" queue;
here it is a first-class drive mode.  A photon mode of energy ω > 2Δ with
occupation n̄ breaks Cooper pairs (a QP appears at E and one at ω−E, with
the K⁻ coherence-factor weighting that piles both near the gap edge and
near ω−Δ), while the number-conserving scattering term redistributes the
gas by ±ω.  Run a cold film with a windowed pair-breaking drive and watch:

  * near-linear QP growth while the window is open (generation from the
    photon mode dominates at low density);
  * the spectral birth profile ρ(E)·K⁻(E, ω−E)·ρ(ω−E) — piled onto the
    gap edge, with weight at the ω−Δ mirror;
  * the drive switching off cleanly at the window edge — after which the
    mass is frozen on this timescale: two-body recombination at these
    densities has ~µs lifetimes, far beyond the 30 ns shown (exactly the
    MKID phenomenology).

Usage: python examples/12_pair_breaking_photons.py  (CPU, ~20 s)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qpsim_tpu import run_2d_crank_nicolson
from qpsim_tpu.geometry.mask import create_intrinsic_geometry, mask_from_lists
from qpsim_tpu.models.params import BoundaryCondition, PhotonDriveSpec

GAP = 180.0  # µeV (Al)
OMEGA = 2.6 * GAP  # a pair-breaking mode: ω > 2Δ

geo = create_intrinsic_geometry(width=48, height=8)
mask = mask_from_lists(geo.mask)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}

times, frames, mass, clim, energy_frames, E_bins = run_2d_crank_nicolson(
    mask=mask,
    edges=geo.edges,
    edge_conditions=bcs,
    initial_field=np.where(mask, 1e-8, 0.0),
    diffusion_coefficient=6.0,
    dt=0.05,
    total_time=10.0,
    dx=1.0,
    store_every=4,
    energy_gap=GAP,
    energy_max_factor=4.0,
    num_energy_bins=24,
    enable_recombination=True,
    enable_scattering=True,
    bath_temperature=0.1,
    # open-system limit: phonons pinned at the bath (instantly
    # rethermalizing substrate) — otherwise the 2Δ phonons emitted by
    # recombination pair-break right back and the QP mass plateaus at the
    # closed-system detailed balance instead of decaying
    freeze_phonon_dynamics=True,
    photon_drive=PhotonDriveSpec(
        mode="photon",
        photon_energy=OMEGA,
        occupancy=2.0,       # n̄ photons in the mode
        coupling=2e-5,       # c^QP_Phot (1/ns)
        window_start=1.0,
        window_duration=2.5,
    ),
)

times = np.asarray(times)
mass = np.asarray(mass)
i_on = int(np.searchsorted(times, 1.0))
i_off = int(np.searchsorted(times, 3.5))
print(f"QP mass: initial {mass[0]:.3e}  pre-window {mass[i_on]:.3e}")
print(f"         window end {mass[i_off]:.3e}  final {mass[-1]:.3e}")
assert mass[i_off] > 5.0 * mass[0], "pair-breaking window should multiply the QP mass"
# post-window the mass is flat to ~1e-3 relative on this timescale (the
# two-body recombination lifetime at this density is ~µs)
assert abs(mass[-1] - mass[i_off]) < 5e-3 * mass[i_off], "drive leaked past its window"
# growth during the window is near-linear in time (generation-dominated)
half = mass[int(np.searchsorted(times, 2.25))]
assert 0.4 < half / mass[i_off] < 0.6, "window growth should be ~linear"

# spectral birth profile mid-window: occupation concentrated near the gap
# edge and its ω−Δ mirror (the K⁻·ρ·ρ weighting)
mid = int(np.searchsorted(times, 2.5))
spec = np.nansum(np.asarray(energy_frames[mid]), axis=(1, 2))
peak_bin = int(np.argmax(spec))
print(f"spectral peak at E = {E_bins[peak_bin]:.1f} µeV (gap edge {E_bins[0]:.1f})")
assert peak_bin <= 2, "generation should pile up at the gap edge"

out = pathlib.Path("12_pair_breaking_photons.out.txt")  # cwd-relative (test harness runs in tmp)
out.write_text(
    "t_ns total_qp_mass\n"
    + "\n".join(f"{t:.3f} {m:.6e}" for t, m in zip(times, mass))
)
print(f"trace written to {out.name}")
