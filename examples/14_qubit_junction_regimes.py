"""Nonequilibrium regimes in a gap-asymmetric transmon junction.

Marchegiani & Catelani (Commun. Phys. 8, 120, 2025) — the second entry in
the reference repo's "Not yet Implemented" queue.  Quasiparticles in a
junction with Δ_L > Δ_R split into three populations (high-gap side, and
low-gap side above/below Δ_L); pair-breaking photons keep them out of
equilibrium at base temperature while thermal phonon generation wins at
high temperature.  Sweeping T and converting steady-state densities to
effective chemical potentials μ_α = T·ln(x_α/x_α^eq) reproduces the
paper's regime ladder:

  nonequilibrium → local quasiequilibrium → global quasiequilibrium
  → full equilibrium

Also printed: the charge-parity switching rate — the experimentally
anchored observable (photon floor γ^ph plus quasiparticle tunneling).

Usage: python examples/14_qubit_junction_regimes.py  (CPU, ~10 s)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from qpsim_tpu.qubit import JunctionParams, temperature_sweep

CASES = {
    # small asymmetry, strong intra-R relaxation: the R populations share
    # one chemical potential — ladder (ii) → (iii) → (iv) (paper Fig. 3a)
    "small asymmetry (10 µeV), strong relaxation": JunctionParams(
        gap_L=190.0, gap_R=180.0, omega_10=20.0,
        gamma_ph=3.0e-7,        # photon-assisted parity rate: 300 Hz (paper)
        cooper_pairs_L=1.0e9,   # µm³-scale electrode
        tau_R=5.0e4,
    ),
    # large asymmetry, weak relaxation: trapped sub-Δ_L quasiparticles
    # hold their own μ — full nonequilibrium (i) at base T (Fig. 3b)
    "large asymmetry (21 µeV), weak relaxation": JunctionParams(
        gap_L=190.0, gap_R=169.0, omega_10=20.0,
        gamma_ph=3.0e-7, cooper_pairs_L=1.0e9,
        tau_R=1.0e7, photon_split_gt=0.5,
    ),
}

seen: set[str] = set()
for label, params in CASES.items():
    out = temperature_sweep(
        params,
        np.linspace(0.02, 0.28, 14),
        l_rates=dict(l_00=3.0, l_11=2.0, l_10=5.0, l_01=1.0),
    )
    print(f"\n=== {label} ===")
    print(f"{'T (K)':>6} {'x_L':>10} {'mu_L':>8} {'mu_R>':>8} {'mu_R<':>8} "
          f"{'parity (Hz)':>12}  regime")
    for k, T in enumerate(out["temperatures_K"]):
        mu = out["mu_ueV"][k]
        print(
            f"{T:6.3f} {out['states'][k, 0]:10.3e} "
            f"{mu[0]:8.2f} {mu[1]:8.2f} {mu[2]:8.2f} "
            f"{out['parity_rate_per_ns'][k] * 1e9:12.1f}  {out['regimes'][k]}"
        )
    seen.update(out["regimes"])
    assert out["regimes"][-1] == "full_equilibrium"
    assert out["regimes"][0] != "full_equilibrium"

assert len(seen) >= 4, f"regime ladder incomplete: {sorted(seen)}"
print("\nOK: the two junctions together traverse all four regimes — "
      "photon-driven nonequilibrium at base T relaxes to full equilibrium "
      "as thermal phonon generation takes over")
