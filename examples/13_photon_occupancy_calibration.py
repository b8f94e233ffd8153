"""Q vs n̄: the Fischer et al. (2024) photon-occupancy calibration curve.

The paper's central experiment: sweep the photon number n̄ in the resonator
mode and measure how the quasiparticle gas it creates loads the resonator
(δ(1/Q) from σ₁, δf/f from σ₂).  Here the whole sweep is ONE compiled
ensemble step: `make_chunk(photon=spec, photon_occupancy=n̄s)` runs every
member under its own drive strength on a packed super-grid, and the
Mattis–Bardeen integrals convert each member's spectral occupation into
the readout response.

What to look for in the output table:

  * QP density grows monotonically with n̄ (pair-breaking generation is
    linear in n̄ at low density);
  * δ(1/Q) rises and δf/f falls with n̄ — the loss/frequency signature an
    MKID actually reports;
  * the n̄ = 0 member stays empty: with a cold bath the drive is the only
    source, and spontaneous terms alone cannot break pairs.

Usage: python examples/13_photon_occupancy_calibration.py  (CPU, ~60 s)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qpsim_tpu.models.params import PhotonDriveSpec
from qpsim_tpu.observables import (
    PLANCK_UEV_PER_GHZ,
    mattis_bardeen_conductivity,
    occupation_from_spectral,
)
from qpsim_tpu.parallel.ensemble import build_film_ensemble

GAP = 180.0  # µeV (Al)
B = 6  # members = points on the calibration curve
NBARS = np.linspace(0.0, 4.0, B)

ens = build_film_ensemble(
    n_members=B,
    member_shape=(10, 20),
    gap=GAP,
    num_energy_bins=8,
    dt=0.05,
    dtype=jnp.float64,
)

spec = PhotonDriveSpec(
    mode="photon",
    photon_energy=2.5 * GAP,  # pair-breaking mode, ω > 2Δ
    occupancy=1.0,  # overridden per member below
    coupling=2e-4,
)
chunk = ens.make_chunk(30, unroll=4, photon=spec, photon_occupancy=NBARS)

q0 = np.zeros((B, ens.num_energy_bins, *ens.member_shape))
ph0 = ens.thermal_phonons(np.full(B, 0.05))  # near-cold bath
q, ph = ens.pack(q0, ph0)
q, ph = jnp.asarray(q), jnp.asarray(ph)
for _ in range(2):  # 60 steps = 3 ns of drive
    q, ph = chunk(q, ph)

qm, _ = ens.unpack(q, ph)  # (B, NE, ny, nx)
hnu = PLANCK_UEV_PER_GHZ * 5.0  # 5 GHz readout, far below 2Δ

print(f"{'nbar':>6} {'n_qp (a.u.)':>12} {'d(1/Q)':>12} {'df/f':>12}")
dq_curve, density_curve = [], []
s1_ref = s2_ref = None
for k in range(B):
    n_avg = qm[k].mean(axis=(1, 2))  # film-averaged spectral density
    f_avg = occupation_from_spectral(n_avg, ens.E_bins, GAP)
    s1, s2 = mattis_bardeen_conductivity(f_avg, ens.E_bins, GAP, hnu)
    if k == 0:
        s1_ref, s2_ref = s1, s2
    dq_inv = (s1 - s1_ref) / s2_ref
    df_f = 0.5 * (s2 - s2_ref) / s2_ref
    density = float(n_avg.sum() * ens.dE)
    dq_curve.append(dq_inv)
    density_curve.append(density)
    print(f"{NBARS[k]:6.2f} {density:12.4e} {dq_inv:12.4e} {df_f:12.4e}")

# the calibration curve is monotone: more photons -> more QPs -> more loss
# (the n̄=0 member holds only the ~e^{-2Δ/kT} bath-phonon floor, ~1e-42)
assert density_curve[0] < 1e-30, "n̄=0 member generated QPs from the drive"
assert all(
    b > a for a, b in zip(density_curve[1:], density_curve[2:])
), "QP density not monotone in n̄"
assert all(b >= a for a, b in zip(dq_curve, dq_curve[1:])), "δ(1/Q) not monotone"
print("OK: monotone Q-vs-n̄ calibration curve from one compiled ensemble step")
