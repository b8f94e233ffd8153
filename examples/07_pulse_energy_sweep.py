"""Per-member photon-pulse sweep: an MKID calibration curve in one step.

Builds a film ensemble whose members receive pulses of different energies
(rates) in a shared window, advances them as ONE compiled super-grid, and
prints the peak quasiparticle response per member — the detector's
response-vs-energy calibration, computed for all members simultaneously.

Usage: python examples/07_pulse_energy_sweep.py  (CPU, a few seconds)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qpsim_tpu.parallel.ensemble import build_film_ensemble

B = 6
rates = 1e-6 * 2.0 ** np.arange(B)  # pulse energies spanning 32x
ens = build_film_ensemble(
    n_members=B,
    member_shape=(16, 24),
    num_energy_bins=8,
    dt=0.05,
    tau_s=440.0,
    tau_r=440.0,
    dtype=jnp.float64,
)

plane = ens.generation_plane(rates)
q0 = np.zeros((B, ens.num_energy_bins, *ens.member_shape))
ph0 = ens.thermal_phonons(np.full(B, 0.2))
q, ph = ens.pack(q0, ph0)
q, ph = jnp.asarray(q), jnp.asarray(ph)

# 0.4 ns pulse, then 1.6 ns of relaxation, chunked so we can sample peaks
chunk = ens.make_chunk(4, gen_plane=plane, pulse_window=(0.0, 0.4))
peaks = np.zeros(B)
t = 0.0
for _ in range(10):
    q, ph = chunk(q, ph, t)
    t += 4 * 0.05
    qm, _ = ens.unpack(q, ph)
    totals = qm.sum(axis=(1, 2, 3)) * ens.dE
    peaks = np.maximum(peaks, totals)

print("pulse rate -> peak QP response (all members advanced together):")
for r, p in zip(rates, peaks):
    print(f"  rate {r:.1e} /ns  peak {p:.4e}")
ratio = peaks / peaks[0]
print(f"response linearity across 32x energy span: {ratio[-1] / 32:.4f} (1.0 = linear)")
assert np.all(np.diff(peaks) > 0), "response must increase with pulse energy"
