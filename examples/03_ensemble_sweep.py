"""32-member bath-temperature sweep as ONE compiled super-grid.

Every member is a full coupled 2D film; members are exactly decoupled by
masked separator rows, so one jitted step advances the whole sweep at
on-chip batch throughput (the reference runs one simulation per process).

Usage: python examples/03_ensemble_sweep.py
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

n_members = 8
ens = build_film_ensemble(
    n_members=n_members,
    member_shape=(16, 16),
    num_energy_bins=6,
    dt=0.05,
    dtype=jnp.float64,
)
bath_temps = np.linspace(0.05, 0.4, n_members)
rng = np.random.default_rng(0)
q_members = np.broadcast_to(
    rng.uniform(0, 1e-4, (1, 6, 16, 16)), (n_members, 6, 16, 16)
).copy()
q, ph = ens.pack(q_members, ens.thermal_phonons(bath_temps))

@jax.jit
def run(state):
    return jax.lax.scan(lambda c, _: (ens.step(*c), None), state, None, length=100)[0]

q, ph = run((jnp.asarray(q), jnp.asarray(ph)))
q_out, _ = ens.unpack(np.asarray(q), np.asarray(ph))
totals = q_out.reshape(n_members, -1).sum(axis=1)
print("bath T (K) -> final QP number (hotter bath => more pair breaking):")
for T, n in zip(bath_temps, totals):
    print(f"  {T:.2f}       {n:.4e}")
assert totals[-1] > totals[0]
