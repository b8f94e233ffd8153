"""Multi-chip simulation on a device mesh (virtual 8-device CPU here).

The engine's ``mesh=`` path shards the (NE, Ny, Nx) state by rows over the
mesh's 'space' axis: collisions stay pixel-local, the explicit stencil
exchanges one-row halos over ICI (`ppermute`), and the implicit y-sweep
crosses shards either by pencil transposes (`all_to_all`, default) or the
distributed Wang partition (``QPSIM_MESH_Y_SOLVE=wang`` — one small
`all_gather` of interface rows, ~40× less traffic by the model).  Stepping,
snapshots, Pauli monitoring and persistence keep single-chip semantics; on
real hardware the same script runs unchanged (drop the CPU-platform lines,
or use ``python -m qpsim_tpu run setup.json --space-shards N``).

Usage: python examples/10_multichip_mesh.py  (CPU, ~30 s)
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_num_cpu_devices", 8)  # the virtual mesh

import numpy as np

from qpsim_tpu import run_2d_crank_nicolson
from qpsim_tpu.geometry.mask import create_intrinsic_geometry, mask_from_lists
from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec
from qpsim_tpu.parallel.mesh import make_mesh

geo = create_intrinsic_geometry(width=32, height=32)
mask = mask_from_lists(geo.mask)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in geo.edges}
kw = dict(
    mask=mask,
    edges=geo.edges,
    edge_conditions=bcs,
    initial_field=np.where(mask, 1e-5, 0.0),
    diffusion_coefficient=6.0,
    dt=0.05,
    total_time=1.5,
    dx=1.0,
    store_every=6,
    energy_gap=180.0,
    energy_max_factor=3.0,
    num_energy_bins=6,
    enable_recombination=True,
    enable_scattering=True,
    bath_temperature=0.1,
    external_generation=ExternalGenerationSpec(
        mode="pulse", pulse_start=0.1, pulse_duration=0.3, pulse_rate=1e-4
    ),
)

mesh = make_mesh(n_space=8)
print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

# default cross-shard y-sweep (pencil transposes); auto stepping = merged
t_m, f_m, m_m, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)

# single-chip run for comparison (same auto stepping)
t_s, f_s, m_s, *_ = run_2d_crank_nicolson(**kw)

err = max(
    abs(a - b) / max(abs(b), 1e-30) for a, b in zip(m_m, m_s)
)
print(f"mesh vs single-chip mass trace: max rel err {err:.2e}")
assert err < 1e-11

# the distributed-Wang y-sweep (the low-ICI-traffic option)
os.environ["QPSIM_MESH_Y_SOLVE"] = "wang"
t_w, f_w, m_w, *_ = run_2d_crank_nicolson(**kw, mesh=mesh)
err_w = max(
    abs(a - b) / max(abs(b), 1e-30) for a, b in zip(m_w, m_m)
)
print(f"wang vs pencil y-sweep:         max rel err {err_w:.2e}")
assert err_w < 1e-12

print("\npulse response (QP number):")
for t, m in zip(t_m, m_m):
    bar = "#" * int(60 * m / max(m_m))
    print(f"  t={t:5.2f} ns  {m:9.4g}  {bar}")
print("\nmulti-chip == single-chip physics; both y-sweep strategies agree")
