"""Bounded-memory long run: stream stored frames to disk, read them back lazily.

The reference keeps every stored frame in host RAM until the run finishes
(/root/reference/qpsim/solver.py:1479-1494) — at production sizes
(1024²×16 bins, store_every=10, 10k steps ≈ 128 GB) long frequently-stored
runs are simply impossible.  Here the engine hands each snapshot to a
FrameStreamWriter the moment it leaves the device; nothing per-frame stays
in memory, and the stream is browsed lazily afterwards (or rendered with
`python -m qpsim_tpu view <dir>`).

Usage: python examples/08_streamed_long_run.py  (CPU, ~a minute)
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
from qpsim_tpu.io.stream import (
    FrameStreamWriter,
    estimate_history_memory,
    load_frame_stream,
)
from qpsim_tpu.models.params import BoundaryCondition, ExternalGenerationSpec

mask = np.ones((1, 256), dtype=bool)  # 256 µm MKID wire
edges = extract_edge_segments(mask)
bcs = {e.edge_id: BoundaryCondition(kind="reflective") for e in edges}

run = dict(
    mask=mask,
    edges=edges,
    edge_conditions=bcs,
    initial_field=np.zeros(mask.shape),
    diffusion_coefficient=6.0,  # µm²/ns
    dt=0.05,                    # ns
    total_time=200.0,           # 4000 steps
    dx=1.0,
    store_every=10,             # 400+ stored snapshots
    energy_gap=180.0,           # µeV (Al)
    energy_max_factor=4.0,
    num_energy_bins=16,
    enable_recombination=True,
    enable_scattering=True,
    tau_r=20.0,                 # fast recombination: decay visible in 200 ns
    bath_temperature=0.0,       # K — cold bath, no thermal generation
    freeze_phonon_dynamics=True,  # no phonon re-absorption feeding QPs back
    external_generation=ExternalGenerationSpec(
        mode="pulse", pulse_start=1.0, pulse_duration=2.0, pulse_rate=1e-4
    ),
)

est = estimate_history_memory(
    grid_shape=mask.shape,
    dt=run["dt"],
    total_time=run["total_time"],
    store_every=run["store_every"],
    num_energy_bins=run["num_energy_bins"],
    record_phonons=False,
)
print(f"in-memory history would need ~{est / 2**20:.0f} MB "
      f"(scales to ~128 GB at 1024²; streaming keeps it at one snapshot)")

out = pathlib.Path(__file__).parent / "_stream_out"
with FrameStreamWriter(out) as writer:
    times, frames, mass, clim, *_ = run_2d_crank_nicolson(**run, frame_sink=writer)
assert frames == []  # nothing accumulated in RAM

reader = load_frame_stream(out)
print(f"streamed {len(reader)} snapshots -> {out}")
print(f"color limits over the whole run: [{reader.color_limits[0]:.3g}, "
      f"{reader.color_limits[1]:.3g}]")

# lazy access: one shard in memory at a time
peak_t, peak_total = max(
    ((t, float(np.nansum(f))) for t, f in reader.iter_frames()), key=lambda p: p[1]
)
print(f"peak integrated QP density {peak_total:.4g} at t = {peak_t:g} ns")
decayed = reader.mass_over_time[-1] / max(reader.mass_over_time)
print(f"final mass is {decayed:.1%} of peak after the pulse decays")
