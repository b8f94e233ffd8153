"""qpsim_tpu — TPU-native nonequilibrium quasiparticle & phonon kinetics.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Soren-O/Quasiparticle-Physics-Simulation: energy-resolved quasiparticle and
phonon dynamics in superconducting thin films (MKIDs, qubit films) on masked
2D geometries — Strang-split Crank–Nicolson diffusion + Fischer–Catelani
coupled collision kinetics — with jit-compiled `lax.scan` time stepping,
MXU-batched collision einsums, dense-spectral / ADI diffusion backends, and
`jax.sharding` multi-chip scaling.

Public API mirrors the reference package façade
(``/root/reference/qpsim/__init__.py``) plus the full engine surface.
"""

from .validation import ValidationReport, run_fast_validation_suite
from .solver.engine import run_2d_crank_nicolson
from .runner import run_setup

__version__ = "0.1.0"

__all__ = [
    "ValidationReport",
    "run_fast_validation_suite",
    "run_2d_crank_nicolson",
    "run_setup",
    "__version__",
]
