"""Pauli-exclusion monitoring: on-device stats, host-side enforcement.

The spectral density may never exceed the density of states (occupation
f = n/ρ ≤ 1) and must vanish where ρ ≈ 0.  The reference checks this with
host numpy after every step and raises/warns
(``/root/reference/qpsim/solver.py:967-996, 1296-1344``).  Here the per-step
statistics are *reduced on-device inside the scan* (a handful of scalars per
step) and enforcement — exceptions and warnings with the reference's message
format — happens on the host once per stored segment.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_pauli_stats_fn", "PauliEnforcer"]

_RHO_PRESENT = 1e-30


def make_pauli_stats_fn(rho_state, density_floor: float):
    """Build ``(stats, aux)`` with ``stats(q, aux) -> (max_occ, argmax_flat,
    forbidden_any, forbidden_flat)``.

    ``rho_state``: (NE, Ny, Nx) array; zero outside the mask and in
    gapped-out bins.  Returned indices are flat over (NE, Ny·Nx).  The ρ
    tables ride the caller's jit boundary as ARGUMENTS (``aux``), not
    closure constants: over the remote-TPU tunnel every closed-over device
    array costs a host round-trip fetch at ``.lower()`` time.
    """
    aux = (rho_state > _RHO_PRESENT, jnp.maximum(rho_state, _RHO_PRESENT))

    def stats(q: jax.Array, aux):
        rho_mask, rho_safe = aux
        f = jnp.where(rho_mask, q / rho_safe, 0.0)
        f_flat = f.reshape(-1)
        argmax = jnp.argmax(f_flat)
        forbidden = (~rho_mask) & (q > density_floor)
        fb_flat = forbidden.reshape(-1)
        return (
            f_flat[argmax],
            argmax.astype(jnp.int32),
            jnp.any(fb_flat),
            jnp.argmax(fb_flat).astype(jnp.int32),
        )

    return stats, aux


@dataclass
class PauliEnforcer:
    """Host-side policy: raise or warn when occupation limits are crossed."""

    E_bins: np.ndarray
    grid_shape: tuple[int, int]
    enforce: bool = True
    warn_threshold: float | None = 0.5
    error_threshold: float | None = 1.0
    warned: bool = False

    def _locate(self, flat_idx: int) -> tuple[int, int, int]:
        ny, nx = self.grid_shape
        ie, rem = divmod(int(flat_idx), ny * nx)
        row, col = divmod(rem, nx)
        return ie, row, col

    def check(
        self,
        step_idx: int,
        time_ns: float,
        max_occ: float,
        argmax_flat: int,
        forbidden_any: bool,
        forbidden_flat: int,
    ) -> None:
        if forbidden_any:
            ie, row, col = self._locate(forbidden_flat)
            msg = (
                "Detected non-zero quasiparticle density in forbidden state "
                f"(rho≈0): step={step_idx}, t={time_ns:.6g} ns, "
                f"E={self.E_bins[ie]:.6g} μeV, pixel=({row},{col})."
            )
            if self.enforce:
                raise ValueError(msg)
            if not self.warned:
                warnings.warn(msg, stacklevel=2)
                self.warned = True

        if self.error_threshold is not None and max_occ > self.error_threshold:
            ie, row, col = self._locate(argmax_flat)
            msg = (
                f"Pauli occupation exceeded limit: f={max_occ:.6g} > "
                f"{self.error_threshold:.6g} at step={step_idx}, t={time_ns:.6g} ns, "
                f"E={self.E_bins[ie]:.6g} μeV, pixel=({row},{col})."
            )
            if self.enforce:
                raise ValueError(msg)
            if not self.warned:
                warnings.warn(msg, stacklevel=2)
                self.warned = True

        if (
            self.warn_threshold is not None
            and max_occ > self.warn_threshold
            and not self.warned
        ):
            ie, row, col = self._locate(argmax_flat)
            warnings.warn(
                "High occupation detected (Pauli blocking regime): "
                f"max f={max_occ:.6g} at step={step_idx}, t={time_ns:.6g} ns, "
                f"E={self.E_bins[ie]:.6g} μeV, pixel=({row},{col}).",
                stacklevel=2,
            )
            self.warned = True
