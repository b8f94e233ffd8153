"""Cross-call compiled-program cache for the energy-resolved engine.

``run_2d_crank_nicolson`` used to rebuild (and therefore re-jit) its
segment runners on every call — minutes of remote-TPU compile per call at
1024²×16 (the reference GUI runs the same setup again and again,
/root/reference/qpsim/ui/main_app.py:1873).  The compiled program depends
only on the *configuration* (geometry, BCs, energy grid, kernels, toggles,
dtype), not on the initial state or run length, so it is cached at module
level keyed on a fingerprint of exactly those inputs; a second run with
the same setup compiles nothing (tests/test_engine.py asserts zero new
traces via ``engine_trace_count``).
"""

from __future__ import annotations

import hashlib
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "engine_trace_count",
    "clear_engine_program_cache",
    "_EngineProgram",
    "_get_engine_program",
    "_bump_trace",
]

_TRACE_EVENTS = 0  # incremented whenever a segment/step body is traced


def engine_trace_count() -> int:
    """Number of segment-runner traces since import (test/diagnostic hook)."""
    return _TRACE_EVENTS



def _bump_trace() -> None:
    """Called by every segment/step body the moment it is traced."""
    global _TRACE_EVENTS
    _TRACE_EVENTS += 1


@dataclass
class _EngineProgram:
    pmap: Any
    segment_runner: Callable  # (seg_dt, length) -> compiled segment fn
    single_step: Callable  # (seg_dt,) -> compiled (q, ph, t_start) one-step fn
    pauli_stats_jit: Callable
    host_gen: bool
    q_sharding: Any = None  # set in mesh mode: expected state placement
    ph_sharding: Any = None


_PROGRAM_CACHE: "OrderedDict[str, _EngineProgram]" = OrderedDict()
_PROGRAM_CACHE_MAX = 4
_PROGRAM_CACHE_LOCK = threading.Lock()


def clear_engine_program_cache() -> None:
    """Drop all cached compiled programs (frees their captured device arrays)."""
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE.clear()


def _hash_update_array(h, a) -> None:
    a = np.ascontiguousarray(a)
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(a.tobytes())


def _engine_program_key(
    *,
    mask,
    edges,
    edge_conditions,
    dx,
    dtype,
    gap,
    E_bins,
    dE,
    num_energy_bins,
    diffusion_coefficient,
    enable_diffusion,
    diffusion_backend,
    precomputed,
    nonuniform_gap,
    enable_recombination,
    enable_scattering,
    dynes_gamma,
    tau_s_eff,
    tau_r_eff,
    T_c,
    freeze_phonon_dynamics,
    collision_backend,
    pixel_chunk,
    external_generation,
    pauli_density_floor,
    strang_mode,
    photon_drive=None,
    mesh=None,
    mesh_y_solve="pencil",
) -> str:
    h = hashlib.sha256()

    def put(*vals):
        h.update(repr(vals).encode())

    put(
        "engine-program-v1",
        jax.default_backend(),
        str(jnp.dtype(dtype)),
        bool(jax.config.jax_enable_x64),
        mask.shape,
        float(dx),
        float(gap),
        float(dE),
        int(num_energy_bins),
        float(diffusion_coefficient),
        bool(enable_diffusion),
        str(diffusion_backend),
        bool(nonuniform_gap),
        bool(enable_recombination),
        bool(enable_scattering),
        float(dynes_gamma),
        float(tau_s_eff),
        float(tau_r_eff),
        float(T_c),
        bool(freeze_phonon_dynamics),
        str(collision_backend),
        int(pixel_chunk),
        float(pauli_density_floor),
        str(strang_mode),
        # pair-walk emission order of the Pallas collision kernels — changes
        # float accumulation order, so programs are not interchangeable
        os.environ.get("QPSIM_COLL_WALK", "pair"),
        # separable ADI fast path: different elimination rounding
        os.environ.get("QPSIM_ADI_SEPARABLE", "1"),
        # opt-in nb>1 separable form (per-bin factor packs)
        os.environ.get("QPSIM_ADI_SEPARABLE_MB", "0"),
    )
    if mesh is not None:
        put(
            "mesh",
            tuple(mesh.shape.items()),
            tuple((int(d.id), str(d.platform)) for d in np.asarray(mesh.devices).flat),
            str(mesh_y_solve),
        )
    _hash_update_array(h, np.packbits(np.asarray(mask, dtype=bool)))
    _hash_update_array(h, np.asarray(E_bins, dtype=np.float64))
    for e in edges:
        put(
            e.edge_id,
            e.x0,
            e.y0,
            e.x1,
            e.y1,
            e.normal,
            tuple((f.row, f.col, f.direction) for f in e.faces),
        )
    for eid in sorted(edge_conditions):
        bc = edge_conditions[eid]
        put(eid, bc.kind, bc.value, bc.aux_value)
    if external_generation is not None:
        put(
            external_generation.mode,
            external_generation.rate,
            external_generation.pulse_start,
            external_generation.pulse_duration,
            external_generation.pulse_rate,
            external_generation.custom_body,
        )
        for k in sorted(external_generation.custom_params):
            v = external_generation.custom_params[k]
            if isinstance(v, np.ndarray):
                put("param-array", k)
                _hash_update_array(h, v)
            else:
                put(k, v)
    if photon_drive is not None:
        from ..models.params import photon_drive_specs

        for spec in photon_drive_specs(photon_drive):
            put(
                "photon-drive",
                spec.photon_energy,
                spec.occupancy,
                spec.coupling,
                spec.include_scattering,
                spec.include_pair_breaking,
                spec.window_start,
                spec.window_duration,
            )
    if precomputed is not None:
        put("precomputed", bool(np.asarray(precomputed.get("is_uniform", True)).reshape(-1)[0]))
        _hash_update_array(h, np.asarray(precomputed["D_array"], dtype=np.float64))
        if "gap_values" in precomputed:
            _hash_update_array(h, np.asarray(precomputed["gap_values"], dtype=np.float64))
    return h.hexdigest()


def _get_engine_program(**kw) -> _EngineProgram:
    from .program_build import _build_engine_program  # deferred: build imports us

    key = _engine_program_key(**kw)
    with _PROGRAM_CACHE_LOCK:
        prog = _PROGRAM_CACHE.get(key)
        if prog is not None:
            _PROGRAM_CACHE.move_to_end(key)
            return prog
    prog = _build_engine_program(**kw)
    with _PROGRAM_CACHE_LOCK:
        _PROGRAM_CACHE[key] = prog
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    return prog
