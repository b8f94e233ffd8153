"""Cross-process persistent XLA compilation cache.

TPU Mosaic compiles for the collision kernels are expensive — the unrolled
pair kernel costs ~28 s at 48 bins and ~129 s at 64 bins per FRESH PROCESS,
and the first full-engine compile over a remote tunnel runs minutes.  The
in-process program cache (solver/engine.py) only amortizes within one
interpreter; this module turns on JAX's on-disk compilation cache so the
compiled executables (including their embedded Mosaic kernels) are reused
across processes on the same machine.

The reference has no analog (pure NumPy, nothing to compile); the closest
capability is its precompute NPZ sidecar that resumes expensive *operator
construction* across runs (/root/reference/qpsim/precompute.py:173-287) —
this is the same idea applied to compiled programs.

Environment knobs:
  QPSIM_COMPILE_CACHE_DIR  cache location (default ~/.cache/qpsim_tpu/xla)
  QPSIM_PERSISTENT_CACHE   set to "0" to disable auto-enabling
"""

from __future__ import annotations

import hashlib
import os
import platform

__all__ = [
    "cache_dir_configured",
    "enable_persistent_cache",
    "maybe_enable_persistent_cache",
]

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "qpsim_tpu", "xla")
_active_dir: str | None = None


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    JAX's persistent cache keys entries on backend + compiler version but
    NOT on the host microarchitecture: an XLA:CPU executable AOT-compiled
    on a host with (say) AMX loads on a lesser host with a SIGILL risk
    (observed after a VM migration — ``cpu_aot_loader`` "machine type ...
    doesn't match" errors).  Scoping the cache directory by CPU-feature
    hash gives each microarchitecture its own cache; a migrated VM
    recompiles once instead of executing foreign code.
    """
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha256(platform.machine().encode()).hexdigest()[:10]


def _resolved_default_dir() -> str:
    base = os.environ.get("QPSIM_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    return os.path.join(base, f"host-{_host_fingerprint()}")


def cache_dir_configured() -> str | None:
    """The directory runs will use (without enabling anything), or None
    when opted out via QPSIM_PERSISTENT_CACHE=0."""
    if os.environ.get("QPSIM_PERSISTENT_CACHE", "1") == "0":
        return None
    return _active_dir or _resolved_default_dir()


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` and return it.

    Idempotent; safe to call before or after backend initialisation (entries
    are keyed on backend + compiler version, so CPU and TPU programs
    coexist).  Only compiles taking >1 s are persisted — trivial test jits
    stay out of the cache.  Returns None (cache disabled) if the directory
    cannot be created.

    When ``cache_dir`` is not given, the default (or ``QPSIM_COMPILE_CACHE_DIR``)
    gains a ``host-<cpu-feature-hash>`` subdirectory so executables never
    cross host microarchitectures (see :func:`_host_fingerprint`); an
    explicit argument is used verbatim — such callers manage their own
    scoping.
    """
    global _active_dir
    if cache_dir is None:
        cache_dir = _resolved_default_dir()
    if _active_dir == cache_dir:
        return cache_dir

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except OSError:
        # the cache is purely an optimization — an unwritable HOME or full
        # disk must not take down the simulation that asked for it
        return None
    _active_dir = cache_dir
    return cache_dir


def maybe_enable_persistent_cache() -> str | None:
    """Auto-enable unless opted out via ``QPSIM_PERSISTENT_CACHE=0``.

    Called by the engine at program-build time and by bench.py: anything
    about to pay a Mosaic/XLA compile routes through here first.
    """
    if os.environ.get("QPSIM_PERSISTENT_CACHE", "1") == "0":
        return None
    return enable_persistent_cache()
