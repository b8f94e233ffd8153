"""Persistent XLA compilation cache wiring (utils/compile_cache.py).

The real win is on TPU (129 s Mosaic compiles at 64 bins paid once per
machine); on the CPU test backend we verify the wiring: config flags set,
directory created, opt-out honored, and a cross-process cache hit observed
via JAX's own task metrics.
"""

import os
import subprocess
import sys

import jax

from qpsim_tpu.utils import compile_cache


def test_enable_points_jax_at_the_directory(tmp_path):
    target = str(tmp_path / "xla-cache")
    prev = jax.config.jax_compilation_cache_dir
    prev_active = compile_cache._active_dir
    try:
        out = compile_cache.enable_persistent_cache(target)
        assert out == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
        # idempotent: second call is a no-op returning the same dir
        assert compile_cache.enable_persistent_cache(target) == target
    finally:
        compile_cache._active_dir = prev_active
        jax.config.update("jax_compilation_cache_dir", prev)


def test_opt_out_env_var(tmp_path, monkeypatch):
    monkeypatch.setenv("QPSIM_PERSISTENT_CACHE", "0")
    assert compile_cache.maybe_enable_persistent_cache() is None


def test_cache_dir_env_override_is_host_scoped(tmp_path, monkeypatch):
    # default/env dirs gain a host-<cpu-feature-hash> subdir so AOT CPU
    # executables never cross host microarchitectures (SIGILL risk after a
    # VM migration); explicit enable_persistent_cache(dir) stays verbatim
    target = str(tmp_path / "custom")
    monkeypatch.setenv("QPSIM_COMPILE_CACHE_DIR", target)
    monkeypatch.delenv("QPSIM_PERSISTENT_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    prev_active = compile_cache._active_dir
    try:
        out = compile_cache.maybe_enable_persistent_cache()
        assert os.path.dirname(out) == target
        assert os.path.basename(out).startswith("host-")
        assert os.path.isdir(out)
        assert compile_cache.cache_dir_configured() == out
    finally:
        compile_cache._active_dir = prev_active
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cross_process_cache_hit(tmp_path):
    """Second process compiling the same program writes nothing new to the
    cache directory (it loaded the persisted executable)."""
    cache = str(tmp_path / "xc")
    prog = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from qpsim_tpu.utils.compile_cache import enable_persistent_cache\n"
        f"enable_persistent_cache({cache!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "import jax.numpy as jnp\n"
        "x = jnp.arange(4096.0).reshape(64, 64)\n"
        "print(float(jax.jit(lambda a: (a @ a.T).sum())(x)))\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for i in range(2):
        r = subprocess.run(
            [sys.executable, "-c", prog], env=env, capture_output=True, text=True, timeout=120
        )
        assert r.returncode == 0, r.stderr[-1500:]
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
        if i == 0:
            assert n_entries > 0  # first process persisted the executable
            first = n_entries
    assert n_entries == first  # second process added nothing: cache hit
