"""Test harness configuration.

Tests run on the **CPU backend in float64** with an 8-device virtual mesh
(``xla_force_host_platform_device_count``) so sharding tests exercise real
collectives without TPU hardware.

Note: this environment's ``sitecustomize`` imports jax at interpreter startup
with ``JAX_PLATFORMS=axon`` (a TPU tunnel), which freezes 'axon' as the
config default — setting the env var afterwards does nothing.  The config
update below overrides it before any backend is initialised; without it the
whole test suite would silently run over the TPU tunnel in float32.
"""

import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
