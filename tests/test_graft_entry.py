"""Driver-contract tests for ``__graft_entry__``.

The driver invokes ``dryrun_multichip(n)`` in a FRESH interpreter with this
environment's frozen ``JAX_PLATFORMS=axon`` default (sitecustomize imports
jax at startup) and NO pytest conftest — so the entry point must
self-provision an n-device CPU mesh.  These tests reproduce that invocation
exactly via a subprocess (round 1 shipped a version that only worked under
the test harness's conftest; MULTICHIP_r01 failed with rc=1).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Environment as the driver would have it: no conftest overrides."""
    env = dict(os.environ)
    # Strip anything the test harness itself injected so the subprocess sees
    # the ambient (frozen-platform) environment the driver runs under.
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        tok for tok in flags.split() if "xla_force_host_platform_device_count" not in tok
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    return env


def test_dryrun_multichip_clean_interpreter():
    """`python -c "import __graft_entry__; dryrun_multichip(8)"` — driver-exact."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')"],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in a clean interpreter:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "OK" in proc.stdout


def test_dryrun_multichip_after_backend_init():
    """Backends already initialized (entry()-style) before the dry run."""
    code = (
        "import jax; jax.devices();"  # initialize the ambient backend first
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_clean_env(),
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed after backend init:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "OK" in proc.stdout
