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
    """Backends already initialized (entry()-style) before the dry run.

    The pre-initialized backend is a 1-device CPU client rather than the
    ambient axon tunnel: the scenario under test is the clear_backends +
    re-provision path, and touching the tunnel would make the TEST hang
    whenever the tunnel is wedged (observed; the entry code itself never
    touches it — see _provision_devices).
    """
    code = (
        "import jax;"
        "jax.config.update('jax_platforms', 'cpu'); jax.devices();"
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
