#!/usr/bin/env python
"""One tunnel-health probe: exit 0 if a trivial jit completes on the ambient
(axon) backend within the timeout, 1 otherwise.

The probe must run the jit in a CHILD process: a wedged tunnel blocks inside
native code, where no in-process timeout can fire (CLAUDE.md).  This wrapper
owns the timeout; the child does the dispatch.
"""
from __future__ import annotations

import subprocess
import sys

TIMEOUT_S = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0

_CHILD = (
    "import jax, jax.numpy as jnp;"
    "print(jax.default_backend());"
    "print(float(jax.jit(lambda x: x + 1)(jnp.ones(()))))"
)


def main() -> int:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD],
            timeout=TIMEOUT_S,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"probe: TIMEOUT after {TIMEOUT_S:.0f}s (tunnel down)")
        return 1
    if r.returncode != 0:
        print(f"probe: child failed rc={r.returncode}: {r.stderr.strip()[-300:]}")
        return 1
    backend = r.stdout.split()[0] if r.stdout.split() else "?"
    print(f"probe: OK backend={backend}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
