"""Each checked-in example must run end-to-end (CPU, subprocess).

The examples are user-facing documentation of the public API — a rename or
contract change that breaks one ships silently without this guard.  Slow-
marked: ~90 s total on CPU.
"""
from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest

_EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "examples").glob("[0-9]*.py")
)


@pytest.mark.slow
@pytest.mark.parametrize("script", _EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(script: pathlib.Path, tmp_path):
    proc = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=tmp_path,  # examples write result files relative to cwd
    )
    assert proc.returncode == 0, f"{script.name} failed:\n{proc.stderr[-2000:]}"
