"""Smoke tests for the examples/ surface: each runs as a real subprocess on
the CPU backend with a fabricated checkpoint and a tiny generation length
(the reference validates its examples only by hand; here they gate CI)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CASES = [
    ("example_basic.py", []),
    ("example_batch.py", []),
    ("example_cfg.py", []),
    ("example_speculative.py", []),
]


@pytest.mark.parametrize("script,extra", CASES)
def test_example_runs(script, extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # --cpu sets the platform itself
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script),
         "--synthetic", "tiny", "--cpu", "-l", "128", "--max_new", "6",
         *extra],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (script, r.stdout[-800:], r.stderr[-800:])
    assert r.stdout.strip(), (script, "no output")
