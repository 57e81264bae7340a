"""Examples run in CI by default (CPU-sized, interpreter mode) — they are
the de-facto integration tests of the public API, like the reference's
always-on ctest (``CMakeLists.txt:150-163``).  They execute in their own
subprocesses, so this file adds wall time (~2 min) but no state."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((ROOT / "examples").glob("[0-9]*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (f"import jax; jax.config.update('jax_platforms','cpu');"
            f"exec(open({str(path)!r}).read())")
    proc = subprocess.run([sys.executable, "-c", code], cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
