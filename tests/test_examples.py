"""Examples stay runnable (gated: RUN_EXAMPLES=1 to include — they re-run
full pipelines and add ~2 min)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
EXAMPLES = sorted((ROOT / "examples").glob("0*.py"))

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_EXAMPLES") != "1",
    reason="set RUN_EXAMPLES=1 to run the examples end-to-end")


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    code = (f"import jax; jax.config.update('jax_platforms','cpu');"
            f"exec(open({str(path)!r}).read())")
    proc = subprocess.run([sys.executable, "-c", code], cwd=ROOT, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
