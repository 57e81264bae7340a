"""The full multi-chip story must generalize beyond the default 8-device
mesh: run dryrun_multichip on a 16-device virtual mesh in a fresh
subprocess (device count is fixed at backend init, so it cannot run
in-process under the 8-device conftest)."""

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_dryrun_16_devices():
    code = (
        "import os;"
        "os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')"
        "+' --xla_force_host_platform_device_count=16';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(16)"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dp/tp train step" in proc.stdout
