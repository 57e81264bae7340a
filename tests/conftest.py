"""Test environment: 8 fake CPU devices + x64.

The analogue of the reference's hlslib software dataflow simulation
(``test/TestSimulation.cpp``): the *same* kernel and decomposition code runs
on CPU — Pallas kernels in interpreter mode, multi-chip shardings on a
virtual 8-device mesh — with no TPU hardware in the loop.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# JAX_PLATFORMS; point the config back at CPU before any backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
