"""Fused distributed kernels: inter-chip RDMA inside the compute kernel.

Unlike the XLA-collective decompositions (example 04), these run the whole
distributed algorithm — data movement included — inside one Pallas kernel
per chip: `make_async_remote_copy` forwards operand blocks along the ring /
torus while the MXU consumes them. On the virtual CPU mesh the interpreter
executes the real RDMA/semaphore protocol.

    python examples/08_fused_distributed_kernels.py
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

# Force the virtual host mesh BEFORE any device query: the first query
# initializes the backend (a live single-chip TPU would win and pin the
# platform), and env vars alone lose to an already-registered PJRT plugin.
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from gemm_hls_tpu.ops.pallas_cannon import cannon_matmul_fused  # noqa: E402
from gemm_hls_tpu.ops.pallas_ring import (  # noqa: E402
    ring_matmul, shard_operands_ring,
)
from gemm_hls_tpu.utils import make_operands, verify_matmul  # noqa: E402

# --- 1-D ring: B blocks circulate while each chip computes ---------------
n_dev = 8
mesh = Mesh(np.array(jax.devices()[:n_dev]).reshape(n_dev), ("x",))
m, n, k = 8 * n_dev, 16 * n_dev, 64
a, b = make_operands(m, n, k, "float32")
a_s, b_s = shard_operands_ring(jnp.asarray(a), jnp.asarray(b), mesh)
c = ring_matmul(a_s, b_s, mesh)
verify_matmul(np.asarray(c), a.astype(np.float64) @ b)
print(f"fused RDMA ring matmul on {n_dev} devices: verified "
      f"({n_dev - 1} hidden neighbor transfers)")

# Tiled variant: K streamed through VMEM inside each ring step.
c = ring_matmul(a_s, b_s, mesh, block_k=32)  # interpret mode permits <128
verify_matmul(np.asarray(c), a.astype(np.float64) @ b)
print("tiled ring (out-of-VMEM locals, 3-level overlap): verified")

# --- 2-D fused Cannon: RDMA skew + torus shifts ---------------------------
m2 = n2 = k2 = 64
a2, b2 = make_operands(m2, n2, k2, "float32")
c2 = cannon_matmul_fused(jnp.asarray(a2), jnp.asarray(b2), p=2)
verify_matmul(np.asarray(c2), a2.astype(np.float64) @ b2)
print("fused 2x2 Cannon (in-kernel skew + shifts): verified")
