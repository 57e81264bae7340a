"""Distributed CA-GEMM: SUMMA / Cannon / 2.5D over a device mesh.

On real multi-chip hardware the mesh maps onto the ICI torus; here it runs
identically on a virtual 8-device CPU mesh.

    python examples/04_distributed.py
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

from gemm_hls_tpu.parallel import (  # noqa: E402
    cannon_matmul, make_mesh, matmul_25d, mesh_25d, shard_operands_2d,
    shard_operands_25d, summa_matmul,
)
from gemm_hls_tpu.utils import make_operands, verify_matmul  # noqa: E402

m, n, k = 128, 256, 512
a, b = make_operands(m, n, k, "float32")
exp = a.astype(np.float64) @ b

# 2-D gather-SUMMA on an auto-shaped mesh.
mesh = make_mesh()
a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
c = summa_matmul(a_s, b_s, mesh)
verify_matmul(np.asarray(c), exp)
print(f"SUMMA on {dict(mesh.shape)}: verified; C sharding "
      f"{c.sharding.spec}")

# Cannon on a square sub-mesh (joint-axis ppermute skew + torus shifts).
mesh_sq = make_mesh((2, 2), devices=jax.devices()[:4])
a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh_sq)
c = cannon_matmul(a_s, b_s, mesh_sq)
verify_matmul(np.asarray(c), exp)
print("Cannon on (2,2): verified")

# 2.5D: replicate the grid, split K, reduce over z — sqrt(c) less comm.
mesh3 = mesh_25d(c=2)
a_s, b_s = shard_operands_25d(jnp.asarray(a), jnp.asarray(b), mesh3)
c = matmul_25d(a_s, b_s, mesh3)
verify_matmul(np.asarray(c), exp)
print(f"2.5D on {dict(mesh3.shape)}: verified")

# Any semiring distributes the same way.
from gemm_hls_tpu.utils import reference_matmul  # noqa: E402

a_s, b_s = shard_operands_2d(jnp.asarray(a), jnp.asarray(b), mesh)
c = summa_matmul(a_s, b_s, mesh, semiring="min_plus")
verify_matmul(np.asarray(c), reference_matmul(a, b, semiring="min_plus"))
print("distributed min_plus: verified")
