"""Training through the CA-GEMM kernels: dp/tp-sharded MLP + checkpointing.

    python examples/06_training.py
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if jax.device_count() < 8:
    jax.config.update("jax_platforms", "cpu")

import tempfile  # noqa: E402

from gemm_hls_tpu.models.mlp import (  # noqa: E402
    batch_sharding, init_params, make_batch, shard_params, train_step,
)
from gemm_hls_tpu.parallel.mesh import make_mesh  # noqa: E402
from gemm_hls_tpu.utils.checkpoint import load_checkpoint, save_checkpoint  # noqa: E402

mesh = make_mesh(axis_names=("dp", "tp"))
print(f"mesh: {dict(mesh.shape)}")

dims = (256, 512, 256)
params = shard_params(init_params(jax.random.PRNGKey(0), dims), mesh)
batch = jax.device_put(make_batch(jax.random.PRNGKey(1), 64, dims[0], dims[-1]),
                       batch_sharding(mesh))

for step in range(5):
    params, loss = train_step(params, batch, lr=1e-2)
    print(f"step {step}: loss {float(loss):.4f}  "
          f"(W0 sharded {params[0][0].sharding.spec})")

with tempfile.TemporaryDirectory() as d:
    path = save_checkpoint(f"{d}/ck.npz", params)
    restored = load_checkpoint(path, like=params)
    print("checkpoint saved + restored:", path.split("/")[-1])
