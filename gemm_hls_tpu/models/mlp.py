"""Flagship demo model: an MLP whose every matmul is this framework's
CA-GEMM, with data/tensor-parallel shardings over a device mesh.

The reference is a kernel library, not a model zoo — its "application" is
the host driver calling the kernel (``host/RunHardware.cpp``).  This module
is the TPU framework's equivalent application: it exercises the full stack
(Pallas kernel, custom VJP, jit, mesh shardings) in a training loop, and is
what ``__graft_entry__.dryrun_multichip`` compiles across a virtual mesh.

Sharding scheme (Megatron-style 1-D tensor parallel + data parallel):
  * batch:   P("dp", None)
  * layer 2i   weight (din, dhid):  P(None, "tp")   (column parallel)
  * layer 2i+1 weight (dhid, dout): P("tp", None)   (row parallel; psum)
XLA inserts the reduce when the row-parallel contraction crosses "tp".
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, default_config
from gemm_hls_tpu.ops.matmul import matmul

Params = List[Tuple[jax.Array, jax.Array]]


def init_params(key, dims: Sequence[int], dtype="float32") -> Params:
    """He-initialized (W, b) per layer."""
    params = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (din, dout), dtype) * jnp.asarray(
            (2.0 / din) ** 0.5, dtype)
        b = jnp.zeros((dout,), dtype)
        params.append((w, b))
    return params


def param_shardings(mesh: Mesh, n_layers: int, dp: str = "dp", tp: str = "tp"):
    """Alternating column/row tensor-parallel weight shardings."""
    shardings = []
    for i in range(n_layers):
        if i % 2 == 0:
            w_spec = P(None, tp)
        else:
            w_spec = P(tp, None)
        b_spec = P(tp) if i % 2 == 0 else P(None)
        shardings.append((NamedSharding(mesh, w_spec),
                          NamedSharding(mesh, b_spec)))
    return shardings


def shard_params(params: Params, mesh: Mesh, dp: str = "dp", tp: str = "tp"):
    return [
        (jax.device_put(w, sw), jax.device_put(b, sb))
        for (w, b), (sw, sb) in zip(params,
                                    param_shardings(mesh, len(params), dp, tp))
    ]


def batch_sharding(mesh: Mesh, dp: str = "dp"):
    return NamedSharding(mesh, P(dp, None))


def mlp_forward(params: Params, x, *, config: Optional[GemmConfig] = None,
                fused: bool = False):
    """Forward pass; every layer matmul is the framework's CA-GEMM.

    ``fused=True`` folds bias+activation into the kernel's store epilogue
    via :func:`gemm_hls_tpu.ops.fused_linear.fused_linear` — one HBM round
    trip per layer, and still trainable (custom VJP).
    """
    from gemm_hls_tpu.ops.fused_linear import fused_linear

    if config is None:
        config = default_config(str(x.dtype))
    h = x
    for i, (w, b) in enumerate(params):
        last = i + 1 == len(params)
        if fused:
            h = fused_linear(h, w, b, "identity" if last else "relu", config)
        else:
            h = matmul(h, w, config=config) + b
            if not last:
                h = jax.nn.relu(h)
    return h


def loss_fn(params: Params, batch, *, config: Optional[GemmConfig] = None):
    x, y = batch
    pred = mlp_forward(params, x, config=config)
    return jnp.mean((pred - y) ** 2)


@functools.partial(jax.jit, static_argnames=("config",))
def train_step(params: Params, batch, *, config: Optional[GemmConfig] = None,
               lr=1e-3):
    """One SGD step; grads flow through the Pallas kernels' custom VJP.
    ``lr`` is a dynamic scalar — LR schedules do not retrigger compilation."""
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, config=config)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def make_batch(key, batch_size: int, din: int, dout: int, dtype="float32"):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (batch_size, din), dtype)
    y = jax.random.normal(ky, (batch_size, dout), dtype)
    return x, y
