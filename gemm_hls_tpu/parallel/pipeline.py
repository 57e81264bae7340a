"""Pipeline parallelism: a microbatched GPipe schedule over a mesh axis.

Completes the framework's parallelism alphabet (dp/tp/sp/ep/cp + pp).
The reference's core mechanism IS a hardware pipeline — seven concurrent
dataflow stages connected by FIFOs (``kernel/Top.cpp:24,67-116``); this
module is that idea lifted to the mesh level: each device owns one
STAGE of the model, activations flow stage-to-stage over ICI
(``lax.ppermute``), and M microbatches keep every stage busy once the
pipeline fills (bubble fraction = (P-1)/(M+P-1), the GPipe bound).

SPMD formulation: all devices run the same scan of T = M + P - 1 steps.
At step t, device 0 injects microbatch t (while t < M), every device
applies ITS stage to its current activation, the last device collects
finished microbatches, and activations rotate one hop along the ring.
The backward pass needs no bespoke schedule: autodiff of the scan
reverses it step by step, and the cotangent of ``ppermute`` is the
reverse permutation — XLA emits the mirrored pipeline automatically
(the fill/drain structure of 1F1B without its activation-memory
optimization; memory here is GPipe-like, rematerialized via
``jax.checkpoint`` on the stage function).

Stage boundary widths must match (activations of one shape ride the
ring); stage interiors are free.  The stage here is a 2-layer MLP block
(d_model -> d_ffn -> d_model) whose matmuls are the framework's CA-GEMM
kernel, matching ``models/mlp.py``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, default_config
from gemm_hls_tpu.ops.matmul import matmul


def init_pipeline_params(key, n_stages: int, d_model: int, d_ffn: int,
                         dtype="float32"):
    """He-initialized stacked stage params: leaves carry a leading
    stage axis (sharded over the pipeline mesh axis)."""
    ks = jax.random.split(key, 2 * n_stages)
    s1 = jnp.asarray((2.0 / d_model) ** 0.5, dtype)
    s2 = jnp.asarray((2.0 / d_ffn) ** 0.5, dtype)
    w1 = jnp.stack([jax.random.normal(ks[2 * i], (d_model, d_ffn), dtype)
                    * s1 for i in range(n_stages)])
    w2 = jnp.stack([jax.random.normal(ks[2 * i + 1], (d_ffn, d_model),
                                      dtype) * s2
                    for i in range(n_stages)])
    return {
        "w1": w1, "b1": jnp.zeros((n_stages, d_ffn), dtype),
        "w2": w2, "b2": jnp.zeros((n_stages, d_model), dtype),
    }


def shard_pipeline_params(params, mesh: Mesh, pp_axis: str = "pp"):
    """Place each stage's slice on its pipeline device."""
    def put(x):
        spec = P(pp_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, params)


def _stage_fn(params, h, config: GemmConfig):
    """One pipeline stage: relu(h @ w1 + b1) @ w2 + b2 on the CA-GEMM
    kernel.  ``params`` leaves are this stage's slices (no stage dim)."""
    h = jax.nn.relu(matmul(h, params["w1"], config=config) + params["b1"])
    return matmul(h, params["w2"], config=config) + params["b2"]


def stages_forward(params, x, *, config: Optional[GemmConfig] = None):
    """Unpipelined oracle: apply every stage in order on one device."""
    config = config or default_config(str(x.dtype))
    n_stages = params["w1"].shape[0]
    h = x
    for i in range(n_stages):
        h = _stage_fn(jax.tree.map(lambda p, i=i: p[i], params), h, config)
    return h


def pipeline_forward(params, x, mesh: Mesh, *, microbatches: int,
                     pp_axis: str = "pp",
                     config: Optional[GemmConfig] = None,
                     remat: bool = True):
    """GPipe-scheduled forward of the stacked-stage model.

    Args:
      params: stacked stage params (``init_pipeline_params``), leading
        stage axis sharded over ``pp_axis``.
      x: (B, d_model) global batch; B must divide into ``microbatches``
        equal microbatches.
      microbatches: M; the bubble fraction is (P-1)/(M+P-1), so M >= P
        (ideally a few x P) keeps the stages busy.
      remat: rematerialize each stage application in the backward
        (GPipe's activation policy: store only stage boundaries).

    Returns (B, d_model), replicated over ``pp_axis``.  Differentiable:
    ``jax.grad`` through this function yields the mirrored backward
    pipeline (scan reversal + reversed ppermute).
    """
    n_stages = mesh.shape[pp_axis]
    bsz, d_model = x.shape
    if bsz % microbatches:
        raise ValueError(f"batch {bsz} % microbatches {microbatches} != 0")
    if params["w1"].shape[0] != n_stages:
        raise ValueError(
            f"params carry {params['w1'].shape[0]} stages but mesh axis "
            f"'{pp_axis}' has {n_stages} devices")
    mb = bsz // microbatches
    x_mb = x.reshape(microbatches, mb, d_model)
    config = config or default_config(str(x.dtype))
    m_count = microbatches
    stage = functools.partial(_stage_fn, config=config)
    if remat:
        stage = jax.checkpoint(stage)

    # Every array rank in/out of the shard_map: params (stage-sharded),
    # x (replicated), output (replicated via the final psum).
    pspec = jax.tree.map(
        lambda p: P(pp_axis, *([None] * (p.ndim - 1))), params)

    def spmd(params_l, x_loc):
        # params_l leaves have leading dim 1 — this device's stage.
        params_l = jax.tree.map(lambda p: p[0], params_l)
        idx = jax.lax.axis_index(pp_axis)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        t_total = m_count + n_stages - 1

        def step(carry, t):
            state, outs = carry
            # Stage 0 injects microbatch t while any remain; other
            # devices keep their in-flight activation.
            x_t = jax.lax.dynamic_index_in_dim(
                x_loc, jnp.minimum(t, m_count - 1), 0, keepdims=False)
            state = jnp.where((idx == 0) & (t < m_count), x_t, state)
            h = stage(params_l, state)
            # The last stage retires microbatch t-(P-1) once the
            # pipeline is full.
            ot = jnp.clip(t - (n_stages - 1), 0, m_count - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, ot, 0,
                                               keepdims=False)
            newv = jnp.where((idx == n_stages - 1)
                             & (t >= n_stages - 1), h, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, newv, ot, 0)
            # Rotate activations one hop downstream (ICI neighbor
            # traffic; the wrap-around link only carries drained slots).
            state = jax.lax.ppermute(h, pp_axis, perm)
            return (state, outs), None

        init = (jnp.zeros((mb, d_model), x_loc.dtype),
                jnp.zeros((m_count, mb, d_model), x_loc.dtype))
        (_, outs), _ = jax.lax.scan(step, init, jnp.arange(t_total))
        # Only the last stage holds real outputs; replicate them.
        outs = jnp.where(idx == n_stages - 1, outs, 0)
        return jax.lax.psum(outs, pp_axis)

    out = jax.shard_map(
        spmd, mesh=mesh,
        in_specs=(pspec, P(*([None] * 3))),
        out_specs=P(*([None] * 3)),
        check_vma=False,
    )(params, x_mb)
    return out.reshape(bsz, d_model)


def pipeline_loss(params, batch, mesh: Mesh, *, microbatches: int,
                  pp_axis: str = "pp",
                  config: Optional[GemmConfig] = None):
    x, y = batch
    pred = pipeline_forward(params, x, mesh, microbatches=microbatches,
                            pp_axis=pp_axis, config=config)
    return jnp.mean((pred.astype(jnp.float32)
                     - y.astype(jnp.float32)) ** 2)


def pipeline_train_step(params, batch, mesh: Mesh, *, microbatches: int,
                        pp_axis: str = "pp",
                        config: Optional[GemmConfig] = None, lr=1e-3):
    """One SGD step through the pipelined forward/backward."""
    loss, grads = jax.value_and_grad(pipeline_loss)(
        params, batch, mesh, microbatches=microbatches, pp_axis=pp_axis,
        config=config)
    return jax.tree.map(lambda p, g: p - lr * g, params, grads), loss
