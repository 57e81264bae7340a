"""Mixture-of-experts FFN on the grouped CA-GEMM kernel.

The application layer for :func:`gemm_hls_tpu.ops.grouped.grouped_matmul`
(the way ``models/mlp.py`` is the application for the dense kernel): a
top-k-routed two-matmul expert FFN

    y = sum_k  w_k(x) * W2[e_k(x)] @ act(W1[e_k(x)] @ x)

where routing (``e_k``, ``w_k``) is a learned softmax router.  Everything
is static-shape: tokens are *sorted* by expert id (a fixed-size argsort —
the TPU-native answer to ragged dispatch), the per-expert row counts come
back as ``group_sizes``, and one grouped-GEMM compilation serves every
routing outcome.  Fully differentiable — gradients flow to router and
expert weights through the sort/unsort gathers and the grouped kernel's
custom VJP.

Expert parallelism (``moe_forward_ep``) shards the expert dimension over a
mesh axis inside ``shard_map``: every device routes the full token batch,
runs the grouped GEMM for its *local* experts only (local group sizes), and
a ``psum`` over the expert axis merges the disjoint token contributions —
collectives ride ICI, the ragged compute stays on the MXU.

Reference analogue: none — the reference is a single-kernel library
(``SURVEY.md`` §2); this is the serving-workload showcase the TPU build
adds on top, like flash attention (``ops/pallas_flash.py``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.grouped import grouped_matmul


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    d_model: int = 256
    d_ff: int = 512
    num_experts: int = 8
    top_k: int = 2
    dtype: str = "float32"
    # Router softmax/argmax always run in f32: bf16 logits make top-k ties
    # and mixing weights routing-unstable for no speed gain (tiny matmul).
    gemm: Optional[GemmConfig] = None

    def gemm_cfg(self) -> GemmConfig:
        if self.gemm is not None:
            return self.gemm
        return GemmConfig(dtype=self.dtype, out_dtype=self.dtype,
                          block_m=256, block_n=256, block_k=256)


def init_moe_params(key, cfg: MoEConfig):
    """Router + per-expert (W1, W2); He init, expert dim leading."""
    kr, k1, k2 = jax.random.split(key, 3)
    dt = jnp.dtype(cfg.dtype)
    scale1 = (2.0 / cfg.d_model) ** 0.5
    scale2 = (2.0 / cfg.d_ff) ** 0.5
    return {
        "router": jax.random.normal(kr, (cfg.d_model, cfg.num_experts),
                                    jnp.float32) * 0.02,
        "w1": (jax.random.normal(k1, (cfg.num_experts, cfg.d_model, cfg.d_ff),
                                 dt) * jnp.asarray(scale1, dt)),
        "w2": (jax.random.normal(k2, (cfg.num_experts, cfg.d_ff, cfg.d_model),
                                 dt) * jnp.asarray(scale2, dt)),
    }


def route(x, router_w, num_experts: int, top_k: int):
    """Top-k softmax routing.

    Returns (expert_ids, mix_weights) of shape (tokens, top_k); the mix
    weights are the softmax over the selected logits (normalized top-k,
    the Switch/Mixtral convention) and carry gradients to the router.
    """
    logits = x.astype(jnp.float32) @ router_w
    top_logits, expert_ids = jax.lax.top_k(logits, top_k)
    mix = jax.nn.softmax(top_logits, axis=-1)
    return expert_ids, mix


def _dispatch(x, expert_ids, num_experts: int):
    """Sort (token, k) slots by expert id.

    Returns (sorted slot features, group_sizes, inverse permutation).
    Static shapes throughout: the sort is over tokens*top_k slots and the
    bincount has a fixed length — no recompilation across routings.
    """
    slots = expert_ids.reshape(-1)                       # (tokens*k,)
    order = jnp.argsort(slots, stable=True)              # slot -> sorted pos
    top_k = expert_ids.shape[1]
    token_of_slot = order // top_k
    xs = jnp.take(x, token_of_slot, axis=0)
    group_sizes = jnp.bincount(slots, length=num_experts).astype(jnp.int32)
    inv = jnp.argsort(order)                             # sorted pos of slot
    return xs, group_sizes, inv


def moe_forward(params, x, cfg: MoEConfig,
                activation=jax.nn.gelu, local_experts=None):
    """Single-device (or per-shard) MoE FFN: (tokens, d_model) -> same.

    ``local_experts`` = (lo, hi) restricts compute to experts in [lo, hi)
    — slots routed elsewhere get zero contribution (the expert-parallel
    shard's view; summed across shards by the caller's psum).
    """
    gemm_cfg = cfg.gemm_cfg()
    expert_ids, mix = route(x, params["router"], cfg.num_experts, cfg.top_k)
    w1, w2 = params["w1"], params["w2"]
    if local_experts is None:
        ids = expert_ids
        num = cfg.num_experts
    else:
        lo, hi = local_experts
        num = hi - lo
        # Remote slots sort past the local groups (gid = num -> zero rows
        # via the grouped kernel's defined-zero tail).
        ids = jnp.where((expert_ids >= lo) & (expert_ids < hi),
                        expert_ids - lo, num)
        w1, w2 = w1[lo:hi], w2[lo:hi]
    xs, group_sizes, inv = _dispatch(x, ids, num + (local_experts is not None))
    group_sizes = group_sizes[:num]

    h = grouped_matmul(xs, w1, group_sizes, gemm_cfg)
    h = activation(h).astype(w2.dtype)
    ys = grouped_matmul(h, w2, group_sizes, gemm_cfg)

    # Undo the sort, weight by the router mix, sum the k slots per token.
    y = jnp.take(ys, inv, axis=0).reshape(x.shape[0], cfg.top_k, -1)
    return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1).astype(x.dtype)


def moe_forward_ep(params, x, cfg: MoEConfig, mesh: Mesh, *,
                   ep_axis: str = "ep", dp_axis: Optional[str] = "dp",
                   activation=jax.nn.gelu):
    """Expert-parallel MoE over a mesh: experts sharded on ``ep_axis``,
    tokens (optionally) sharded on ``dp_axis``.

    Each shard routes its token batch with the replicated router, computes
    only its local experts' contribution (remote slots fall into the
    grouped kernel's zero tail), and a ``psum`` over ``ep_axis`` merges
    the disjoint per-expert partial outputs — the MoE analogue of the
    row-parallel psum in ``models/mlp.py``.
    """
    ep = mesh.shape[ep_axis]
    if cfg.num_experts % ep:
        raise ValueError(f"num_experts {cfg.num_experts} % ep {ep} != 0")
    per = cfg.num_experts // ep
    x_spec = P(dp_axis, None) if dp_axis else P(None, None)
    w_spec = {"router": P(None, None), "w1": P(ep_axis, None, None),
              "w2": P(ep_axis, None, None)}

    def shard_fn(p, xx):
        idx = jax.lax.axis_index(ep_axis)
        lo = idx * per
        # Local expert slab arrives pre-sharded; offset ids into it.
        local = {"router": p["router"], "w1": p["w1"], "w2": p["w2"]}
        # Within the shard the slab is experts [0, per); shift global ids.
        expert_ids, mix = route(xx, local["router"], cfg.num_experts,
                                cfg.top_k)
        ids = jnp.where((expert_ids >= lo) & (expert_ids < lo + per),
                        expert_ids - lo, per)
        xs, group_sizes, inv = _dispatch(xx, ids, per + 1)
        group_sizes = group_sizes[:per]
        gemm_cfg = cfg.gemm_cfg()
        h = grouped_matmul(xs, local["w1"], group_sizes, gemm_cfg)
        h = activation(h).astype(local["w2"].dtype)
        ys = grouped_matmul(h, local["w2"], group_sizes, gemm_cfg)
        y = jnp.take(ys, inv, axis=0).reshape(xx.shape[0], cfg.top_k, -1)
        y = jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)
        return jax.lax.psum(y, ep_axis).astype(xx.dtype)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(w_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(params, x)


def moe_loss(params, batch, cfg: MoEConfig):
    x, y = batch
    out = moe_forward(params, x, cfg)
    return jnp.mean((out.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)


@functools.partial(jax.jit, static_argnames=("cfg", "lr"))
def moe_train_step(params, batch, cfg: MoEConfig, lr: float = 1e-2):
    loss, grads = jax.value_and_grad(moe_loss)(params, batch, cfg)
    new = jax.tree.map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new, loss
