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

    def gemm_cfg(self):
        """Explicit GemmConfig, or None — the grouped kernel then adopts
        the autotuned grouped-family winner for the actual (M, K, N, G)
        bucket (``ops/grouped.py::_default_cfg``), falling back to the
        GemmConfig defaults."""
        return self.gemm


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


def route(x, router_w, num_experts: int, top_k: int, *,
          return_probs: bool = False):
    """Top-k softmax routing.

    Returns (expert_ids, mix_weights) of shape (tokens, top_k); the mix
    weights are the softmax over the selected logits (normalized top-k,
    the Switch/Mixtral convention) and carry gradients to the router.
    With ``return_probs`` the full-softmax router probabilities
    (tokens, E) come back as a third value, so the load-balancing aux
    loss reuses this routing pass instead of re-running the router GEMM
    and top-k.

    No load balancing is applied here — under extended training a bare
    router can collapse all tokens onto one expert.  Add
    ``load_balance_loss`` (below) to the training objective to keep the
    routing spread (``moe_loss`` takes an ``aux_weight``).
    """
    logits = x.astype(jnp.float32) @ router_w
    top_logits, expert_ids = jax.lax.top_k(logits, top_k)
    mix = jax.nn.softmax(top_logits, axis=-1)
    if return_probs:
        return expert_ids, mix, jax.nn.softmax(logits, axis=-1)
    return expert_ids, mix


def _balance_from(probs, expert_ids, num_experts: int, top_k: int):
    """Switch aux loss from an existing routing pass (see ``route``)."""
    hard = jax.nn.one_hot(expert_ids, num_experts).sum(1)   # (tokens, E)
    f = hard.mean(0) / top_k
    p = probs.mean(0)
    return num_experts * jnp.sum(f * p)


def load_balance_loss(x, router_w, num_experts: int, top_k: int):
    """Switch-style auxiliary loss: E * Σ_e f_e · P_e.

    ``f_e`` = fraction of slots routed to expert e (hard counts through
    the top-k), ``P_e`` = mean router probability for e (soft, carries
    the gradient).  Minimized (→ 1.0) by uniform routing.

    Standalone form (runs its own routing pass); inside a forward that
    already routed, prefer ``moe_forward(..., with_aux=True)``, which
    reuses the router GEMM and top-k."""
    expert_ids, _, probs = route(x, router_w, num_experts, top_k,
                                 return_probs=True)
    return _balance_from(probs, expert_ids, num_experts, top_k)


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


def _dispatch_ids(x, ids, num: int):
    """Row-per-slot variant of ``_dispatch``: ``ids`` is (rows,) and each
    row of ``x`` IS one slot (the a2a receive buffer's layout)."""
    order = jnp.argsort(ids, stable=True)
    xs = jnp.take(x, order, axis=0)
    group_sizes = jnp.bincount(ids, length=num).astype(jnp.int32)
    inv = jnp.argsort(order)
    return xs, group_sizes, inv


def _local_expert_ffn(x, expert_ids, mix, w1_slab, w2_slab, lo, cfg,
                      activation):
    """Shared shard-view compute: slots routed to experts in
    [lo, lo + slab) run the two grouped GEMMs on the local weight slab;
    slots routed elsewhere contribute zero (they sort into gid = per,
    the grouped kernel's defined-zero tail)."""
    per = w1_slab.shape[0]
    ids = jnp.where((expert_ids >= lo) & (expert_ids < lo + per),
                    expert_ids - lo, per)
    xs, group_sizes, inv = _dispatch(x, ids, per + 1)
    group_sizes = group_sizes[:per]
    gemm_cfg = cfg.gemm_cfg()
    h = grouped_matmul(xs, w1_slab, group_sizes, gemm_cfg)
    h = activation(h).astype(w2_slab.dtype)
    ys = grouped_matmul(h, w2_slab, group_sizes, gemm_cfg)
    y = jnp.take(ys, inv, axis=0).reshape(x.shape[0], cfg.top_k, -1)
    return jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)


def moe_forward(params, x, cfg: MoEConfig,
                activation=jax.nn.gelu, local_experts=None,
                with_aux: bool = False):
    """Single-device (or per-shard) MoE FFN: (tokens, d_model) -> same.

    ``local_experts`` = (lo, hi) restricts compute to experts in [lo, hi)
    — slots routed elsewhere get zero contribution (the expert-parallel
    shard's view; summed across shards by the caller's psum).

    ``with_aux`` additionally returns the Switch load-balancing loss
    computed from THIS routing pass (no second router GEMM / top-k):
    returns (y, aux_loss).
    """
    if with_aux:
        expert_ids, mix, probs = route(x, params["router"],
                                       cfg.num_experts, cfg.top_k,
                                       return_probs=True)
        aux = _balance_from(probs, expert_ids, cfg.num_experts, cfg.top_k)
    else:
        expert_ids, mix = route(x, params["router"], cfg.num_experts,
                                cfg.top_k)
    w1, w2 = params["w1"], params["w2"]
    if local_experts is None:
        gemm_cfg = cfg.gemm_cfg()
        xs, group_sizes, inv = _dispatch(x, expert_ids, cfg.num_experts)
        h = grouped_matmul(xs, w1, group_sizes, gemm_cfg)
        h = activation(h).astype(w2.dtype)
        ys = grouped_matmul(h, w2, group_sizes, gemm_cfg)
        y = jnp.take(ys, inv, axis=0).reshape(x.shape[0], cfg.top_k, -1)
        y = jnp.sum(y * mix[..., None].astype(y.dtype), axis=1)
        y = y.astype(x.dtype)
        return (y, aux) if with_aux else y
    lo, hi = local_experts
    y = _local_expert_ffn(x, expert_ids, mix, w1[lo:hi], w2[lo:hi], lo,
                          cfg, activation)
    y = y.astype(x.dtype)
    return (y, aux) if with_aux else y


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

    Comm volume: every token's d_model output vector crosses the whole ep
    group regardless of routing (~2·B·d per device for the ring
    all-reduce).  Fine at small ep; at scale use
    :func:`moe_forward_ep_a2a`, whose all_to_all moves only routed
    tokens (~2·capacity_factor·top_k·B_loc·d).
    """
    ep = mesh.shape[ep_axis]
    if cfg.num_experts % ep:
        raise ValueError(f"num_experts {cfg.num_experts} % ep {ep} != 0")
    per = cfg.num_experts // ep
    x_spec = P(dp_axis, None) if dp_axis else P(None, None)
    w_spec = {"router": P(None, None), "w1": P(ep_axis, None, None),
              "w2": P(ep_axis, None, None)}

    def shard_fn(p, xx):
        # Local expert slab arrives pre-sharded as experts [0, per);
        # global ids shift down by this shard's base offset.
        lo = jax.lax.axis_index(ep_axis) * per
        expert_ids, mix = route(xx, p["router"], cfg.num_experts,
                                cfg.top_k)
        y = _local_expert_ffn(xx, expert_ids, mix, p["w1"], p["w2"], lo,
                              cfg, activation)
        return jax.lax.psum(y, ep_axis).astype(xx.dtype)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(w_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(params, x)


def moe_forward_ep_a2a(params, x, cfg: MoEConfig, mesh: Mesh, *,
                       ep_axis: str = "ep", activation=jax.nn.gelu,
                       capacity_factor: float = 2.0):
    """Expert-parallel MoE with all_to_all token dispatch.

    Tokens are sharded over ``ep_axis`` (each shard owns B/ep tokens) and
    experts are sharded over the same axis.  Each shard routes its local
    tokens, packs the slots bound for each expert shard into a
    fixed-capacity buffer, and ONE ``all_to_all`` exchanges the buffers —
    only routed token activations move, ~top_k·capacity_factor/ep of the
    psum-merge's per-device volume.  A second all_to_all returns the
    expert outputs to their source shards, where the router mix combines
    them.  Fully differentiable (gathers/scatters + all_to_all transpose
    under autodiff).

    Static shapes: the per-destination capacity is
    ``ceil(capacity_factor · B_loc · top_k / ep)`` (sublane-rounded).
    Slots beyond a destination's capacity are DROPPED (contribute zero).
    Note the capacity POOLS per destination *shard* — all ``per``
    co-located experts share one buffer — a looser drop rule than
    Switch's per-expert capacity: a shard drops only when its experts'
    combined demand overflows, not when one expert alone is hot.  Size
    ``capacity_factor`` for the expected routing skew; equivalence with
    ``moe_forward`` holds when nothing drops.
    """
    ep = mesh.shape[ep_axis]
    if cfg.num_experts % ep:
        raise ValueError(f"num_experts {cfg.num_experts} % ep {ep} != 0")
    if x.shape[0] % ep:
        raise ValueError(
            f"tokens {x.shape[0]} % ep {ep} != 0 — x is sharded over "
            f"'{ep_axis}', so the token count must divide the ep size")
    per = cfg.num_experts // ep
    x_spec = P(ep_axis, None)
    w_spec = {"router": P(None, None), "w1": P(ep_axis, None, None),
              "w2": P(ep_axis, None, None)}

    def shard_fn(p, xx):
        n_loc, d = xx.shape
        n_slots = n_loc * cfg.top_k
        cap = -(-int(capacity_factor * n_slots) // ep)
        cap = -(-cap // 8) * 8                       # sublane-align
        expert_ids, mix = route(xx, p["router"], cfg.num_experts,
                                cfg.top_k)
        slots = expert_ids.reshape(-1)               # (n_slots,) global id
        dest = slots // per                          # destination shard

        # Pack slots into per-destination rows: position = dest*cap +
        # rank-within-dest; over-capacity slots go to a garbage row.
        order = jnp.argsort(dest, stable=True)
        dest_sorted = jnp.take(dest, order)
        counts = jnp.bincount(dest, length=ep)
        start = jnp.cumsum(counts) - counts
        rank = jnp.arange(n_slots) - jnp.take(start, dest_sorted)
        keep = rank < cap
        pos = jnp.where(keep, dest_sorted * cap + rank, ep * cap)

        feat = jnp.take(xx, order // cfg.top_k, axis=0)  # token features
        lid = jnp.take(slots, order) % per               # local expert id
        send_x = jnp.zeros((ep * cap + 1, d), xx.dtype).at[pos].set(feat)
        send_id = jnp.full((ep * cap + 1,), per, jnp.int32).at[pos].set(
            lid.astype(jnp.int32))

        # One all_to_all each way; invalid rows carry id = per and fall
        # into the grouped kernel's zero tail on the expert shard.
        recv_x = jax.lax.all_to_all(
            send_x[:-1].reshape(ep, cap, d), ep_axis, 0, 0, tiled=False
        ).reshape(ep * cap, d)
        recv_id = jax.lax.all_to_all(
            send_id[:-1].reshape(ep, cap), ep_axis, 0, 0, tiled=False
        ).reshape(ep * cap)

        xs, group_sizes, inv = _dispatch_ids(recv_x, recv_id, per + 1)
        group_sizes = group_sizes[:per]
        gemm_cfg = cfg.gemm_cfg()
        h = grouped_matmul(xs, p["w1"], group_sizes, gemm_cfg)
        h = activation(h).astype(p["w2"].dtype)
        ys = grouped_matmul(h, p["w2"], group_sizes, gemm_cfg)
        ys = jnp.take(ys, inv, axis=0)               # back to recv order

        back = jax.lax.all_to_all(
            ys.reshape(ep, cap, -1), ep_axis, 0, 0, tiled=False
        ).reshape(ep * cap, -1)
        # Source-side gather: slot (in sorted order) sits at pos; dropped
        # slots read the appended zero row.
        back = jnp.concatenate(
            [back, jnp.zeros((1, back.shape[1]), back.dtype)], axis=0)
        y_sorted = jnp.take(back, pos, axis=0)
        y_slot = jnp.take(y_sorted, jnp.argsort(order), axis=0)
        y = y_slot.reshape(n_loc, cfg.top_k, -1)
        return jnp.sum(y * mix[..., None].astype(y.dtype),
                       axis=1).astype(xx.dtype)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(w_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(params, x)


def moe_loss(params, batch, cfg: MoEConfig, aux_weight: float = 0.0):
    x, y = batch
    if aux_weight:
        # Aux loss reuses the forward's routing pass (one router GEMM,
        # one top-k) instead of re-routing inside load_balance_loss.
        out, aux = moe_forward(params, x, cfg, with_aux=True)
    else:
        out = moe_forward(params, x, cfg)
    mse = jnp.mean((out.astype(jnp.float32) - y.astype(jnp.float32)) ** 2)
    if aux_weight:
        mse = mse + aux_weight * aux
    return mse


@functools.partial(jax.jit, static_argnames=("cfg", "aux_weight"))
def moe_train_step(params, batch, cfg: MoEConfig, lr=1e-2,
                   aux_weight: float = 0.0):
    """One SGD step.  ``lr`` is traced (schedules/sweeps don't retrace);
    ``aux_weight`` gates the Switch load-balancing loss."""
    loss, grads = jax.value_and_grad(moe_loss)(params, batch, cfg,
                                               aux_weight)
    new = jax.tree.map(
        lambda p, g: (p - lr * g.astype(jnp.float32)).astype(p.dtype),
        params, grads)
    return new, loss
