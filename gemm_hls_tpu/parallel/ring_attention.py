"""Ring flash attention: sequence-parallel attention over the device mesh.

The context-parallel strategy for sequences too long for one chip's HBM
(or one chip's FLOPs): Q/K/V are sharded over the sequence axis, each
device runs the flash kernel against its resident KV shard, and the KV
shards rotate around the ICI ring (``jax.lax.ppermute``) — the chip-level
lift of the flash kernel's own streamed-KV schedule, exactly as the
SUMMA/Cannon family lifts the CA-GEMM K-streaming loop
(``kernel/Compute.cpp:53-149`` → ``parallel/summa.py``).

Per-step partials are *normalized* flash outputs with their per-row
log-sum-exp (``flash_mha(save_lse=True)``); cross-shard combination is
the associative log-sum-exp merge

    lse = logaddexp(lse_a, lse_b)
    o   = o_a·exp(lse_a − lse) + o_b·exp(lse_b − lse)

which is exact regardless of arrival order, so the ring needs no global
max pre-pass.  XLA overlaps each step's ppermute with the next flash
call where the schedule allows (async collective permute).

Differentiable: the custom VJP runs a second ring in which each KV
shard's accumulating (dk, dv) travels WITH it — after ``ring_size``
rotations every shard has collected contributions from every device's
queries and is back home.  dq accumulates locally.  Both use the
single-chip flash backward kernels with the forward's *global* per-row
log-sum-exp, so the recomputed per-shard probabilities are exactly the
global softmax's slices.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, default_config


def ring_flash_attention(q, k, v, mesh: Mesh, *, axis: str = "x",
                         causal: bool = False,
                         scale: Optional[float] = None,
                         block_q: int = 512, block_kv: int = 2048,
                         config: Optional[GemmConfig] = None,
                         interpret: Optional[bool] = None):
    """softmax(q·kᵀ·scale)·v with the sequence axis sharded over ``axis``.

    Args:
      q, k, v: (B, S, D) global arrays (any sharding; re-placed to
        P(None, axis, None) — batch/heads replicated, sequence sharded).
      mesh: the device mesh; ``axis`` names the ring dimension.
      scale: score scale, default 1/sqrt(D).

    Returns (B, S, D) in q's dtype, sequence-sharded like the inputs.

    S must divide the ring size.  Every device sees every KV shard
    after ``ring_size`` rotations; with ``causal=True`` each step takes
    one of three forms by shard position — fully-past shard: full flash,
    diagonal shard: causal flash, fully-future shard: skipped (a
    -inf-lse partial, a no-op in the combine).  Differentiable — the
    custom VJP runs the gradient ring (see module docstring).
    """
    from jax.sharding import NamedSharding

    from gemm_hls_tpu.ops.matmul import _resolve_interpret

    if q.ndim != 3 or k.shape != v.shape or k.shape[0] != q.shape[0] or \
            k.shape[2] != q.shape[2]:
        raise ValueError(
            f"ring_flash_attention shapes: {q.shape} x {k.shape} x {v.shape}")
    n_ring = mesh.shape[axis]
    s_q, s_kv = q.shape[1], k.shape[1]
    if s_q % n_ring or s_kv % n_ring:
        raise ValueError(f"the ring size {n_ring} must divide both "
                         f"sequence lengths ({s_q}, {s_kv})")
    if causal and s_q != s_kv:
        raise ValueError(
            f"causal ring attention needs S_q == S_kv, got {s_q} vs {s_kv}")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    cfg = (config or default_config(str(q.dtype))).replace(
        dtype=str(q.dtype), out_dtype="float32")
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    run_interpret = _resolve_interpret(cfg)

    spec = P(None, axis, None)
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    return _ring_core(qs, k, v, mesh, axis, cfg, causal, block_q,
                      block_kv, run_interpret)


def _ring_shifts(n_ring):
    return [(i, (i + 1) % n_ring) for i in range(n_ring)]


def _ring_fwd_impl(qs, k, v, mesh, axis, cfg, causal, block_q, block_kv,
                   run_interpret):
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)

    def local(qs_blk, k_blk, v_blk):
        bsz, s_loc, d = qs_blk.shape
        my = jax.lax.axis_index(axis)

        def partial_for(k_cur, v_cur, is_causal):
            return flash_mha(qs_blk, k_cur, v_cur, cfg=cfg,
                             causal=is_causal, block_q=block_q,
                             block_kv=block_kv, interpret=run_interpret,
                             save_lse=True)

        def step_partial(t, k_cur, v_cur):
            if causal:
                # Resident kv shard index after t forward rotations.
                shard = (my - t) % n_ring
                branch = jnp.where(shard == my, 0,
                                   jnp.where(shard < my, 1, 2))
                return jax.lax.switch(branch, [
                    lambda: partial_for(k_cur, v_cur, True),   # diagonal
                    lambda: partial_for(k_cur, v_cur, False),  # past
                    lambda: (jnp.zeros((bsz, s_loc, d), jnp.float32),
                             jnp.full((bsz, s_loc, 1), -jnp.inf,
                                      jnp.float32)),           # future
                ])
            return partial_for(k_cur, v_cur, False)

        def combine(o, lse, o_p, lse_p):
            lse_new = jnp.logaddexp(lse, lse_p)
            # exp(-inf - -inf) = nan when a row is still empty AND the
            # step was skipped; a where() on the finite lse guards it.
            w_old = jnp.where(jnp.isfinite(lse),
                              jnp.exp(lse - lse_new), 0.0)
            w_new = jnp.where(jnp.isfinite(lse_p),
                              jnp.exp(lse_p - lse_new), 0.0)
            return o * w_old + o_p * w_new, lse_new

        def body(t, carry):
            # Rotate BEFORE compute: step t works on shard (my - t), and
            # the loop runs t = 1..n-1 — no dead final rotation.
            o, lse, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            o_p, lse_p = step_partial(t, k_cur, v_cur)
            o, lse = combine(o, lse, o_p, lse_p)
            return o, lse, k_cur, v_cur

        # Step 0 runs on the resident shard (always live under causal —
        # it is the diagonal).
        o, lse = step_partial(0, k_blk, v_blk)
        o = o.astype(jnp.float32)
        o, lse, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (o, lse, k_blk, v_blk))
        return o.astype(qs_blk.dtype), lse

    spec = P(None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    return fn(qs, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _ring_core(qs, k, v, mesh, axis, cfg, causal, block_q, block_kv,
               run_interpret):
    o, _ = _ring_fwd_impl(qs, k, v, mesh, axis, cfg, causal, block_q,
                          block_kv, run_interpret)
    return o


def _ring_core_fwd(qs, k, v, mesh, axis, cfg, causal, block_q, block_kv,
                   run_interpret):
    o, lse = _ring_fwd_impl(qs, k, v, mesh, axis, cfg, causal, block_q,
                            block_kv, run_interpret)
    return o, (qs, k, v, o, lse)


def _ring_core_bwd(mesh, axis, cfg, causal, block_q, block_kv,
                   run_interpret, res, do):
    """Second ring: each KV shard's accumulating (dk, dv) rotates WITH
    it, so after ring_size steps every shard has collected every
    device's contribution and is home.  dq accumulates locally.  The
    per-step gradients come from the single-chip flash backward kernels
    evaluated against the forward's GLOBAL log-sum-exp."""
    from gemm_hls_tpu.ops.pallas_flash import (
        flash_mha_bwd_dq, flash_mha_bwd_dkv,
    )

    qs, k, v, o, lse = res
    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)

    def local(qs_blk, k_blk, v_blk, do_blk, o_blk, lse_blk):
        delta = jnp.sum(do_blk.astype(jnp.float32)
                        * o_blk.astype(jnp.float32), axis=-1,
                        keepdims=True)
        do_c = do_blk.astype(qs_blk.dtype)
        my = jax.lax.axis_index(axis)

        def grads_for(k_cur, v_cur, is_causal):
            dqc = flash_mha_bwd_dq(
                qs_blk, k_cur, v_cur, do_c, lse_blk, delta, cfg=cfg,
                causal=is_causal, block_q=block_q, block_kv=block_kv,
                interpret=run_interpret).astype(jnp.float32)
            dkc, dvc = flash_mha_bwd_dkv(
                qs_blk, k_cur, v_cur, do_c, lse_blk, delta, cfg=cfg,
                causal=is_causal, block_q=block_q, block_kv=block_kv,
                interpret=run_interpret)
            return dqc, dkc.astype(jnp.float32), dvc.astype(jnp.float32)

        def step_grads(t, k_cur, v_cur):
            if causal:
                shard = (my - t) % n_ring
                branch = jnp.where(shard == my, 0,
                                   jnp.where(shard < my, 1, 2))
                z_q = jnp.zeros(qs_blk.shape, jnp.float32)
                z_kv = jnp.zeros(k_cur.shape, jnp.float32)
                return jax.lax.switch(branch, [
                    lambda: grads_for(k_cur, v_cur, True),
                    lambda: grads_for(k_cur, v_cur, False),
                    lambda: (z_q, z_kv, z_kv),
                ])
            return grads_for(k_cur, v_cur, False)

        def body(t, carry):
            # Rotate BEFORE compute (t = 1..n-1): each shard travels
            # with its accumulating (dk, dv).
            dq, dk, dv, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk = jax.lax.ppermute(dk, axis, perm)
            dv = jax.lax.ppermute(dv, axis, perm)
            dqc, dkc, dvc = step_grads(t, k_cur, v_cur)
            return dq + dqc, dk + dkc, dv + dvc, k_cur, v_cur

        dq, dk, dv = step_grads(0, k_blk, v_blk)
        dq, dk, dv, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (dq, dk, dv, k_blk, v_blk))
        # One final gradient-only rotation sends each shard's completed
        # (dk, dv) home (the KV payload itself no longer needs to move).
        dk = jax.lax.ppermute(dk, axis, perm)
        dv = jax.lax.ppermute(dv, axis, perm)
        return (dq.astype(qs_blk.dtype), dk.astype(k_blk.dtype),
                dv.astype(v_blk.dtype))

    spec = P(None, axis, None)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec,) * 6,
                       out_specs=(spec, spec, spec), check_vma=False)
    return fn(qs, k, v, do, o, lse)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)
