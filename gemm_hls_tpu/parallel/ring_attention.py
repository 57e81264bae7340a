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

The ring carries the single-chip kernel's FULL mask/serving surface:
grouped-query attention (KV shards with fewer heads rotate as-is),
sliding windows (each step tells the kernel where its KV shard sits in
the global sequence via the kernel's ``offsets`` pair, so the window
mask is evaluated against absolute positions), packed-sequence segment
ids (the KV half of the id pair travels with its shard), logit
soft-caps, and per-example KV lengths for padded non-causal batches.

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
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from gemm_hls_tpu.config import GemmConfig, default_config


def ring_flash_attention(q, k, v, mesh: Mesh, *, axis: str = "x",
                         causal: bool = False, zigzag: bool = False,
                         scale: Optional[float] = None,
                         window: Optional[int] = None,
                         logit_cap: Optional[float] = None,
                         q_segment_ids=None, kv_segment_ids=None,
                         kv_lengths=None,
                         block_q: int = 512, block_kv: int = 2048,
                         config: Optional[GemmConfig] = None,
                         interpret: Optional[bool] = None):
    """softmax(q·kᵀ·scale)·v with the sequence axis sharded over ``axis``.

    Args:
      q: (B, S_q, D) global array (B = flattened batch·heads).
      k, v: (B_kv, S_kv, D) — B_kv may divide B (grouped-query
        attention: each group of B/B_kv q heads reads the same KV head;
        the smaller KV shards rotate the ring as-is).
      mesh: the device mesh; ``axis`` names the ring dimension.
      scale: score scale, default 1/sqrt(D).
      window: sliding-window size (causal only): query at position p
        attends to positions (p-window, p].  Masked against ABSOLUTE
        positions on every ring step via the flash kernel's ``offsets``.
      logit_cap: Gemma-style tanh soft-cap on the scores.
      q_segment_ids / kv_segment_ids: (B, S_q) / (B_kv, S_kv) int packed
        -sequence ids; only same-id pairs attend.  The KV ids rotate
        with their shard.
      kv_lengths: (B_kv,) int32 logical KV lengths for padded non-causal
        batches; positions >= length are masked on whichever shard they
        fall.  Forward-only (inference path) and non-causal only — the
        single-chip kernel's causal decode anchoring
        (``ops/pallas_flash.py``) is a one-chip serving feature.
      zigzag: causal-only load balancing — device ``d`` of ``n`` holds
        sequence chunks ``(d, 2n-1-d)`` of ``2n``, so every ring step
        runs exactly two full chunk-pair flash calls per device instead
        of leaving later-positioned devices with more live (non-future)
        steps.  Inputs/outputs stay in natural sequence order — the
        zigzag permutation is applied (and inverted) internally; callers
        that keep activations in zigzag layout across layers can use
        :func:`zigzag_indices` and skip the gathers.  Supports GQA and
        ``logit_cap``; use the plain ring for windows/segment ids.

    Returns (B, S_q, D) in q's dtype, sequence-sharded like the inputs.

    S must divide the ring size.  Every device sees every KV shard
    after ``ring_size`` rotations; with ``causal=True`` each step takes
    one of three forms by shard position — fully-past shard: full flash,
    diagonal shard: causal flash, fully-future shard: skipped (a
    -inf-lse partial, a no-op in the combine).  With ``window`` the
    fully-past steps run the window mask against absolute positions and
    shards wholly older than every query's window start are skipped
    too.  Differentiable — the custom VJP runs the gradient ring (see
    module docstring).
    """
    from jax.sharding import NamedSharding

    from gemm_hls_tpu.ops.matmul import _resolve_interpret

    if q.ndim != 3 or k.shape != v.shape or q.shape[0] % k.shape[0] or \
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
    if window is not None and not causal:
        raise ValueError("window requires causal=True (sliding-window "
                         "attention is an autoregressive mask)")
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("q_segment_ids and kv_segment_ids must be "
                         "passed together")
    if q_segment_ids is not None:
        if q_segment_ids.shape != (q.shape[0], s_q) or \
                kv_segment_ids.shape != (k.shape[0], s_kv):
            raise ValueError(
                f"segment ids must be ({q.shape[0]},{s_q}) / "
                f"({k.shape[0]},{s_kv}), got {q_segment_ids.shape} / "
                f"{kv_segment_ids.shape}")
    if kv_lengths is not None:
        if causal:
            raise ValueError(
                "kv_lengths over the ring is a padded-batch (non-causal) "
                "feature; causal decode anchoring is single-chip "
                "(ops/pallas_flash.py)")
        if kv_lengths.shape != (k.shape[0],):
            raise ValueError(f"kv_lengths must be ({k.shape[0]},), got "
                             f"{kv_lengths.shape}")
    if zigzag:
        if not causal:
            raise ValueError("zigzag=True is a causal load-balancing "
                             "layout; it requires causal=True")
        if s_q % (2 * n_ring):
            raise ValueError(f"zigzag needs 2*ring_size ({2 * n_ring}) "
                             f"to divide the sequence length ({s_q})")
        if window is not None or q_segment_ids is not None:
            raise ValueError("zigzag supports GQA/logit_cap; windows and "
                             "segment ids run on the plain ring "
                             "(zigzag=False)")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    cfg = (config or default_config(str(q.dtype))).replace(
        dtype=str(q.dtype), out_dtype="float32")
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    run_interpret = _resolve_interpret(cfg)

    spec = P(None, axis, None)
    seg_spec = P(None, axis)
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    if zigzag:
        # Permute token order OUTSIDE the custom-VJP core: plain jnp
        # gathers, so autodiff routes the cotangent permutations for
        # free and the core only ever sees zigzag layout.
        order = zigzag_indices(s_q, n_ring)
        inv = jnp.argsort(order)
        qs, k, v = (x[:, order, :] for x in (qs, k, v))
    qs = jax.device_put(qs, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    if q_segment_ids is not None:
        q_segment_ids = jax.device_put(
            q_segment_ids.astype(jnp.int32), NamedSharding(mesh, seg_spec))
        kv_segment_ids = jax.device_put(
            kv_segment_ids.astype(jnp.int32), NamedSharding(mesh, seg_spec))
    if zigzag:
        out = _zz_core(qs, k, v, mesh, axis, cfg, block_q, block_kv,
                       run_interpret, logit_cap)
        return out[:, inv, :]
    if kv_lengths is not None:
        # Inference-only path: not under the custom VJP (the backward
        # kernels carry no kv_lengths surface).
        kv_lengths = jax.device_put(kv_lengths.astype(jnp.int32),
                                    NamedSharding(mesh, P(None)))
        o, _ = _ring_fwd_impl(qs, k, v, None, None, kv_lengths, mesh,
                              axis, cfg, False, None, logit_cap, block_q,
                              block_kv, run_interpret)
        return o.astype(q.dtype)
    return _ring_core(qs, k, v, q_segment_ids, kv_segment_ids, mesh, axis,
                      cfg, causal, window, logit_cap, block_q, block_kv,
                      run_interpret)


def ring_decode_attention(q, k, v, kv_lengths, mesh: Mesh, *,
                          axis: str = "x", window: Optional[int] = None,
                          logit_cap: Optional[float] = None,
                          scale: Optional[float] = None,
                          block_q: int = 512, block_kv: int = 2048,
                          config: Optional[GemmConfig] = None,
                          interpret: Optional[bool] = None):
    """Serving-side context-parallel attention: causal queries at the
    END of a ragged, ring-sharded KV cache.

    The decode/continuation batch shape: each example has a logical
    cache length (ragged), the S_q query tokens sit at positions
    ``length - S_q .. length - 1`` (single-token decode S_q = 1, chunked
    continuation S_q > 1), and the cache's sequence axis is sharded
    over ``axis``.  Composes with grouped-query heads and a sliding
    ``window``.

    Unlike the training ring, the KV cache NEVER moves: the queries are
    tiny and replicated, each device runs one flash call against its
    RESIDENT shard — the per-example lengths are re-anchored to
    shard-local coordinates (``length - shard*S_loc``; values <= 0 mean
    "this shard is past the cache end" and yield an empty lse=-inf
    partial, values > S_loc mean "wholly valid") — and the normalized
    (o, lse) partials, O(B·S_q·D), are all-gathered and lse-merged.
    ICI carries the small partials instead of rotating the cache: for
    decode the traffic is B·D·(ring_size-1) floats vs the training
    ring's full cache rotation.  (Reference analogue: the host driver
    slicing one kernel invocation per memory-resident tile,
    ``host/RunHardware.cpp`` — here the "tiles" are cache shards.)

    Args:
      q: (B, S_q, D) queries, replicated (NOT sequence-sharded).
      k, v: (B_kv, S_kv, D), sequence-sharded over ``axis``; B_kv may
        divide B (GQA).
      kv_lengths: (B_kv,) int32 logical cache lengths, >= S_q.
      window: sliding window (positions (p - window, p] per query).

    Returns (B, S_q, D) in q's dtype, replicated over ``axis``.
    Inference-only (no custom VJP), like the single-chip decode path.
    """
    from jax.sharding import NamedSharding

    from gemm_hls_tpu.ops.matmul import _resolve_interpret
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    if q.ndim != 3 or k.shape != v.shape or q.shape[0] % k.shape[0] or \
            k.shape[2] != q.shape[2]:
        raise ValueError(
            f"ring_decode_attention shapes: {q.shape} x {k.shape} "
            f"x {v.shape}")
    if kv_lengths.shape != (k.shape[0],):
        raise ValueError(f"kv_lengths must be ({k.shape[0]},), got "
                         f"{kv_lengths.shape}")
    n_ring = mesh.shape[axis]
    s_kv = k.shape[1]
    if s_kv % n_ring:
        raise ValueError(f"the ring size {n_ring} must divide the KV "
                         f"length ({s_kv})")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    cfg = (config or default_config(str(q.dtype))).replace(
        dtype=str(q.dtype), out_dtype="float32")
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    run_interpret = _resolve_interpret(cfg)
    s_loc = s_kv // n_ring
    group = q.shape[0] // k.shape[0]

    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
    kv_spec = P(None, axis, None)
    qs = jax.device_put(qs, NamedSharding(mesh, P(None, None, None)))
    k = jax.device_put(k, NamedSharding(mesh, kv_spec))
    v = jax.device_put(v, NamedSharding(mesh, kv_spec))
    kv_lengths = jax.device_put(kv_lengths.astype(jnp.int32),
                                NamedSharding(mesh, P(None)))

    def local(q_blk, k_blk, v_blk, len_blk):
        my = jax.lax.axis_index(axis)
        # Shard-local view of each example's cache length.  The flash
        # kernel's bottom-right anchoring then evaluates the GLOBAL
        # causal/window/length predicates in local coordinates:
        # q row r sits at len_eff - S_q + r, exactly the global
        # position shifted by this shard's offset.
        len_eff = len_blk - my * s_loc
        o_p, lse_p = flash_mha(
            q_blk, k_blk, v_blk, kv_lengths=len_eff, cfg=cfg,
            causal=True, window=window, logit_cap=logit_cap,
            block_q=block_q, block_kv=block_kv,
            interpret=run_interpret, save_lse=True)
        # Shards wholly past the cache end produced all-masked rows
        # (l = 0 -> o = 0, lse = -inf) and drop out of the merge; make
        # that explicit per example for defense in depth.
        dead = (len_eff <= 0)[jnp.repeat(
            jnp.arange(len_blk.shape[0]), group)][:, None, None]
        lse_p = jnp.where(dead, -jnp.inf, lse_p)
        o_all = jax.lax.all_gather(o_p.astype(jnp.float32), axis)
        lse_all = jax.lax.all_gather(lse_p, axis)      # (n, B, S_q, 1)
        m = jnp.max(lse_all, axis=0)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        w = jnp.where(jnp.isfinite(lse_all),
                      jnp.exp(lse_all - m[None]), 0.0)
        den = jnp.sum(w, axis=0)
        o = (jnp.sum(o_all * w, axis=0)
             / jnp.where(den == 0, 1.0, den))
        return o.astype(q_blk.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, None), kv_spec, kv_spec, P(None)),
        out_specs=P(None, None, None), check_vma=False)
    return fn(qs, k, v, kv_lengths)


def zigzag_indices(s: int, n_ring: int):
    """Token permutation mapping natural order → zigzag ring layout.

    The sequence splits into ``2*n_ring`` chunks; device ``d`` holds
    chunks ``d`` and ``2*n_ring-1-d`` concatenated.  Returns an int32
    index array ``order`` with ``x_zigzag = x[:, order]``; invert with
    ``jnp.argsort(order)``."""
    if s % (2 * n_ring):
        raise ValueError(f"2*ring_size ({2 * n_ring}) must divide the "
                         f"sequence length ({s})")
    c = s // (2 * n_ring)
    chunks = []
    for d in range(n_ring):
        chunks.extend([d, 2 * n_ring - 1 - d])
    idx = (jnp.asarray(chunks, jnp.int32)[:, None] * c
           + jnp.arange(c, dtype=jnp.int32)[None, :])
    return idx.reshape(-1)


def _ring_shifts(n_ring):
    return [(i, (i + 1) % n_ring) for i in range(n_ring)]


def _lse_combine(o, lse, o_p, lse_p):
    """Associative log-sum-exp merge of two normalized partials.

    exp(-inf - -inf) = nan when a row is still empty AND the incoming
    partial is a skipped step; the where() on the finite lse guards it.
    A window'd partial shard can also emit per-row (o=nan-free 0,
    lse=-inf) rows — the same guard zeroes their weight."""
    lse_new = jnp.logaddexp(lse, lse_p)
    w_old = jnp.where(jnp.isfinite(lse), jnp.exp(lse - lse_new), 0.0)
    w_new = jnp.where(jnp.isfinite(lse_p), jnp.exp(lse_p - lse_new), 0.0)
    return (jnp.where(jnp.isfinite(lse), o * w_old, 0.0)
            + jnp.where(jnp.isfinite(lse_p), o_p * w_new, 0.0), lse_new)


def _seg3(q_seg, kv_seg):
    """Raw (B, S) int segment ids -> the flash kernels' layouts."""
    if q_seg is None:
        return None, None
    return (q_seg.astype(jnp.int32)[..., None],
            kv_seg.astype(jnp.int32)[:, None, :])


def _group_reduce(dk, dv, kv_heads):
    """GQA: fold the dkv kernel's per-q-head tiles onto the kv heads."""
    group = dk.shape[0] // kv_heads
    if group == 1:
        return dk, dv
    dk = dk.reshape(kv_heads, group, *dk.shape[1:]).sum(axis=1)
    dv = dv.reshape(kv_heads, group, *dv.shape[1:]).sum(axis=1)
    return dk, dv


def _ring_fwd_impl(qs, k, v, q_seg, kv_seg, kv_len, mesh, axis, cfg,
                   causal, window, logit_cap, block_q, block_kv,
                   run_interpret):
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)
    has_seg = q_seg is not None
    has_len = kv_len is not None

    def local(qs_blk, k_blk, v_blk, *extra):
        extra = list(extra)
        qseg_blk = extra.pop(0) if has_seg else None
        kvseg_blk = extra.pop(0) if has_seg else None
        len_blk = extra.pop(0) if has_len else None
        bsz, s_loc, d = qs_blk.shape
        s_kv_loc = k_blk.shape[1]
        my = jax.lax.axis_index(axis)

        def partial_for(k_cur, v_cur, kvseg_cur, is_causal, shard,
                        offsets=None, lengths=None):
            return flash_mha(qs_blk, k_cur, v_cur, kv_lengths=lengths,
                             q_segment_ids=qseg_blk,
                             kv_segment_ids=kvseg_cur if has_seg else None,
                             offsets=offsets,
                             cfg=cfg, causal=is_causal, block_q=block_q,
                             block_kv=block_kv, window=window,
                             logit_cap=logit_cap,
                             interpret=run_interpret, save_lse=True)

        def skipped():
            return (jnp.zeros((bsz, s_loc, d), jnp.float32),
                    jnp.full((bsz, s_loc, 1), -jnp.inf, jnp.float32))

        def step_partial(t, k_cur, v_cur, kvseg_cur):
            shard = (my - t) % n_ring
            if causal and window is not None:
                # Uniform causal+window calls against absolute
                # positions; shards wholly future OR wholly older than
                # every query's window start are skipped.
                live = (shard <= my) & (
                    (shard + 1) * s_kv_loc > my * s_loc - window + 1)
                offs = jnp.stack([my * s_loc, shard * s_kv_loc])
                return jax.lax.cond(
                    live,
                    lambda: partial_for(k_cur, v_cur, kvseg_cur, True,
                                        shard, offsets=offs),
                    skipped)
            if causal:
                branch = jnp.where(shard == my, 0,
                                   jnp.where(shard < my, 1, 2))
                return jax.lax.switch(branch, [
                    lambda: partial_for(k_cur, v_cur, kvseg_cur, True,
                                        shard),                # diagonal
                    lambda: partial_for(k_cur, v_cur, kvseg_cur, False,
                                        shard),                # past
                    skipped,                                   # future
                ])
            if has_len:
                loc_len = jnp.clip(len_blk - shard * s_kv_loc, 0,
                                   s_kv_loc)
                return partial_for(k_cur, v_cur, kvseg_cur, False, shard,
                                   lengths=loc_len)
            return partial_for(k_cur, v_cur, kvseg_cur, False, shard)

        def body(t, carry):
            # Rotate BEFORE compute: step t works on shard (my - t), and
            # the loop runs t = 1..n-1 — no dead final rotation.  The
            # kv-side segment ids travel with their shard.
            o, lse, k_cur, v_cur, kvseg_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            if has_seg:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis, perm)
            o_p, lse_p = step_partial(t, k_cur, v_cur, kvseg_cur)
            o, lse = _lse_combine(o, lse, o_p, lse_p)
            return o, lse, k_cur, v_cur, kvseg_cur

        # Step 0 runs on the resident shard (always live under causal —
        # it is the diagonal).
        o, lse = step_partial(0, k_blk, v_blk, kvseg_blk)
        o = o.astype(jnp.float32)
        seg0 = kvseg_blk if has_seg else jnp.zeros((), jnp.int32)
        o, lse, _, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (o, lse, k_blk, v_blk, seg0))
        return o.astype(qs_blk.dtype), lse

    spec = P(None, axis, None)
    seg_spec = P(None, axis)
    in_specs = [spec, spec, spec]
    operands = [qs, k, v]
    if has_seg:
        in_specs += [seg_spec, seg_spec]
        operands += [q_seg, kv_seg]
    if has_len:
        in_specs.append(P(None))
        operands.append(kv_len)
    fn = jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(spec, spec), check_vma=False)
    return fn(*operands)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13))
def _ring_core(qs, k, v, q_seg, kv_seg, mesh, axis, cfg, causal, window,
               logit_cap, block_q, block_kv, run_interpret):
    o, _ = _ring_fwd_impl(qs, k, v, q_seg, kv_seg, None, mesh, axis, cfg,
                          causal, window, logit_cap, block_q, block_kv,
                          run_interpret)
    return o


def _ring_core_fwd(qs, k, v, q_seg, kv_seg, mesh, axis, cfg, causal,
                   window, logit_cap, block_q, block_kv, run_interpret):
    o, lse = _ring_fwd_impl(qs, k, v, q_seg, kv_seg, None, mesh, axis,
                            cfg, causal, window, logit_cap, block_q,
                            block_kv, run_interpret)
    return o, (qs, k, v, o, lse, q_seg, kv_seg)


def _ring_core_bwd(mesh, axis, cfg, causal, window, logit_cap, block_q,
                   block_kv, run_interpret, res, do):
    """Second ring: each KV shard's accumulating (dk, dv) rotates WITH
    it, so after ring_size steps every shard has collected every
    device's contribution and is home.  dq accumulates locally.  The
    per-step gradients come from the single-chip flash backward kernels
    evaluated against the forward's GLOBAL log-sum-exp."""
    from gemm_hls_tpu.ops.pallas_flash import (
        flash_mha_bwd_dq, flash_mha_bwd_dkv,
    )

    qs, k, v, o, lse, q_seg, kv_seg = res
    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)
    has_seg = q_seg is not None

    def local(qs_blk, k_blk, v_blk, do_blk, o_blk, lse_blk, *extra):
        extra = list(extra)
        qseg_blk = extra.pop(0) if has_seg else None
        kvseg_blk = extra.pop(0) if has_seg else None
        delta = jnp.sum(do_blk.astype(jnp.float32)
                        * o_blk.astype(jnp.float32), axis=-1,
                        keepdims=True)
        do_c = do_blk.astype(qs_blk.dtype)
        my = jax.lax.axis_index(axis)
        s_loc = qs_blk.shape[1]
        s_kv_loc = k_blk.shape[1]
        kv_heads = k_blk.shape[0]
        qseg3, _ = _seg3(qseg_blk, kvseg_blk)

        def grads_for(k_cur, v_cur, kvseg_cur, is_causal, offsets=None):
            kvseg3 = (kvseg_cur.astype(jnp.int32)[:, None, :]
                      if has_seg else None)
            dqc = flash_mha_bwd_dq(
                qs_blk, k_cur, v_cur, do_c, lse_blk, delta, qseg3, kvseg3,
                offsets, cfg=cfg, causal=is_causal, block_q=block_q,
                block_kv=block_kv, window=window, logit_cap=logit_cap,
                interpret=run_interpret).astype(jnp.float32)
            dkc, dvc = flash_mha_bwd_dkv(
                qs_blk, k_cur, v_cur, do_c, lse_blk, delta, qseg3, kvseg3,
                offsets, cfg=cfg, causal=is_causal, block_q=block_q,
                block_kv=block_kv, window=window, logit_cap=logit_cap,
                interpret=run_interpret)
            dkc, dvc = _group_reduce(dkc.astype(jnp.float32),
                                     dvc.astype(jnp.float32), kv_heads)
            return dqc, dkc, dvc

        def zeros():
            return (jnp.zeros(qs_blk.shape, jnp.float32),
                    jnp.zeros(k_blk.shape, jnp.float32),
                    jnp.zeros(k_blk.shape, jnp.float32))

        def step_grads(t, k_cur, v_cur, kvseg_cur):
            shard = (my - t) % n_ring
            if causal and window is not None:
                live = (shard <= my) & (
                    (shard + 1) * s_kv_loc > my * s_loc - window + 1)
                offs = jnp.stack([my * s_loc, shard * s_kv_loc])
                return jax.lax.cond(
                    live,
                    lambda: grads_for(k_cur, v_cur, kvseg_cur, True,
                                      offsets=offs),
                    zeros)
            if causal:
                branch = jnp.where(shard == my, 0,
                                   jnp.where(shard < my, 1, 2))
                return jax.lax.switch(branch, [
                    lambda: grads_for(k_cur, v_cur, kvseg_cur, True),
                    lambda: grads_for(k_cur, v_cur, kvseg_cur, False),
                    zeros,
                ])
            return grads_for(k_cur, v_cur, kvseg_cur, False)

        def body(t, carry):
            # Rotate BEFORE compute (t = 1..n-1): each shard travels
            # with its accumulating (dk, dv).
            dq, dk, dv, k_cur, v_cur, kvseg_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk = jax.lax.ppermute(dk, axis, perm)
            dv = jax.lax.ppermute(dv, axis, perm)
            if has_seg:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis, perm)
            dqc, dkc, dvc = step_grads(t, k_cur, v_cur, kvseg_cur)
            return dq + dqc, dk + dkc, dv + dvc, k_cur, v_cur, kvseg_cur

        dq, dk, dv = step_grads(0, k_blk, v_blk, kvseg_blk)
        seg0 = kvseg_blk if has_seg else jnp.zeros((), jnp.int32)
        dq, dk, dv, _, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (dq, dk, dv, k_blk, v_blk, seg0))
        # One final gradient-only rotation sends each shard's completed
        # (dk, dv) home (the KV payload itself no longer needs to move).
        dk = jax.lax.ppermute(dk, axis, perm)
        dv = jax.lax.ppermute(dv, axis, perm)
        return (dq.astype(qs_blk.dtype), dk.astype(k_blk.dtype),
                dv.astype(v_blk.dtype))

    spec = P(None, axis, None)
    seg_spec = P(None, axis)
    in_specs = [spec] * 6
    operands = [qs, k, v, do, o, lse]
    if has_seg:
        in_specs += [seg_spec, seg_spec]
        operands += [q_seg, kv_seg]
    fn = jax.shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(spec, spec, spec), check_vma=False)
    dq, dk, dv = fn(*operands)
    # Integer segment-id inputs take float0 cotangents.
    ct_seg = (None if q_seg is None else
              np.zeros(q_seg.shape, jax.dtypes.float0))
    ct_kvseg = (None if kv_seg is None else
                np.zeros(kv_seg.shape, jax.dtypes.float0))
    return dq, dk, dv, ct_seg, ct_kvseg


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


# ---------------------------------------------------------------------------
# Zigzag (load-balanced causal) ring
# ---------------------------------------------------------------------------
#
# Plain contiguous sharding leaves device d with d+1 live (non-future)
# ring steps out of n — the last device does ~2x the mean work and the
# ring's wall clock is its critical path.  Zigzag layout pairs chunk d
# with chunk 2n-1-d on device d (2n chunks total), which makes the
# per-step live work UNIFORM:
#
#   q_lo = chunk my        (early half:  index < n)
#   q_hi = chunk 2n-1-my   (late half:   index >= n)
#   resident kv shard at step t comes from src = (my - t) mod n
#
#   (q_hi, kv_lo): kv index src < n <= 2n-1-my          — always past
#   (q_lo, kv_hi): kv index 2n-1-src >= n > my          — always future
#   (q_lo, kv_lo): past iff src < my, diagonal iff src == my
#   (q_hi, kv_hi): past iff src > my, diagonal iff src == my
#
# Step 0 (src == my) runs both diagonals + the always-past pair
# (~2 full-pair equivalents); every later step runs the always-past
# pair plus EXACTLY ONE of the two conditional pairs — selected with a
# jnp.where on the operands so the compiled step does a constant two
# chunk-pair flash calls on every device.

def _zz_fwd_impl(qs, k, v, mesh, axis, cfg, block_q, block_kv,
                 run_interpret, logit_cap=None):
    from gemm_hls_tpu.ops.pallas_flash import flash_mha

    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)

    def local(qs_blk, k_blk, v_blk):
        c = qs_blk.shape[1] // 2
        my = jax.lax.axis_index(axis)
        q_lo, q_hi = qs_blk[:, :c], qs_blk[:, c:]

        def flash(qc, kc, vc, is_causal):
            o_p, lse_p = flash_mha(qc, kc, vc, cfg=cfg, causal=is_causal,
                                   block_q=block_q, block_kv=block_kv,
                                   logit_cap=logit_cap,
                                   interpret=run_interpret, save_lse=True)
            return o_p.astype(jnp.float32), lse_p

        # Step 0: resident shard — two diagonals + the always-past pair.
        o_lo, lse_lo = flash(q_lo, k_blk[:, :c], v_blk[:, :c], True)
        o_hi, lse_hi = flash(q_hi, k_blk[:, :c], v_blk[:, :c], False)
        o_p, lse_p = flash(q_hi, k_blk[:, c:], v_blk[:, c:], True)
        o_hi, lse_hi = _lse_combine(o_hi, lse_hi, o_p, lse_p)

        def body(t, carry):
            o_lo, lse_lo, o_hi, lse_hi, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            src = (my - t) % n_ring
            k_lo, k_hi = k_cur[:, :c], k_cur[:, c:]
            v_lo, v_hi = v_cur[:, :c], v_cur[:, c:]
            o_p, lse_p = flash(q_hi, k_lo, v_lo, False)
            o_hi, lse_hi = _lse_combine(o_hi, lse_hi, o_p, lse_p)
            # The one live conditional pair (src != my for t >= 1).
            use_lo = src < my
            q_sel = jnp.where(use_lo, q_lo, q_hi)
            k_sel = jnp.where(use_lo, k_lo, k_hi)
            v_sel = jnp.where(use_lo, v_lo, v_hi)
            o_p, lse_p = flash(q_sel, k_sel, v_sel, False)
            o_lo2, lse_lo2 = _lse_combine(o_lo, lse_lo, o_p, lse_p)
            o_hi2, lse_hi2 = _lse_combine(o_hi, lse_hi, o_p, lse_p)
            o_lo = jnp.where(use_lo, o_lo2, o_lo)
            lse_lo = jnp.where(use_lo, lse_lo2, lse_lo)
            o_hi = jnp.where(use_lo, o_hi, o_hi2)
            lse_hi = jnp.where(use_lo, lse_hi, lse_hi2)
            return o_lo, lse_lo, o_hi, lse_hi, k_cur, v_cur

        o_lo, lse_lo, o_hi, lse_hi, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (o_lo, lse_lo, o_hi, lse_hi, k_blk, v_blk))
        o = jnp.concatenate([o_lo, o_hi], axis=1).astype(qs_blk.dtype)
        lse = jnp.concatenate([lse_lo, lse_hi], axis=1)
        return o, lse

    spec = P(None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    return fn(qs, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _zz_core(qs, k, v, mesh, axis, cfg, block_q, block_kv, run_interpret,
             logit_cap):
    o, _ = _zz_fwd_impl(qs, k, v, mesh, axis, cfg, block_q, block_kv,
                        run_interpret, logit_cap)
    return o


def _zz_core_fwd(qs, k, v, mesh, axis, cfg, block_q, block_kv,
                 run_interpret, logit_cap):
    o, lse = _zz_fwd_impl(qs, k, v, mesh, axis, cfg, block_q, block_kv,
                          run_interpret, logit_cap)
    return o, (qs, k, v, o, lse)


def _zz_core_bwd(mesh, axis, cfg, block_q, block_kv, run_interpret,
                 logit_cap, res, do):
    """Gradient ring in zigzag layout: each KV shard's accumulating
    (dk, dv) rotates with it (same schedule as ``_ring_core_bwd``), and
    each step mirrors the forward's uniform two-pair structure."""
    from gemm_hls_tpu.ops.pallas_flash import (
        flash_mha_bwd_dq, flash_mha_bwd_dkv,
    )

    qs, k, v, o, lse = res
    n_ring = mesh.shape[axis]
    perm = _ring_shifts(n_ring)

    def local(qs_blk, k_blk, v_blk, do_blk, o_blk, lse_blk):
        c = qs_blk.shape[1] // 2
        my = jax.lax.axis_index(axis)
        kv_heads = k_blk.shape[0]
        delta = jnp.sum(do_blk.astype(jnp.float32)
                        * o_blk.astype(jnp.float32), axis=-1,
                        keepdims=True)
        do_c = do_blk.astype(qs_blk.dtype)
        q_lo, q_hi = qs_blk[:, :c], qs_blk[:, c:]
        do_lo, do_hi = do_c[:, :c], do_c[:, c:]
        lse_lo, lse_hi = lse_blk[:, :c], lse_blk[:, c:]
        dl_lo, dl_hi = delta[:, :c], delta[:, c:]

        def grads_for(qc, kc, vc, doc, lsec, dc, is_causal):
            dqc = flash_mha_bwd_dq(
                qc, kc, vc, doc, lsec, dc, cfg=cfg, causal=is_causal,
                block_q=block_q, block_kv=block_kv,
                logit_cap=logit_cap,
                interpret=run_interpret).astype(jnp.float32)
            dkc, dvc = flash_mha_bwd_dkv(
                qc, kc, vc, doc, lsec, dc, cfg=cfg, causal=is_causal,
                block_q=block_q, block_kv=block_kv,
                logit_cap=logit_cap,
                interpret=run_interpret)
            dkc, dvc = _group_reduce(dkc.astype(jnp.float32),
                                     dvc.astype(jnp.float32), kv_heads)
            return dqc, dkc, dvc

        # Step 0: both diagonals + the always-past (q_hi, kv_lo) pair.
        dq_lo, dk_c, dv_c = grads_for(
            q_lo, k_blk[:, :c], v_blk[:, :c], do_lo, lse_lo, dl_lo, True)
        dq_p, dk_p, dv_p = grads_for(
            q_hi, k_blk[:, :c], v_blk[:, :c], do_hi, lse_hi, dl_hi, False)
        dq_hi, dk_lo0, dv_lo0 = dq_p, dk_c + dk_p, dv_c + dv_p
        dq_p, dk_hi0, dv_hi0 = grads_for(
            q_hi, k_blk[:, c:], v_blk[:, c:], do_hi, lse_hi, dl_hi, True)
        dq_hi = dq_hi + dq_p
        dk = jnp.concatenate([dk_lo0, dk_hi0], axis=1)
        dv = jnp.concatenate([dv_lo0, dv_hi0], axis=1)

        def body(t, carry):
            dq_lo, dq_hi, dk, dv, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            dk = jax.lax.ppermute(dk, axis, perm)
            dv = jax.lax.ppermute(dv, axis, perm)
            src = (my - t) % n_ring
            k_lo, k_hi = k_cur[:, :c], k_cur[:, c:]
            v_lo, v_hi = v_cur[:, :c], v_cur[:, c:]
            dqc, dkc, dvc = grads_for(q_hi, k_lo, v_lo, do_hi, lse_hi,
                                      dl_hi, False)
            dq_hi = dq_hi + dqc
            zero = jnp.zeros_like(dkc)
            dk = dk + jnp.concatenate([dkc, zero], axis=1)
            dv = dv + jnp.concatenate([dvc, zero], axis=1)
            # The one live conditional pair.
            use_lo = src < my
            q_sel = jnp.where(use_lo, q_lo, q_hi)
            k_sel = jnp.where(use_lo, k_lo, k_hi)
            v_sel = jnp.where(use_lo, v_lo, v_hi)
            do_sel = jnp.where(use_lo, do_lo, do_hi)
            lse_sel = jnp.where(use_lo, lse_lo, lse_hi)
            dl_sel = jnp.where(use_lo, dl_lo, dl_hi)
            dqc, dkc, dvc = grads_for(q_sel, k_sel, v_sel, do_sel,
                                      lse_sel, dl_sel, False)
            dq_lo = dq_lo + jnp.where(use_lo, dqc, 0.0)
            dq_hi = dq_hi + jnp.where(use_lo, 0.0, dqc)
            dk = dk + jnp.concatenate(
                [jnp.where(use_lo, dkc, 0.0),
                 jnp.where(use_lo, 0.0, dkc)], axis=1)
            dv = dv + jnp.concatenate(
                [jnp.where(use_lo, dvc, 0.0),
                 jnp.where(use_lo, 0.0, dvc)], axis=1)
            return dq_lo, dq_hi, dk, dv, k_cur, v_cur

        dq_lo, dq_hi, dk, dv, _, _ = jax.lax.fori_loop(
            1, n_ring, body, (dq_lo, dq_hi, dk, dv, k_blk, v_blk))
        # One final gradient-only rotation sends each shard's completed
        # (dk, dv) home.
        dk = jax.lax.ppermute(dk, axis, perm)
        dv = jax.lax.ppermute(dv, axis, perm)
        dq = jnp.concatenate([dq_lo, dq_hi], axis=1)
        return (dq.astype(qs_blk.dtype), dk.astype(k_blk.dtype),
                dv.astype(v_blk.dtype))

    spec = P(None, axis, None)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec,) * 6,
                       out_specs=(spec, spec, spec), check_vma=False)
    return fn(qs, k, v, do, o, lse)


_zz_core.defvjp(_zz_core_fwd, _zz_core_bwd)
