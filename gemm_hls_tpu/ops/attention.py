"""Fused per-head attention on the batched CA-GEMM kernel.

The end-to-end showcase of the fused-epilogue machinery: the
attention-scores shape (B=heads, M=N=seq, K=head_dim) is the thin-K GEMM
where a *standalone* kernel loses to XLA — XLA fuses the softmax consumer
into the dot and elides the scores' HBM round trip, beating the
write-included roofline (docs/BENCHMARKS.md "thin-K baselines" caveat).
The framework's answer is the same fusion on our side: the softmax runs
as a fused epilogue inside the batched MXU kernel's store.  Row-wise
reductions are legal there because the batched kernel leaves N
un-gridded — each example's full score row is present in the block
(``ops/pallas_mxu.py::_batched_kernel``).

This generalizes the reference's writeback-stage fusion
(``kernel/Memory.cpp:323-359``: dtype conversion fused into the C drain)
to an arbitrary consumer, applied to the workload TPUs exist for.

Numerics: scores accumulate in f32; the softmax runs in f32 inside the
kernel; only the normalized probabilities are cast to the storage dtype.
The max-subtraction makes the exp overflow-safe for any score magnitude.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig


def _softmax_rows(acc):
    """Row softmax over the last axis of the f32 accumulator block.

    Used as a fused epilogue: valid only where the kernel block holds
    complete rows (the batched kernel; N un-gridded).
    """
    m = jnp.max(acc, axis=-1, keepdims=True)
    e = jnp.exp(acc - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def attention_scores(q, k, *, scale: Optional[float] = None,
                     config: Optional[GemmConfig] = None,
                     interpret: Optional[bool] = None):
    """softmax(q . k^T * scale) per head, softmax fused into the kernel.

    Args:
      q: (B, S_q, D) per-head queries.
      k: (B, S_k, D) per-head keys (contracted via ``transpose_b`` — no
        materialized transpose).
      scale: score scale; default 1/sqrt(D).

    Returns (B, S_q, S_k) probabilities in q's dtype.

    The scale is folded into q before the GEMM (one (B,S,D) elementwise
    multiply that XLA fuses into the operand load) so the epilogue is
    parameter-free.  Differentiable via the fused-epilogue custom VJP
    (backward recomputes the scores accumulator and pulls the cotangent
    through ``jax.vjp`` of the softmax).
    """
    from gemm_hls_tpu.ops.matmul import _batched_fast_path_ok, matmul
    from gemm_hls_tpu.ops.semiring import get_semiring

    if q.ndim != 3 or k.ndim != 3:
        raise ValueError(f"attention_scores expects (B, S, D) operands, "
                         f"got {q.shape} x {k.shape}")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)

    # The row softmax is only a legal epilogue where the kernel block
    # holds complete score rows — the batched kernel (N un-gridded).  If
    # the per-example footprint would route to the vmapped 2-D kernel
    # (N gridded), fuse nothing and softmax in XLA instead.
    from gemm_hls_tpu.config import default_config

    bcfg = (config or default_config(str(q.dtype))).replace(
        dtype=str(q.dtype), transpose_b=True)
    if interpret is not None:
        bcfg = bcfg.replace(interpret=interpret)
    sr = get_semiring("plus_times")
    if _batched_fast_path_ok(qs, k, bcfg, sr, None, None):
        return matmul(qs, k, transpose_b=True, config=config,
                      interpret=interpret, epilogue=_softmax_rows)
    scores = matmul(qs, k, transpose_b=True, config=config,
                    interpret=interpret, out_dtype=jnp.float32)
    return jax.nn.softmax(scores, axis=-1).astype(q.dtype)


def flash_attention(q, k, v, *, scale: Optional[float] = None,
                    causal: bool = False,
                    window: Optional[int] = None,
                    logit_cap: Optional[float] = None,
                    kv_lengths=None,
                    q_segment_ids=None, kv_segment_ids=None,
                    config: Optional[GemmConfig] = None,
                    block_q: Optional[int] = None,
                    block_kv: Optional[int] = None,
                    block_kv_compute: Optional[int] = None,
                    block_q_compute: Optional[int] = None,
                    bwd_block_q: Optional[int] = None,
                    bwd_block_kv: Optional[int] = None,
                    interpret: Optional[bool] = None):
    """Per-head attention in ONE kernel: softmax(q·kᵀ·scale)·v with the
    probability matrix never leaving VMEM (online softmax over streamed
    KV blocks — ``ops/pallas_flash.py``).

    Versus :func:`attention` (fused scores + separate PV GEMM), HBM
    traffic drops from O(S²) to O(S·D), lifting the workload from the
    bandwidth roofline to the MXU roofline; ``causal=True`` also skips
    fully-masked KV blocks (half the FLOPs at S_q = S_kv).

    Args:
      q: (B, S_q, D) heads-major, or (batch, S_q, H, D) in the 4-D
        ``jax.nn.dot_product_attention`` layout (auto-detected; the
        result comes back in the same layout).
      k, v: (B_kv, S_kv, D) / (batch, S_kv, H_kv, D).  Grouped-query /
        multi-query attention: the kv head count may divide q's — each
        group of q heads reads the shared kv head via the kernel's
        BlockSpec index map (no materialized broadcast), and the
        backward folds the group's dk/dv onto the shared head.
      scale: score scale, defaults to 1/sqrt(D).
      window: sliding-window size (requires ``causal``): each query
        attends positions (q_pos − window, q_pos]; KV blocks wholly
        outside the window are skipped, bounding work at O(S·window·D).
      logit_cap: Gemma-style soft cap — scores squashed to
        cap·tanh(s/cap) before the softmax (the backward carries the
        tanh derivative).
      kv_lengths: per-example logical KV lengths (int array, one per kv
        head row — or per batch element in the 4-D layout), for
        padded-cache decode: positions >= length are masked and KV
        blocks past the cache end are skipped.  Lengths must be >= 1.
        With ``causal=True`` the queries are anchored at the cache END
        ("bottom-right": q row r sits at position length - S_q + r), so
        single-token decode attends the whole valid cache.
        Inference-only (no custom VJP on this path).
      q_segment_ids / kv_segment_ids: packed-sequence masks — int arrays
        (B, S) (or (batch, S) in the 4-D layout, broadcast over heads);
        only same-segment (q, kv) pairs interact.  Every q position must
        share a segment with at least one kv position (softmax over an
        empty set is nan).  Differentiable.

    Returns attention output in q's layout and dtype.
    """
    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.matmul import _resolve_interpret
    from gemm_hls_tpu.ops.pallas_flash import flash_mha_diff

    four_d = q.ndim == 4
    decode_fast = False
    if four_d:
        # (batch, seq, heads, dim) -> heads-major (batch*heads, seq, dim).
        if k.ndim != 4 or v.ndim != 4:
            raise ValueError(f"mixed layouts: {q.shape} x {k.shape}")
        nb = q.shape[0]
        hq = q.shape[2]
        hkv = k.shape[2]
        # Single-token decode fast path: the default packing would give
        # the kernel S_q = 1 (M=1 MXU dots across a B·H_Q·n_kv grid —
        # pure grid-latch; measured 2.3x slower than XLA's composition
        # at B=64, 4k cache).  Pack each KV head's GROUP of q heads as
        # the q ROWS instead: (batch·H_kv, group, D) against the
        # (batch·H_kv, S, D) cache.  Causal at s_q=1 with decode
        # anchoring attends every valid cache position, which is exactly
        # the non-causal masked read — so the rewrite drops causal and
        # keeps kv_lengths.
        decode_fast = (q.shape[1] == 1 and hq % hkv == 0
                       and window is None and q_segment_ids is None
                       and logit_cap is None
                       and (kv_lengths is not None or not causal))
        if decode_fast:
            group = hq // hkv
            # Head order: q head h reads kv head h // group, so the
            # (kvh, within-group) reshape preserves head identity.
            q = q.reshape(nb, hkv, group, q.shape[3]).reshape(
                nb * hkv, group, q.shape[3])
            k = k.transpose(0, 2, 1, 3).reshape(
                nb * hkv, k.shape[1], k.shape[3])
            v = v.transpose(0, 2, 1, 3).reshape(
                nb * hkv, v.shape[1], v.shape[3])
            if kv_lengths is not None:
                kv_lengths = jnp.repeat(jnp.asarray(kv_lengths), hkv)
            causal = False
        else:
            def pack(x):
                return x.transpose(0, 2, 1, 3).reshape(
                    x.shape[0] * x.shape[2], x.shape[1], x.shape[3])
            q, k, v = pack(q), pack(k), pack(v)
            if kv_lengths is not None:
                # One length per batch element -> one per packed kv head.
                kv_lengths = jnp.repeat(jnp.asarray(kv_lengths), hkv)
            if q_segment_ids is not None:
                q_segment_ids = jnp.repeat(jnp.asarray(q_segment_ids), hq,
                                           axis=0)
                kv_segment_ids = jnp.repeat(jnp.asarray(kv_segment_ids),
                                            hkv, axis=0)
    if q.ndim != 3:
        raise ValueError(f"flash_attention expects (B, S, D) or "
                         f"(batch, S, H, D), got {q.shape}")
    if block_q is None or block_kv is None:
        # Autotuned (block_q, block_kv[, block_kv_compute]) for this
        # shape bucket, if a measured winner is cached (user cache or
        # the packaged seed) — kills the documented fixed-default
        # cliffs (e.g. S=1024 under block_kv=2048 defaults).  Miss ->
        # the kernel's defaults.
        from gemm_hls_tpu.tools.autotune import cached_family_entry

        e = cached_family_entry(
            "flash", (q.shape[0], q.shape[1], k.shape[1], q.shape[2]),
            dtype=str(q.dtype), tag="causal" if causal else "full")
        block_q = block_q or (e or {}).get("block_q", 512)
        block_kv = block_kv or (e or {}).get("block_kv", 2048)
        if block_kv_compute is None:
            block_kv_compute = (e or {}).get("block_kv_compute")
        if block_q_compute is None:
            block_q_compute = (e or {}).get("block_q_compute")
        if bwd_block_q is None:
            bwd_block_q = (e or {}).get("bwd_block_q")
        if bwd_block_kv is None:
            bwd_block_kv = (e or {}).get("bwd_block_kv")
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if isinstance(scale, (int, float)):
        # Static scale folds into the f32 scores IN-KERNEL — no q*scale
        # HBM round trip (measured 74 -> 103 TF on the S=1024 causal
        # one-pass kernel) and no bf16 rounding of q.
        qs, kscale = q, float(scale)
    else:
        # Traced scale (rare): fall back to the external fold.
        qs = (q * jnp.asarray(scale, q.dtype)).astype(q.dtype)
        kscale = 1.0
    cfg = (config or default_config(str(q.dtype))).replace(
        dtype=str(q.dtype), out_dtype=str(q.dtype))
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    if q_segment_ids is not None:
        q_segment_ids = jnp.asarray(q_segment_ids)
        kv_segment_ids = jnp.asarray(kv_segment_ids)
    if kv_lengths is not None:
        # Padded-cache decode path (inference-only; no custom VJP).
        from gemm_hls_tpu.ops.pallas_flash import flash_mha

        out = flash_mha(qs, k, v, jnp.asarray(kv_lengths),
                        q_segment_ids, kv_segment_ids, cfg=cfg,
                        causal=causal, block_q=block_q, block_kv=block_kv,
                        block_kv_compute=block_kv_compute,
                        block_q_compute=block_q_compute,
                        interpret=_resolve_interpret(cfg), window=window,
                        logit_cap=logit_cap, scale=kscale)
    else:
        # Differentiable: custom VJP runs the flash backward kernels
        # (dq/dk/dv recomputed blockwise from the saved log-sum-exp).
        out = flash_mha_diff(qs, k, v, q_segment_ids, kv_segment_ids,
                             cfg, causal, block_q, block_kv,
                             _resolve_interpret(cfg), window, logit_cap,
                             block_kv_compute, block_q_compute,
                             bwd_block_q, bwd_block_kv, kscale)
    if four_d:
        if decode_fast:
            # (nb*hkv, group, d) rows ARE the q heads of one token.
            out = out.reshape(nb, hq, out.shape[2])[:, None]
        else:
            out = out.reshape(nb, hq, out.shape[1],
                              out.shape[2]).transpose(0, 2, 1, 3)
    return out


def attention(q, k, v, *, scale: Optional[float] = None,
              config: Optional[GemmConfig] = None,
              interpret: Optional[bool] = None):
    """Per-head attention: softmax(q . k^T * scale) . v, scores-softmax
    fused into the first batched GEMM.

    Args:
      q: (B, S_q, D); k: (B, S_k, D); v: (B, S_k, D).

    Returns (B, S_q, D) in q's dtype.

    The probability matrix is materialized once in HBM between the two
    GEMMs (this is fused-scores attention, not flash attention — the
    O(S^2) residency bound still applies; for long sequences pair with
    ``parallel/`` sharding over heads).
    """
    from gemm_hls_tpu.ops.matmul import matmul

    p = attention_scores(q, k, scale=scale, config=config,
                         interpret=interpret)
    return matmul(p, v, config=config, interpret=interpret)
