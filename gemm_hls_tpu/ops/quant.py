"""Weight-only quantization for the CA-GEMM kernels.

Inference GEMMs at small batch are weight-bandwidth-bound: at M ≪ N, K
the B-panel stream dominates HBM traffic (the CA law's ``M·N·K/Tm``
term), so halving (int8) or quartering (int4) the weight bytes moves the
roofline directly.  The dequantization runs INSIDE the kernel on the
streamed block — weights enter HBM→VMEM quantized, and the expansion to
bf16 happens in-register (``ops/pallas_dequant.py``), the same
fused-into-the-stream philosophy as the reference's width-conversion
stages (``kernel/Memory.cpp:289-321``).

Scaling schemes:

* **per-channel** (``group_size=None``): one f32 scale per output column.
  Exact post-dot fold: ``sum_k x·(w_q·s_n) = s_n · sum_k x·w_q``.
* **group-wise** (``group_size=g``): one scale per (K-group, column);
  the kernel applies it per K-block (requires ``group_size ==
  block_k``), bounding quantization error per group — needed for int4.

int4 packing: two K-rows per int8 byte, **planar** — row ``i`` of the
packed array holds K-rows ``i`` (low nibble) and ``i + K/2`` (high
nibble) of its K-group, so the kernel unpacks with two shifts and a
concat, no lane interleave (see ``pack_int4``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def quantize_weights(w, bits: int = 8,
                     group_size: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric weight quantization: returns (w_q, scales).

    Args:
      w: (K, N) float weights.
      bits: 8 (int8, range ±127) or 4 (int4 values in ±7, packed).
      group_size: K-rows per scale group (must divide K; None = whole K,
        i.e. per-channel).

    Returns:
      w_q: int8 array — (K, N) for bits=8; (K//2, N) planar-packed for
        bits=4 (two nibbles per byte, low = first half of each group).
      scales: f32 (K/group_size, N) — (1, N) for per-channel.
    """
    w = np.asarray(w, np.float32)
    k, n = w.shape
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    g = group_size or k
    if k % g:
        raise ValueError(f"group_size {g} must divide K={k}")
    if bits == 4 and g % 2:
        raise ValueError(f"int4 needs an even group_size, got {g}")
    qmax = 127.0 if bits == 8 else 7.0

    wg = w.reshape(k // g, g, n)
    scales = np.abs(wg).max(axis=1) / qmax          # (k/g, n)
    scales = np.where(scales == 0, 1.0, scales).astype(np.float32)
    q = np.rint(wg / scales[:, None, :]).clip(-qmax, qmax).astype(np.int8)

    if bits == 8:
        return q.reshape(k, n), scales

    # int4 planar packing per group: byte row i <- (low: row i,
    # high: row i + g/2).  Both nibbles share the group's scale.
    half = g // 2
    lo = q[:, :half, :].astype(np.int8)
    hi = q[:, half:, :].astype(np.int8)
    packed = ((lo & 0x0F) | (hi << 4)).astype(np.int8)
    return packed.reshape(k // 2, n), scales


def dequantize_weights(w_q, scales, bits: int = 8,
                       group_size: Optional[int] = None) -> np.ndarray:
    """Reference (host) inverse of :func:`quantize_weights`."""
    w_q = np.asarray(w_q)
    scales = np.asarray(scales, np.float32)
    if bits == 8:
        k = w_q.shape[0]
        g = group_size or k
        return (w_q.reshape(k // g, g, -1).astype(np.float32)
                * scales[:, None, :]).reshape(k, -1)
    k2, n = w_q.shape
    k = 2 * k2
    g = group_size or k
    half = g // 2
    packed = w_q.reshape(k // g, half, n)
    lo = ((packed.astype(np.int8) << 4).astype(np.int8) >> 4)
    hi = packed.astype(np.int8) >> 4
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return (q * scales[:, None, :]).reshape(k, n)


def matmul_quantized(x, w_q, scales, *, bits: int = 8,
                     group_size: Optional[int] = None,
                     config=None, out_dtype=None,
                     interpret: Optional[bool] = None):
    """y = x · dequant(w_q, scales), dequantization fused in-kernel.

    Args:
      x: (M, K) activations (bf16/f32).
      w_q, scales: from :func:`quantize_weights` (same bits/group_size).
      config: optional GemmConfig; blocks are clamped so that group-wise
        scales align with block_k.

    Inference path (no gradient); see ``ops/pallas_dequant.py``.
    """
    import jax.numpy as jnp

    from gemm_hls_tpu.config import default_config
    from gemm_hls_tpu.ops.matmul import _resolve_interpret
    from gemm_hls_tpu.ops.pallas_dequant import dequant_matmul

    m, k = x.shape
    n = w_q.shape[1]
    g = group_size or k
    cfg = config
    if cfg is None:
        # Autotuned family winner for this shape bucket, if cached.
        from gemm_hls_tpu.tools.autotune import cached_family_entry
        e = cached_family_entry(f"dequant{bits}", (m, n, k),
                                dtype=str(x.dtype),
                                tag=f"g{group_size}" if group_size
                                else "chan")
        if e is not None:
            cfg = default_config(str(x.dtype)).replace(
                block_m=e["block_m"], block_n=e["block_n"],
                block_k=e["block_k"],
                vmem_limit_bytes=110 * 1024 * 1024)
    if cfg is None:
        cfg = default_config(str(x.dtype))
        if m <= 128:
            # Small-batch inference is weight-DMA/VPU-unpack bound, not
            # MXU bound: 2k x 2k weight blocks quarter the grid-step
            # count (measured +24% at M=32, N=K=8192 int4 —
            # experiments/int4_unpack_probe2.py).
            cfg = cfg.replace(block_n=min(2048, n), block_k=min(2048, k),
                              vmem_limit_bytes=110 * 1024 * 1024)
    bk = min(cfg.block_k, k)
    if g != k:
        # Whole scale groups per K-block (the kernel folds multiple
        # groups per block; see ops/pallas_dequant.py).
        bk = max(g, (bk // g) * g)
    cfg = cfg.replace(dtype=str(x.dtype), block_k=bk)
    if out_dtype is not None:
        cfg = cfg.replace(out_dtype=str(jnp.dtype(out_dtype)))
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    return dequant_matmul(jnp.asarray(x), jnp.asarray(w_q),
                          jnp.asarray(scales, jnp.float32), cfg=cfg,
                          bits=bits, group_size=group_size,
                          interpret=_resolve_interpret(cfg))


def matmul_w8a8(x, w_q, scales, *, group_size: Optional[int] = None,
                config=None, out_dtype=None,
                interpret: Optional[bool] = None):
    """y ≈ x · dequant(w_q, scales) on the int8 MXU engine (~2× bf16
    where compute-bound): activations are dynamically quantized per row
    (symmetric int8), the dot runs int8×int8→int32 exactly, and both
    scales apply on the f32 accumulator.  Error ~1e-2.  Inference path.
    """
    import jax.numpy as jnp

    from gemm_hls_tpu.config import LANE, default_config, round_up, sublane
    from gemm_hls_tpu.ops.matmul import _resolve_interpret
    from gemm_hls_tpu.ops.pallas_dequant import w8a8_matmul

    m, k = x.shape
    n = w_q.shape[1]
    g = group_size or k
    cfg = config
    if cfg is None:
        # Autotuned W8A8 family winner for this shape bucket, if cached;
        # then the dense int8 bucket (same engine, same block optimum).
        from gemm_hls_tpu.tools.autotune import (cached_config,
                                                 cached_family_entry)
        e = cached_family_entry("w8a8", (m, n, k), dtype=str(x.dtype),
                                tag=f"g{group_size}" if group_size
                                else "chan")
        if e is not None:
            cfg = default_config("int8").replace(
                block_m=e["block_m"], block_n=e["block_n"],
                block_k=e["block_k"],
                vmem_limit_bytes=110 * 1024 * 1024)
        else:
            cfg = cached_config(m, n, k, dtype="int8")
    if cfg is None:
        # The int8-engine winner geometry (data/autotune_seed.json),
        # clamped to the problem — the dot runs on the same engine as
        # the plain int8 kernel, so its block optimum carries over.
        cfg = default_config("int8").replace(
            block_m=min(512, round_up(m, sublane("int8"))),
            block_n=min(1024, round_up(n, LANE)),
            block_k=min(4096, round_up(k, LANE)),
            vmem_limit_bytes=110 * 1024 * 1024,
        )
    bk = min(cfg.block_k, k)
    if g != k:
        bk = g
    cfg = cfg.replace(dtype="int8", block_k=bk,
                      out_dtype=str(jnp.dtype(out_dtype or jnp.float32)))
    if interpret is not None:
        cfg = cfg.replace(interpret=interpret)
    return w8a8_matmul(jnp.asarray(x), jnp.asarray(w_q),
                       jnp.asarray(scales, jnp.float32), cfg=cfg,
                       group_size=group_size,
                       interpret=_resolve_interpret(cfg))
