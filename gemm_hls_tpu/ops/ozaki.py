"""Double-precision-accurate GEMM on bf16 MXUs — the Ozaki slice scheme.

The reference's double-precision configuration runs at 132 GFLOP/s on its
FPGA (``README.md:8``); TPUs have no f64 hardware at all (XLA's emulation is
impractically slow on this part).  This module delivers f64-class accuracy
from the *bf16* systolic array using error-free transformations:

1. **Split** (host, exact): each f64 operand is decomposed into ``n`` slices
   ``x = s_0 + s_1 + ...`` where every slice element carries at most
   ``slice_bits`` mantissa bits (exactly representable in bfloat16).
2. **Multiply** (device, exact): every needed slice pair is multiplied by
   the MXU kernel.  Because ``2*slice_bits + ceil(log2 K) <= 24``, each
   bf16 x bf16 product and its fp32 accumulation over K is *exact* — the
   MXU becomes a fixed-point engine.
3. **Accumulate** (device, compensated): exact partials are summed
   elementwise in float-float (hi, lo) arithmetic (TwoSum), preserving
   ~2^-48 relative accuracy, then combined in f64 on the host.

Effective throughput ~ bf16-peak / n_products; at 8192^3 that is
O(1-3) TFLOP/s of f64-class GEMM — an order of magnitude above the
reference's f64 number, with no f64 hardware in the loop.

Reference for the technique: Ozaki et al., "Error-free transformations of
matrix multiplication by using fast routines of matrix multiplication and
its applications" (Numer. Algorithms, 2012) — public method, original
implementation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.config import GemmConfig, default_config


def slice_plan(k: int, target_rel: float = 1e-14) -> Tuple[int, int]:
    """Choose (slice_bits, n_slices) for contraction length ``k``.

    Exactness constraint: 2*slice_bits + ceil(log2(k)) <= 24 (fp32
    accumulator); accuracy: n_slices * slice_bits mantissa bits must cover
    the f64 target (plus headroom for the float-float accumulator).
    """
    guard = math.ceil(math.log2(max(k, 2)))
    slice_bits = (24 - guard) // 2
    if slice_bits < 1:
        raise ValueError(
            f"K={k} exceeds the exactness bound of the fp32 accumulator "
            f"(2*slice_bits + log2(K) <= 24 requires K <= 2^22); split the "
            f"contraction into segments (e.g. via parallel.staging) and "
            f"combine the segment results in float64")
    slice_bits = min(slice_bits, 8)  # bf16 holds 8 mantissa bits
    need_bits = min(53, int(-math.log2(target_rel)) + 6)
    n_slices = math.ceil(need_bits / slice_bits)
    return slice_bits, n_slices


def split_f64(x: np.ndarray, slice_bits: int, n_slices: int,
              axis: int = 1) -> np.ndarray:
    """Exact fixed-grid decomposition of f64 ``x`` into ``n_slices``.

    Every slice is quantized on a grid whose exponent is *shared along
    ``axis``* (the contraction axis: rows of A, columns of B), so each slice
    element is an integer multiple of a per-vector ulp with at most
    ``slice_bits`` integer bits.  This block-fixed-point property is what
    makes the downstream fp32 dot products error-free: all K products in one
    output element share the exponent grid ``ulp_a * ulp_b`` and their sum
    stays below 2^24 (Ozaki et al. 2012).

    Returns an (n_slices, *x.shape) float64 array with
    ``x ~= sum(slices)`` (exact up to the tail past the last slice).
    """
    x = np.asarray(x, np.float64)
    slices = np.empty((n_slices,) + x.shape, np.float64)
    r = x.copy()
    for i in range(n_slices):
        amax = np.max(np.abs(r), axis=axis, keepdims=True)
        safe = np.where(amax > 0, amax, 1.0)
        # Grid: ulp = 2^(e - slice_bits) with 2^(e-1) <= max < 2^e, so the
        # quantized integers stay strictly below 2^slice_bits.
        e = np.floor(np.log2(safe)) + 1.0
        ulp = np.exp2(e - slice_bits)
        s = np.trunc(r / ulp) * ulp
        slices[i] = s
        r = r - s  # exact: s lies on a grid coarser than r's ulp
    return slices


def _two_sum(a, b):
    """Knuth TwoSum: s + err == a + b exactly (all fp32 ops)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def ozaki_matmul(a: np.ndarray, b: np.ndarray, *,
                 target_rel: float = 1e-14,
                 config: Optional[GemmConfig] = None,
                 interpret: Optional[bool] = None) -> np.ndarray:
    """f64-accurate C = A . B computed on the bf16 MXU.

    Args:
      a: (M, K) float64 (numpy, host).
      b: (K, N) float64.
      target_rel: requested relative accuracy (drives the slice count).

    Returns (M, N) float64.
    """
    from gemm_hls_tpu.ops.matmul import matmul

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")

    slice_bits, n_slices = slice_plan(k, target_rel)
    a_slices = split_f64(a, slice_bits, n_slices, axis=1)  # grid per row
    b_slices = split_f64(b, slice_bits, n_slices, axis=0)  # grid per column

    if config is None:
        config = default_config("bfloat16", out_dtype="float32")
    else:
        config = config.replace(dtype="bfloat16", out_dtype="float32")
    if interpret is not None:
        config = config.replace(interpret=interpret)
    # Exact bf16 slices (<= 8 mantissa bits by construction).
    a_dev = jnp.asarray(a_slices, jnp.bfloat16)
    b_dev = jnp.asarray(b_slices, jnp.bfloat16)

    hi, lo = device_accumulate(a_dev, b_dev, config=config)
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


INT8_SLICE_BITS = 7


def split_f64_int8(x: np.ndarray, n_slices: int, axis: int) -> tuple:
    """Exact fixed-grid decomposition into int8 slices of 7 magnitude bits.

    Returns (slices int8 (n, *shape), ulp float64 per contraction vector).
    ``x ~= ulp * sum_i slices[i] * 2^(-7 i)`` — the int8-engine variant of
    :func:`split_f64` (7 bits/slice vs 6-8, and int32 accumulation admits
    K up to 2^17 instead of 2^(24-2b)).
    """
    x = np.asarray(x, np.float64)
    amax = np.max(np.abs(x), axis=axis, keepdims=True)
    safe = np.where(amax > 0, amax, 1.0)
    e = np.floor(np.log2(safe)) + 1.0
    ulp = np.exp2(e - INT8_SLICE_BITS)
    slices = np.empty((n_slices,) + x.shape, np.int8)
    r = x.copy()
    cur = ulp.copy()
    for i in range(n_slices):
        q = np.clip(np.trunc(r / cur), -127, 127)
        slices[i] = q.astype(np.int8)
        r = r - q * cur
        cur = cur * 2.0 ** -INT8_SLICE_BITS
    return slices, ulp


@functools.partial(jax.jit, static_argnames=("n_slices",))
def _int8_accumulate(sa, sb, *, n_slices: int):
    """All int8 slice-pair GEMMs (exact int32) + float-float combine.

    Partials are scaled by 2^(-7(i+j)) and split into two f32-exact halves
    before TwoSum accumulation.  Returns (hi, lo) float32; the caller
    applies the f64 row/col ulps.
    """
    from gemm_hls_tpu.config import GemmConfig
    from gemm_hls_tpu.ops.matmul import matmul

    m = sa.shape[1]
    n = sb.shape[2]
    cfg = GemmConfig(dtype="int8", out_dtype="int32", block_m=512,
                     block_n=1024, block_k=8192)
    hi = jnp.zeros((m, n), jnp.float32)
    lo = jnp.zeros((m, n), jnp.float32)
    for s in range(n_slices + 1):
        for i in range(s + 1):
            j = s - i
            if i >= n_slices or j >= n_slices:
                continue
            p = matmul(sa[i], sb[j], config=cfg)
            w = jnp.float32(2.0 ** (-INT8_SLICE_BITS * (i + j)))
            p_hi = (p >> 12).astype(jnp.float32) * jnp.float32(4096.0) * w
            p_lo = (p - ((p >> 12) << 12)).astype(jnp.float32) * w
            hi, err = _two_sum(hi, p_hi)
            lo = lo + err
            hi, err = _two_sum(hi, p_lo)
            lo = lo + err
    return hi, lo


def f64_to_f32pair(x: np.ndarray):
    """Exact-ish double-single representation: x ~= hi + lo with hi = f32(x)
    and lo = f32(x - hi) — carries ~48 of f64's 53 mantissa bits (the tail
    beyond bit 48 is lost, matching the float-float accumulator's ~2^-49
    floor).  Two vectorized numpy ops instead of the 8-iteration host split."""
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi).astype(np.float32)
    return hi, lo


@functools.partial(jax.jit, static_argnames=("n_slices", "axis"))
def device_split_int8(hi, lo, *, n_slices: int, axis: int):
    """Device-side :func:`split_f64_int8`: extract the int8 slices from the
    (hi, lo) f32 pair with double-single arithmetic — no f64 on the TPU
    (the chip has none), no 8-pass host loop.

    Returns (slices int8 (n, *shape), ulp f32 per contraction vector).
    Exact to the ~48 bits the f32 pair carries; combined with the
    float-float accumulator the end-to-end scheme sits at ~2^-45 normwise
    (vs ~2^-49 for the host-split path).
    """
    amax = jnp.max(jnp.abs(hi), axis=axis, keepdims=True)
    safe = jnp.where(amax > 0, amax, 1.0)
    e = jnp.floor(jnp.log2(safe)) + 1.0
    ulp = jnp.exp2(e - INT8_SLICE_BITS).astype(jnp.float32)
    # Scaled double-single value v = r_h + r_l in (-2^7, 2^7); divisions by
    # the power-of-two ulp are exact.
    r_h = hi / ulp
    r_l = lo / ulp
    scale = jnp.float32(2.0 ** INT8_SLICE_BITS)
    slices = []
    for _ in range(n_slices):
        q = jnp.clip(jnp.trunc(r_h), -127, 127)
        slices.append(q.astype(jnp.int8))
        r_h = r_h - q                      # exact (integer on r_h's grid)
        r_h, r_l = _two_sum(r_h, r_l)      # renormalize: pull lo bits up
        r_h = r_h * scale                  # exact (power of two)
        r_l = r_l * scale
    return jnp.stack(slices), ulp


def ozaki_matmul_int8(a: np.ndarray, b: np.ndarray, *,
                      target_rel: float = 1e-14,
                      n_slices: int = None, fused: bool = True,
                      split: str = "auto") -> np.ndarray:
    """f64-class GEMM on the *int8* MXU path — ~4x the bf16-slice rate.

    7-bit integer slices with exact int32 accumulation need only 8 slices
    to span f64's mantissa, and the int8 engine runs ~1.8x faster than
    bf16 — ~36 exact GEMMs at 342 TOPS instead of ~53 at 188 TFLOP/s.

    K is unbounded on the fused path: the kernel accumulates int32 only
    within each K block (exact for n_slices * 127^2 * block_k < 2^31) and
    flushes error-free into float-float (hi, lo) per block.  The staged
    path (``fused=False``) accumulates int32 across all of K, so it keeps
    the K <= 2^17 exactness bound.

    ``split``: "host" runs the 8-pass f64 slice loop in numpy (~2^-49
    end-to-end, dominated by host time for large operands); "device" ships
    each operand as an exact (hi, lo) f32 pair and extracts the slices
    on-chip (:func:`device_split_int8`, ~2^-45, host cost two vectorized
    ops); "auto" picks device on TPU, host elsewhere.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    if not fused and k > (1 << 17):
        raise ValueError(f"K={k} exceeds the int32 exactness bound (2^17) "
                         "of the staged path; use fused=True")
    if n_slices is None:
        need_bits = min(53, int(-math.log2(target_rel)) + 6)
        n_slices = math.ceil(need_bits / INT8_SLICE_BITS)
    if split == "auto":
        split = "device" if jax.default_backend() == "tpu" else "host"
    if split == "device":
        ha, la = f64_to_f32pair(a)
        hb, lb = f64_to_f32pair(b)
        sa, ulp_a_d = device_split_int8(jnp.asarray(ha), jnp.asarray(la),
                                        n_slices=n_slices, axis=1)
        sb, ulp_b_d = device_split_int8(jnp.asarray(hb), jnp.asarray(lb),
                                        n_slices=n_slices, axis=0)
        # ulps are exact powers of two; f32 -> f64 is lossless.
        ulp_a = np.asarray(ulp_a_d, np.float64)
        ulp_b = np.asarray(ulp_b_d, np.float64)
    elif split == "host":
        sa_h, ulp_a = split_f64_int8(a, n_slices, axis=1)
        sb_h, ulp_b = split_f64_int8(b, n_slices, axis=0)
        sa, sb = jnp.asarray(sa_h), jnp.asarray(sb_h)
    else:
        raise ValueError(f"split must be 'auto'|'device'|'host', got {split!r}")
    if fused:
        # Single Pallas kernel: the whole slice triangle accumulated in
        # VMEM (ops/pallas_ozaki.py) — no intermediate HBM traffic.
        from gemm_hls_tpu.config import round_up
        from gemm_hls_tpu.ops.pallas_ozaki import fused_ozaki_int8

        # (128, 512, 2048) measured fastest on v5e: 10.6 TF @4096^3
        # (vs 8.7 for 256-row blocks - smaller C tiles keep more K-stream
        # double-buffering headroom in VMEM).
        bm = min(128, round_up(m, 32))
        bn = min(512, round_up(n, 128))
        bk = min(2048, round_up(k, 256))
        mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
        sa_p = jnp.pad(sa, ((0, 0), (0, mp - m), (0, kp - k)))
        sb_p = jnp.pad(sb, ((0, 0), (0, kp - k), (0, np_ - n)))
        # n_diags = n_slices: diagonal d = n_slices contributes at
        # 2^(-7*n_slices) ~ 2^-56, below the float-float accumulator's
        # ~2^-49 floor — truncating it is measured accuracy-neutral
        # (1.07e-15 either way) and drops 7 of 43 products.
        hi, lo = fused_ozaki_int8(sa_p, sb_p,
                                  block_m=bm, block_n=bn, block_k=bk,
                                  n_diags=n_slices)
        hi, lo = hi[:m, :n], lo[:m, :n]
    else:
        hi, lo = _int8_accumulate(sa, sb, n_slices=n_slices)
    return ((np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
            * ulp_a * ulp_b)


def ozaki_matmul_distributed(a: np.ndarray, b: np.ndarray, mesh, *,
                             axes=("x", "y"), target_rel: float = 1e-14,
                             config: Optional[GemmConfig] = None) -> np.ndarray:
    """f64-class GEMM over a device mesh: Ozaki slices x gather-SUMMA.

    The exactness argument is distribution-independent — gather-SUMMA
    computes every output element as one full-K fp32 accumulation on one
    device, so the ``2*slice_bits + log2(K) <= 24`` bound holds unchanged —
    and the float-float combine runs sharded (elementwise).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gemm_hls_tpu.parallel.summa import summa_matmul

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    slice_bits, n_slices = slice_plan(k, target_rel)
    sa = split_f64(a, slice_bits, n_slices, axis=1)
    sb = split_f64(b, slice_bits, n_slices, axis=0)
    ax, ay = axes
    sa_d = jax.device_put(jnp.asarray(sa, jnp.bfloat16),
                          NamedSharding(mesh, P(None, ax, ay)))
    sb_d = jax.device_put(jnp.asarray(sb, jnp.bfloat16),
                          NamedSharding(mesh, P(None, ax, ay)))
    if config is None:
        config = default_config("bfloat16", out_dtype="float32")
    else:
        config = config.replace(dtype="bfloat16", out_dtype="float32")

    @jax.jit
    def run(sa_j, sb_j):
        hi = jnp.zeros((m, n), jnp.float32)
        lo = jnp.zeros((m, n), jnp.float32)
        for s in range(n_slices + 1):
            for i in range(s + 1):
                j = s - i
                if i >= n_slices or j >= n_slices:
                    continue
                p = summa_matmul(sa_j[i], sb_j[j], mesh, axes=axes,
                                 config=config)
                hi, err = _two_sum(hi, p)
                lo = lo + err
        return hi, lo

    hi, lo = run(sa_d, sb_d)
    return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)


@functools.partial(jax.jit, static_argnames=("config",))
def device_accumulate(a_slices, b_slices, *, config: GemmConfig):
    """Device-resident part of the scheme: all slice-pair GEMMs + the
    float-float accumulation.  Exposed so benchmarks can time compute
    without host split/transfer costs.

    Args:
      a_slices: (n_slices, M, K) bf16; b_slices: (n_slices, K, N) bf16.
    Returns (hi, lo) float32 with C ~= hi + lo.
    """
    from gemm_hls_tpu.ops.matmul import matmul

    n_slices, m, _ = a_slices.shape
    n = b_slices.shape[2]
    hi = jnp.zeros((m, n), jnp.float32)
    lo = jnp.zeros((m, n), jnp.float32)
    # Partials ordered by decreasing magnitude (i + j ascending) so the
    # float-float accumulator absorbs them stably; the triangular
    # truncation keeps diagonals up to i+j <= n_slices (one past the
    # slice count, trimming the truncation error by 2^-slice_bits).
    for s in range(n_slices + 1):
        for i in range(s + 1):
            j = s - i
            if i >= n_slices or j >= n_slices:
                continue
            p = matmul(a_slices[i], b_slices[j], config=config)
            hi, err = _two_sum(hi, p)
            lo = lo + err
    return hi, lo


def ozaki_matmul_int8_distributed(a: np.ndarray, b: np.ndarray, mesh, *,
                                  axes=("x", "y"),
                                  target_rel: float = 1e-14,
                                  n_slices: int = None) -> np.ndarray:
    """Distributed f64-class GEMM on the fused int8 kernel: each device
    all-gathers its slice-stack panels (gather-SUMMA schedule — A along
    the column axis, B along the row axis) and runs the whole slice
    triangle locally in one kernel, so the per-device arithmetic is
    identical to the single-chip path (~1e-15 normwise, K unbounded).

    Communication volume matches the CA bound for 2-D GEMM — each device
    moves ``n_slices`` int8 panels, the same bytes as one f64 panel.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gemm_hls_tpu.config import round_up
    from gemm_hls_tpu.ops.pallas_ozaki import fused_ozaki_int8

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    if n_slices is None:
        need_bits = min(53, int(-math.log2(target_rel)) + 6)
        n_slices = math.ceil(need_bits / INT8_SLICE_BITS)
    ax, ay = axes
    px, py = mesh.shape[ax], mesh.shape[ay]

    sa, ulp_a = split_f64_int8(a, n_slices, axis=1)
    sb, ulp_b = split_f64_int8(b, n_slices, axis=0)

    # Pad so each device's gathered panels are block-divisible.
    bm, bn, bk = 128, 512, 2048
    mp = round_up(m, px * min(bm, round_up(-(-m // px), 32)))
    np_ = round_up(n, py * min(bn, round_up(-(-n // py), 128)))
    kp = round_up(k, px * py * 256)
    bm = min(bm, mp // px)
    bn = min(bn, np_ // py)
    # kp is a multiple of px*py*256 (shard alignment) but not necessarily of
    # the preferred 2048 K block; halve bk until it divides kp (terminates at
    # 256, which always divides kp), keeping every candidate lane-aligned.
    bk = min(bk, kp)
    while kp % bk:
        bk //= 2
    sa_p = np.zeros((n_slices, mp, kp), np.int8)
    sa_p[:, :m, :k] = sa
    sb_p = np.zeros((n_slices, kp, np_), np.int8)
    sb_p[:, :k, :n] = sb
    sa_d = jax.device_put(jnp.asarray(sa_p),
                          NamedSharding(mesh, P(None, ax, ay)))
    sb_d = jax.device_put(jnp.asarray(sb_p),
                          NamedSharding(mesh, P(None, ax, ay)))

    def local(sa_l, sb_l):
        ga = jax.lax.all_gather(sa_l, ay, axis=2, tiled=True)  # (s, M/px, K)
        gb = jax.lax.all_gather(sb_l, ax, axis=1, tiled=True)  # (s, K, N/py)
        return fused_ozaki_int8(ga, gb, block_m=bm, block_n=bn, block_k=bk,
                                n_diags=n_slices)

    hi, lo = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, ax, ay), P(None, ax, ay)),
        out_specs=(P(ax, ay), P(ax, ay)),
        check_vma=False))(sa_d, sb_d)
    hi = np.asarray(hi[:m, :n], np.float64)
    lo = np.asarray(lo[:m, :n], np.float64)
    return (hi + lo) * ulp_a * ulp_b
