"""fp32-class GEMM on the int8 MXU path via integer slice decomposition.

The int8 systolic path runs ~1.8x faster than even the bf16 path on v5e
(342 vs 188 TOPS); this module trades that speed for fp32-class accuracy
the same way ``ops/ozaki.py`` builds f64 from bf16:

1. Each fp32 operand is quantized *on device* into 3 signed-int8 slices of
   7 magnitude bits on a shared per-row (A) / per-column (B) exponent grid:
   ``x ~= ulp_row * (s0 + s1/2^7 + s2/2^14)``.
2. The 6 slice-pair products with i+j <= 2 run on the int8 MXU with int32
   accumulation — **exact** for K up to 2^17 (products < 2^14).
3. Exact int32 partials are split into two f32-exact halves (high/low 12+
   bits) and combined with TwoSum float-float arithmetic, then rescaled by
   the row/column ulps.

Accuracy (``n_slices`` dial): 2 slices ~2^-14 normwise, 3 slices ~2^-21 —
between Mosaic's DEFAULT (~2^-11) and HIGHEST (~2^-24) fp32 contract
precisions at int8 speed — and 4 slices reach the f32 *output* rounding
floor (measured 3.9e-8 normwise; more slices change nothing), i.e.
strictly tighter than HIGHEST at ~0.95x its throughput.  Fully jittable
(no host round trip, unlike the f64 scheme).

Technique family: Ozaki-style error-free transformations on integer
matrix engines (public literature); original implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SLICE_BITS = 7


def _quantize_slices(x, axis: int, n_slices: int = 3, stacked: bool = True):
    """int8 slices + per-vector ulp (f32): stacked (N_SLICES, *x.shape)
    array, or a list of per-slice arrays with ``stacked=False`` (the list
    form feeds the fused kernel without materializing the concatenate —
    XLA lowers ``stack`` as pad+add, a full extra HBM round trip).

    Shared exponent along ``axis`` (the contraction axis), so every product
    in one output's dot shares the grid — the block-fixed-point property
    that makes int32 accumulation exact.
    """
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    safe = jnp.where(amax > 0, amax, 1.0)
    # ulp = 2^(e - SLICE_BITS) with 2^(e-1) <= max < 2^e.
    e = jnp.floor(jnp.log2(safe)) + 1.0
    ulp = jnp.exp2(e - SLICE_BITS).astype(jnp.float32)
    r = x.astype(jnp.float32)
    slices = []
    cur_ulp = ulp
    for _ in range(n_slices):
        q = jnp.clip(jnp.trunc(r / cur_ulp), -127, 127)
        slices.append(q.astype(jnp.int8))
        r = r - q * cur_ulp
        cur_ulp = cur_ulp * (2.0 ** -SLICE_BITS)
    return (jnp.stack(slices) if stacked else slices), ulp


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def fp32_matmul_int8(a, b, *, block_m: int = 512, block_n: int = 1024,
                     block_k: int = 8192, n_slices: int = 3,
                     fused: bool = None):
    """Public entry — differentiable: the gradient of the (approximated)
    bilinear map C = A.B is exactly dA = g.B^T, dB = A^T.g, computed with
    the same integer-slice scheme so training pays the same reduced cost.

    ``fused`` selects the execution strategy; the default (None -> True)
    runs the single-kernel slice triangle (``ops/pallas_ozaki.py``): for
    K within the whole-K int32 bound it uses per-diagonal int32
    accumulators with zero per-block float work (96.7 / 53.4 TF measured
    at i8x2 / i8x3 8192^3 on v5e — vs 95.4 / 51.3 staged), and beyond the
    bound it flushes exactly per K block (contraction length unbounded).
    ``False`` runs staged per-pair int8 GEMMs (each partial through HBM),
    kept for cross-validation; its whole-K int32 accumulation requires
    K <= 2^17."""
    if fused is None:
        fused = True
    return _i8_vjp(a, b, block_m, block_n, block_k, n_slices, fused)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _i8_vjp(a, b, block_m, block_n, block_k, n_slices, fused):
    return _fp32_matmul_int8_impl(a, b, block_m=block_m, block_n=block_n,
                                  block_k=block_k, n_slices=n_slices,
                                  fused=fused)


def _i8_fwd(a, b, block_m, block_n, block_k, n_slices, fused):
    return _i8_vjp(a, b, block_m, block_n, block_k, n_slices, fused), (a, b)


def _i8_bwd(block_m, block_n, block_k, n_slices, fused, res, g):
    a, b = res
    da = _i8_vjp(g, b.T, block_m, block_n, block_k, n_slices, fused)
    db = _i8_vjp(a.T, g, block_m, block_n, block_k, n_slices, fused)
    return da.astype(a.dtype), db.astype(b.dtype)


_i8_vjp.defvjp(_i8_fwd, _i8_bwd)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "n_slices", "fused"))
def _fp32_matmul_int8_impl(a, b, *, block_m: int = 512, block_n: int = 1024,
                           block_k: int = 8192, n_slices: int = 3,
                           fused: bool = True):
    """C = A . B for fp32 operands, computed on the int8 MXU path.

    Args:
      a: (M, K) float32; b: (K, N) float32.
      n_slices: accuracy/speed dial — 2 slices gives ~2^-14 normwise at
        ~int8/3 speed (both faster and more accurate than Mosaic's
        DEFAULT fp32 contract); 3 slices gives ~2^-21, approaching
        HIGHEST at ~int8/6 speed.
      fused: single-kernel slice triangle (K unbounded) vs staged
        per-pair GEMMs (K <= 2^17).
    Returns (M, N) float32.
    """
    from gemm_hls_tpu.config import GemmConfig
    from gemm_hls_tpu.ops.matmul import matmul

    m, k = a.shape
    n = b.shape[1]
    if not fused and k > (1 << 17):
        raise ValueError(f"K={k} exceeds the int32 exactness bound (2^17) "
                         "of the staged path; use fused=True")
    # List form: each slice stays an independent array so the quantize
    # fusion feeds the kernel directly (no materialized concatenate).
    sa, ulp_a = _quantize_slices(a, axis=1, n_slices=n_slices,
                                 stacked=False)  # ulp (m, 1)
    sb, ulp_b = _quantize_slices(b, axis=0, n_slices=n_slices,
                                 stacked=False)  # ulp (1, n)

    if fused:
        from gemm_hls_tpu.config import round_up
        from gemm_hls_tpu.ops.pallas_ozaki import (
            fused_int8_fp32, fused_ozaki_int8,
        )

        # Fast path: per-diagonal int32 accumulators across the whole K
        # — no per-block float flush at all (see _diag_kernel).
        # bk=2048 and 4096 measure equal on v5e under the fusion-fair
        # harness (104.0 vs 103.2 TF i8x2 at 8192^3; bk=8192 loses ~9%);
        # 2048 kept for its lower VMEM pressure at large n_slices.
        # The exactness gate uses the PADDED K the kernel will see (zero
        # padding contributes no products but the kernel re-validates on
        # its input shape).
        bk_fast = min(block_k, 2048, round_up(k, 256))
        kp_fast = round_up(k, bk_fast)
        whole_k_exact = n_slices * (127 ** 2) * kp_fast < (1 << 31)
        if whole_k_exact:
            bm = min(block_m, round_up(m, 32))
            bn = min(block_n, round_up(n, 128))
            bk = bk_fast
            mp, np_, kp = round_up(m, bm), round_up(n, bn), kp_fast
            if (mp, kp) != (m, k):
                sa = [jnp.pad(s, ((0, mp - m), (0, kp - k))) for s in sa]
            if (kp, np_) != (k, n):
                sb = [jnp.pad(s, ((0, kp - k), (0, np_ - n))) for s in sb]
            # Row/column ulp rescale fused into the kernel store (saves a
            # full HBM round trip of C); pad rows/cols are sliced away.
            ua = jnp.pad(ulp_a, ((0, mp - m), (0, 0))) if mp != m else ulp_a
            ub = jnp.pad(ulp_b, ((0, 0), (0, np_ - n))) if np_ != n else ulp_b
            out = fused_int8_fp32(tuple(sa), tuple(sb), ua, ub, block_m=bm,
                                  block_n=bn, block_k=bk, n_diags=n_slices)
            return out[:m, :n]

        # K beyond the whole-K int32 bound: hi/lo kernel with exact
        # per-K-block flushes (K unbounded).  (512, 512, 4096) is the
        # fastest config Mosaic will schedule with 3 slice stacks plus the
        # two f32 accumulators.
        bm = min(block_m, round_up(m, 32))
        bn = min(block_n, 512, round_up(n, 128))
        bk = min(block_k, 4096, round_up(k, 256))
        while n_slices * (127 ** 2) * bk >= (1 << 31):
            bk //= 2
        mp, np_, kp = round_up(m, bm), round_up(n, bn), round_up(k, bk)
        sa_p = jnp.pad(jnp.stack(sa), ((0, 0), (0, mp - m), (0, kp - k)))
        sb_p = jnp.pad(jnp.stack(sb), ((0, 0), (0, kp - k), (0, np_ - n)))
        # n_diags=n_slices matches the staged triangle (3 products for
        # i8x2, 6 for i8x3) so both paths sit on the same speed tier.
        hi, lo = fused_ozaki_int8(sa_p, sb_p, block_m=bm, block_n=bn,
                                  block_k=bk, n_diags=n_slices)
        return (hi[:m, :n] + lo[:m, :n]) * ulp_a * ulp_b

    cfg = GemmConfig(dtype="int8", out_dtype="int32", block_m=block_m,
                     block_n=block_n, block_k=min(block_k, max(128, k)))

    hi = jnp.zeros((m, n), jnp.float32)
    lo = jnp.zeros((m, n), jnp.float32)
    for s in range(n_slices):
        for i in range(s + 1):
            j = s - i
            p = matmul(sa[i], sb[j], config=cfg)       # exact int32
            w = jnp.float32(2.0 ** (-SLICE_BITS * (i + j)))
            # Exact f32 split of the int32 partial (each half < 2^20).
            p_hi = (p >> 12).astype(jnp.float32) * jnp.float32(4096.0) * w
            p_lo = (p - ((p >> 12) << 12)).astype(jnp.float32) * w
            hi, err = _two_sum(hi, p_hi)
            lo = lo + err
            hi, err = _two_sum(hi, p_lo)
            lo = lo + err
    return (hi + lo) * ulp_a * ulp_b
