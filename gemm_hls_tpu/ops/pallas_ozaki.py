"""Fused Ozaki-int8 kernel: f64-class GEMM with the whole slice-triangle
accumulated in VMEM.

The staged implementation (``ozaki.py``) runs each slice-pair GEMM as its
own kernel and combines partials through HBM — the float-float combine
dominates (~6x the MXU time).  This kernel keeps everything on-chip: per
output tile, all ~36 int8 slice-pair dots execute back-to-back on the MXU,
diagonal partials accumulate exactly in int32 registers within each K
block (bounded by 8 * 2^14 * block_k < 2^31), and each K block flushes
into resident float32 (hi, lo) TwoSum accumulators — zero intermediate HBM
traffic, the same stationary-C communication-avoiding schedule as the main
kernel.

Outputs the (hi, lo) pair; the caller combines in float64 and applies the
row/column ulps (see ``ozaki.ozaki_matmul_int8`` with ``fused=True``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.ops.int8_slices import SLICE_BITS


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _oz_kernel(sa_ref, sb_ref, hi_ref, lo_ref, acc_hi, acc_lo, *,
               n_slices, n_diags, n_k_grid):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_hi[:] = jnp.zeros_like(acc_hi)
        acc_lo[:] = jnp.zeros_like(acc_lo)

    hi = acc_hi[:]
    lo = acc_lo[:]
    for d in range(n_diags):
        # Diagonal d: exact int32 sum of its slice-pair products (each
        # element bounded by 127^2 * block_k * n_pairs < 2^31).
        p_d = None
        for i in range(d + 1):
            j = d - i
            if i >= n_slices or j >= n_slices:
                continue
            p = jax.lax.dot_general(
                sa_ref[i], sb_ref[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            p_d = p if p_d is None else p_d + p
        if p_d is None:
            continue
        w = jnp.float32(2.0 ** (-SLICE_BITS * d))
        # Exact f32 split of the int32 diagonal (halves < 2^20 each).
        p_hi = (p_d >> 12).astype(jnp.float32) * jnp.float32(4096.0) * w
        p_lo = (p_d - ((p_d >> 12) << 12)).astype(jnp.float32) * w
        hi, err = _two_sum(hi, p_hi)
        lo = lo + err
        hi, err = _two_sum(hi, p_lo)
        lo = lo + err
    acc_hi[:] = hi
    acc_lo[:] = lo

    @pl.when(pl.program_id(2) == n_k_grid - 1)
    def _store():
        hi_ref[:] = acc_hi[:]
        lo_ref[:] = acc_lo[:]


def _diag_kernel(*refs, n_slices, n_diags, n_k_grid, scaled, split):
    """fp32-class variant: one int32 accumulator per slice diagonal, carried
    exactly across ALL K steps (no per-block float flush), combined into a
    single float32 output at the last step.

    ``refs`` = *operand_refs, (ua_ref, ub_ref,) o_ref, *acc_refs.
    With ``split``, operand_refs are 2*n_slices separate (block) refs —
    one per slice — which lets the host-side quantize feed the kernel
    directly (a stacked (n, M, K) operand forces XLA to materialize a
    pad+add concatenate, an extra full HBM round trip of the slices).
    Without it, operand_refs are the two stacked (n_slices, ...) refs.
    With ``scaled``, the per-row / per-column ulps ((block_m, 1) and
    (1, block_n) blocks) are applied in the store, saving the HBM round
    trip of C that a separate rescale pass would cost (the fused analogue
    of the writeback conversion stage, ``kernel/Memory.cpp:323-359``).

    Exactness: diagonal d accumulates pairs(d) <= n_slices products of
    7-bit slices over the full contraction, bounded by
    ``n_slices * 127^2 * K < 2^31`` (the wrapper enforces it).  The only
    rounding in the whole scheme is the final int32->f32 convert + weighted
    sum (~2^-24), below the 2^-21 truncation floor of the 3-slice split —
    and it removes the per-K-block TwoSum cascade that cost the hi/lo
    kernel ~18% of the int8 engine.
    """
    if split:
        sa_refs = refs[:n_slices]
        sb_refs = refs[n_slices:2 * n_slices]
        refs = refs[2 * n_slices:]
        sa_ref = lambda i: sa_refs[i][:]          # noqa: E731
        sb_ref = lambda j: sb_refs[j][:]          # noqa: E731
    else:
        sa_stack, sb_stack = refs[0], refs[1]
        refs = refs[2:]
        sa_ref = lambda i: sa_stack[i]            # noqa: E731
        sb_ref = lambda j: sb_stack[j]            # noqa: E731
    if scaled:
        ua_ref, ub_ref, o_ref, *acc_refs = refs
    else:
        o_ref, *acc_refs = refs

    @pl.when(pl.program_id(2) == 0)
    def _init():
        for acc in acc_refs:
            acc[:] = jnp.zeros_like(acc)

    for d in range(n_diags):
        p_d = None
        for i in range(d + 1):
            j = d - i
            if i >= n_slices or j >= n_slices:
                continue
            p = jax.lax.dot_general(
                sa_ref(i), sb_ref(j), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            p_d = p if p_d is None else p_d + p
        if p_d is not None:
            acc_refs[d][:] += p_d

    @pl.when(pl.program_id(2) == n_k_grid - 1)
    def _store():
        out = acc_refs[0][:].astype(jnp.float32)
        for d in range(1, n_diags):
            w = jnp.float32(2.0 ** (-SLICE_BITS * d))
            out += acc_refs[d][:].astype(jnp.float32) * w
        if scaled:
            out = out * ua_ref[:] * ub_ref[:]
        o_ref[:] = out


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "n_diags", "interpret"))
def fused_int8_fp32(sa, sb, ulp_a=None, ulp_b=None, *, block_m: int = 512,
                    block_n: int = 1024, block_k: int = 4096,
                    n_diags: int = None, interpret: bool = None):
    """fp32-class slice-triangle GEMM: (n, M, K) int8 x (n, K, N) int8 ->
    (M, N) float32.  ``sa``/``sb`` may each be a stacked array or a
    tuple of n per-slice (M, K) / (K, N) arrays — the tuple form feeds
    the kernel directly from the quantize fusion (a stacked operand
    forces XLA to materialize the concatenate: one extra full HBM round
    trip of the slices, ~6% at 8192^3).  With ``ulp_a`` (M, 1) /
    ``ulp_b`` (1, N) given (both or neither), the row/column ulp rescale
    is fused into the store — otherwise the result is unscaled and the
    caller rescales.

    The fast path for ``fp32_matmul_int8``: per-diagonal int32 accumulators
    across the whole K (exact), one f32 combine at the end.  Requires
    ``n_slices * 127^2 * K < 2^31`` — K <= 44380 for 3 slices, 66576 for 2;
    beyond that, use :func:`fused_ozaki_int8` (per-block flush, K unbounded).
    """
    split = isinstance(sa, (tuple, list))
    if split != isinstance(sb, (tuple, list)):
        raise ValueError("sa and sb must both be stacked or both be tuples")
    if split:
        n_slices, (m, k) = len(sa), sa[0].shape
        n = sb[0].shape[1]
        if any(s.shape != (m, k) for s in sa) or any(
                s.shape != (k, n) for s in sb):
            raise ValueError("per-slice operand shapes disagree")
    else:
        n_slices, m, k = sa.shape
        n = sb.shape[2]
    if n_diags is None:
        n_diags = n_slices
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scaled = ulp_a is not None
    if scaled != (ulp_b is not None):
        raise ValueError("pass both ulp_a and ulp_b, or neither")
    if scaled and (ulp_a.shape != (m, 1) or ulp_b.shape != (1, n)):
        raise ValueError(f"ulp shapes must be ({m},1) and (1,{n}), got "
                         f"{ulp_a.shape} and {ulp_b.shape}")
    if m % block_m or n % block_n or k % block_k:
        raise ValueError(f"({m},{n},{k}) not divisible by blocks "
                         f"({block_m},{block_n},{block_k})")
    if n_slices * (127 ** 2) * k >= (1 << 31):
        raise ValueError(
            f"K={k} exceeds the whole-K int32 exactness bound for "
            f"{n_slices} slices; use fused_ozaki_int8 instead")
    grid = (m // block_m, n // block_n, k // block_k)
    kernel = functools.partial(_diag_kernel, n_slices=n_slices,
                               n_diags=n_diags, n_k_grid=grid[2],
                               scaled=scaled, split=split)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

    if split:
        in_specs = [
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM)
            for _ in range(n_slices)
        ] + [
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM)
            for _ in range(n_slices)
        ]
        operands = [*sa, *sb]
    else:
        in_specs = [
            pl.BlockSpec((n_slices, block_m, block_k),
                         lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_slices, block_k, block_n),
                         lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
        ]
        operands = [sa, sb]
    if scaled:
        in_specs += [
            pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        operands += [ulp_a, ulp_b]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)
                        for _ in range(n_diags)],
        interpret=interpret,
        name=f"int8_fp32_diag_{n_slices}x",
        **kwargs,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "n_diags", "interpret"))
def fused_ozaki_int8(sa, sb, *, block_m: int = 128, block_n: int = 512,
                     block_k: int = 2048, n_diags: int = None,
                     interpret: bool = None):
    """All-slices GEMM: (n, M, K) int8 x (n, K, N) int8 -> (hi, lo) f32.

    Shapes must be block-aligned multiples (the ``ozaki`` wrapper pads).
    ``n_diags`` truncates the slice triangle: diagonals d = i + j with
    d < n_diags are computed (default ``n_slices + 1`` — everything whose
    leading term exceeds the product of the two last slices).
    """
    n_slices, m, k = sa.shape
    n = sb.shape[2]
    if n_diags is None:
        n_diags = n_slices + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if m % block_m or n % block_n or k % block_k:
        raise ValueError(f"({m},{n},{k}) not divisible by blocks "
                         f"({block_m},{block_n},{block_k})")
    # Per-K-block int32 exactness: n_pairs-per-diagonal * 127^2 * block_k.
    if n_slices * (127 ** 2) * block_k >= (1 << 31):
        raise ValueError(f"block_k={block_k} too large for exact int32 "
                         f"diagonal accumulation with {n_slices} slices")
    grid = (m // block_m, n // block_n, k // block_k)
    kernel = functools.partial(_oz_kernel, n_slices=n_slices,
                               n_diags=n_diags, n_k_grid=grid[2])

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_slices, block_m, block_k),
                         lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_slices, block_k, block_n),
                         lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((m, n), jnp.float32),
                   jax.ShapeDtypeStruct((m, n), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32),
                        pltpu.VMEM((block_m, block_n), jnp.float32)],
        interpret=interpret,
        name=f"ozaki_int8_fused_{n_slices}x",
        **kwargs,
    )(sa, sb)
