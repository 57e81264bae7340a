"""VPU-path Pallas kernel for arbitrary (map, reduce) semirings.

The reference compiles *any* ``hlslib::op`` pair into the same PE datapath
by swapping the multiply/add functors (``kernel/Compute.cpp:129-137``,
``include/Config.h.in:34-35``) — on FPGA the "ALU" is synthesized per
operator.  On TPU the MXU is hard-wired to (+, x), so every non-arithmetic
semiring (min-plus distance product, max-min bottleneck paths, boolean
reachability, ...) runs on the 8x128 VPU instead.

Same communication-avoiding schedule as the MXU path: C tile stationary in a
VMEM accumulator initialized to the reduce identity (the analogue of the
``OperatorReduce::identity()`` cBuffer reset, ``kernel/Compute.cpp:63-79``),
K streamed innermost.  Within a K block the kernel walks sublane-aligned
chunks, materializes the (block_m, chunk, block_n) mapped outer product, and
folds it with a balanced reduction tree — the VPU analogue of the PE's
unrolled n2 x m2 map/reduce lanes (``kernel/Compute.cpp:108-142``).

Bounds handling for non-divisible K mirrors the reference's masking
(``kernel/Compute.cpp:112-137``): the final K block masks the padded tail to
the reduce identity, so callers may pad with arbitrary values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.semiring import Semiring


def fold_axis(x, op, axis: int):
    """Fold ``x`` along ``axis`` with a balanced tree of binary ``op`` calls.

    Generic-operator replacement for ``jnp.sum``-style axis reductions; works
    inside Pallas kernels (static shapes, no custom lax.reduce computations).
    """
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        folded = op(lo, hi)
        if n % 2:
            rem = jax.lax.slice_in_dim(x, 2 * half, n, axis=axis)
            folded = jnp.concatenate([folded, rem], axis=axis)
        x = folded
        n = x.shape[axis]
    return jnp.squeeze(x, axis=axis)


def _vpu_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k_grid, bk, ck, k_actual,
                sr, identity, acc_dtype, out_dtype):
    map_op, reduce_op = sr.map_op, sr.reduce_op
    pid_k = pl.program_id(2)

    @pl.when(pid_k == 0)
    def _init():
        acc_ref[:] = jnp.full_like(acc_ref, identity)

    n_chunks = bk // ck

    def chunk_body(mask_tail):
        def body(c, acc):
            if n_chunks == 1:
                # Whole-block chunk: static full reads — no lane-dim
                # dynamic slice, so ck need not be 128-aligned (Mosaic
                # cannot prove alignment of a dynamic lane index
                # otherwise; bit-packed or_and blocks hit ck < 128).
                a_c = a_ref[:, :].astype(acc_dtype)
                b_c = b_ref[:, :].astype(acc_dtype)
                mapped = map_op(a_c[:, :, None], b_c[None, :, :])
                if mask_tail:
                    k_global = (pid_k * bk + jax.lax.broadcasted_iota(
                        jnp.int32, (1, ck, 1), 1))
                    mapped = jnp.where(k_global < k_actual, mapped,
                                       jnp.asarray(identity, acc_dtype))
                return reduce_op(acc, sr.reduce_along(mapped, axis=1))
            # Lane-dim dynamic slices must be 128-aligned on TPU (Mosaic
            # constraint), hence ck = LANE and the multiple_of hint.
            off = pl.multiple_of(c * ck, ck)
            a_c = a_ref[:, pl.ds(off, ck)].astype(acc_dtype)      # (bm, ck)
            b_c = b_ref[pl.ds(off, ck), :].astype(acc_dtype)      # (ck, bn)
            mapped = map_op(a_c[:, :, None], b_c[None, :, :])     # (bm, ck, bn)
            if mask_tail:
                k_global = (pid_k * bk + c * ck
                            + jax.lax.broadcasted_iota(jnp.int32, (1, ck, 1), 1))
                mapped = jnp.where(k_global < k_actual, mapped,
                                   jnp.asarray(identity, acc_dtype))
            return reduce_op(acc, sr.reduce_along(mapped, axis=1))
        return body

    acc = acc_ref[:]
    if k_actual % bk == 0:
        acc = jax.lax.fori_loop(0, n_chunks, chunk_body(False), acc)
    else:
        # Only the final K block can contain padding (static check above);
        # branch so full blocks pay no masking cost.
        acc = jax.lax.cond(
            pid_k == n_k_grid - 1,
            lambda a: jax.lax.fori_loop(0, n_chunks, chunk_body(True), a),
            lambda a: jax.lax.fori_loop(0, n_chunks, chunk_body(False), a),
            acc,
        )
    acc_ref[:] = acc

    @pl.when(pid_k == n_k_grid - 1)
    def _store():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "sr", "k_actual",
                                              "interpret", "ck"))
def vpu_matmul(a, b, *, cfg: GemmConfig, sr: Semiring, k_actual: int,
               interpret=False, ck: int = None):
    """Padded/aligned generic-semiring matmul on the VPU.

    Args:
      a: (M, K) pre-padded; b: (K, N) pre-padded.
      k_actual: the true (unpadded) contraction length; indices >= k_actual
        are masked to the reduce identity.
    """
    m, k_dim = a.shape
    kb, n = b.shape
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if kb != k_dim or m % bm or n % bn or k_dim % bk:
        raise ValueError(
            f"vpu_matmul requires pre-padded operands: ({m},{n},{k_dim}) "
            f"vs blocks ({bm},{bn},{bk})"
        )
    acc_dtype = cfg.jacc_dtype
    out_dtype = cfg.jout_dtype
    # K-chunk: multiple of 128 (the lane width — Mosaic requires lane-dim
    # dynamic slices to be 128-aligned); whole-block for small
    # interpreter-mode configs.
    if ck is None:
        if bk % 128 or bm <= 16:
            # Whole-block chunk: the n_chunks==1 branch reads statically
            # (no fori_loop, no dynamic lane slices) — measured 5.51
            # TOp/s at (16, 2048, 2048) 4096^3 vs 4.97 for ck=1024 and
            # 4.63 for ck=512 (experiments/minplus_retune.py).
            ck = bk
        else:
            # Wider chunks amortize accumulator read-modify-writes over
            # more mapped work (measured on v5e: ck=1024 at 5.04 TOp/s vs
            # whole-block 4.57 at bm=32 — wide-bm blocks prefer bounded
            # chunks).  The nominal (bm, ck, bn) mapped intermediate does
            # NOT occupy VMEM: Mosaic fuses the broadcast-add into the
            # fold tree, proven by chunk bodies with 0.25-1 GiB nominal
            # intermediates compiling and running ALU-bound inside a
            # 128 MiB VMEM window (experiments/vpu_ceiling2.py,
            # artifacts/vpu_ceiling_v5e.csv), so no VMEM-feasibility cap
            # applies — only the real blocks count (config.validate).
            ck = 128
            for cand in (1024, 512, 256):
                if bk % cand == 0:
                    ck = cand
                    break
    if bk % ck:
        raise ValueError(f"block_k={bk} must be a multiple of chunk ck={ck}")

    grid = (m // bm, n // bn, k_dim // bk)
    kernel = functools.partial(
        _vpu_kernel,
        n_k_grid=grid[2], bk=bk, ck=ck, k_actual=k_actual,
        sr=sr, identity=sr.identity_for(acc_dtype),
        acc_dtype=acc_dtype, out_dtype=out_dtype,
    )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=cfg.io_volume_bytes(m, n, k_dim),
            transcendentals=0,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        interpret=interpret,
        name=f"ca_gemm_vpu_{sr.name}_{bm}x{bn}x{bk}",
        **kwargs,
    )(a, b)
