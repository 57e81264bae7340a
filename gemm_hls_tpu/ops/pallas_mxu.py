"""MXU-path Pallas GEMM kernel — the systolic-array core.

TPU-native re-design of the reference's linear systolic PE array
(``kernel/Compute.cpp:11-231``) and its streaming memory subsystem
(``kernel/Memory.cpp``):

* The chain of ``MM_PARALLELISM_N`` processing elements computing
  outer-product updates becomes the 128x128 MXU, driven by
  ``jax.lax.dot_general`` on VMEM-resident blocks.
* The PE's ``cBuffer`` partial-tile fast memory (``Compute.cpp:26``) becomes
  a float32 VMEM accumulator scratch that stays stationary while K streams.
* The seven concurrently-running dataflow stream stages (``kernel/Top.cpp:24``)
  and the PE's A double-buffer (``Compute.cpp:19-26``) become the Mosaic
  pipeline: BlockSpec-described HBM->VMEM transfers are automatically
  multi-buffered and overlapped with MXU work across grid steps.
* The communication-avoiding schedule is identical: C tiles are stationary
  in fast memory, K is streamed innermost, and HBM traffic is
  ``M*N*(1 + K/block_n + K/block_m)`` words
  (``src/PrintSpecifications.cpp:72-75``).

Operand transposes are handled by BlockSpec index maps + dot_general
dimension numbers (no materialized transpose) — the analogue of the
reference's ``MM_TRANSPOSED_A`` pre-transposed read path
(``kernel/Memory.cpp:205-261``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gemm_hls_tpu.config import GemmConfig

# Mosaic supports only DEFAULT and HIGHEST contract precisions, and HIGHEST
# is undefined for sub-fp32 inputs (the bf16 MXU pass is already exact for
# bf16 operands with an fp32 accumulator).
_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _resolve_precision(cfg: GemmConfig):
    d = jnp.dtype(cfg.dtype)
    if not jnp.issubdtype(d, jnp.floating) or d.itemsize < 4:
        return jax.lax.Precision.DEFAULT
    return _PRECISION[cfg.precision]


def _mask_k_tail(ref, axis, limit):
    """Zero the K-tail of an operand block beyond ``limit``.

    The analogue of the reference's dynamic-size bounds masking
    (``kernel/Compute.cpp:112-137``): with a ceil-div grid the final K
    block reads past the logical array edge, and Mosaic leaves those VMEM
    lanes unspecified (possibly stale NaN/Inf bit patterns), so *both*
    operands are masked — 0 * garbage would still poison the accumulator
    if the garbage is NaN.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, ref.shape, axis)
    return jnp.where(idx < limit, ref[:], jnp.zeros((), ref.dtype))


def _kernel(a_ref, b_ref, *refs, n_k_grid, dims, precision,
            out_dtype, k_rem=0, epilogue=None, debug=False):
    """One (block_m x block_n) C tile, one K-chunk per invocation.

    Grid is (m, n, k) with k innermost ("arbitrary"); the accumulator
    carries across the k steps — the analogue of the PE's n0/m0/k loop nest
    holding cBuffer stationary (``kernel/Compute.cpp:53-149``).

    M/N edge tiles need no explicit masking: Mosaic bounds-checks the
    output store, and garbage rows/columns of the accumulator fall outside
    the stored region.  The K edge is masked via ``k_rem`` (elements of the
    final K block beyond the logical K extent are zeroed before the dot).

    ``refs`` = (*epilogue_operand_refs, o_ref, acc_ref): an optional fused
    epilogue (bias add, activation, scaling) is applied to the accumulator
    before the store — saving one full HBM round trip of C versus a
    separate elementwise pass (the fused analogue of the reference's
    writeback conversion stage, ``kernel/Memory.cpp:323-359``).
    """
    *ep_refs, o_ref, acc_ref = refs
    (a_contract,), (b_contract,) = dims

    def operands():
        if not k_rem:
            return a_ref[:], b_ref[:]
        if n_k_grid == 1:
            limit = k_rem
        else:
            is_last = pl.program_id(2) == n_k_grid - 1
            bk = a_ref.shape[a_contract]
            limit = jnp.where(is_last, k_rem, bk)
        return (_mask_k_tail(a_ref, a_contract, limit),
                _mask_k_tail(b_ref, b_contract, limit))

    def emit(acc):
        if epilogue is not None:
            acc = epilogue(acc, *(r[:] for r in ep_refs))
        o_ref[:] = acc.astype(out_dtype)
        if debug:
            # Per-tile progress (reference kernel/Memory.cpp:384-389);
            # payload kept free of program_id so it lowers in both compiled
            # and interpreter modes.
            pl.debug_print(
                "ca_gemm_mxu: output tile written (k_steps={})",
                jnp.full((), n_k_grid, jnp.int32))

    if n_k_grid == 1:
        # Whole K in one block: the accumulator carries nothing across
        # steps, so skip the VMEM scratch round trip and store straight
        # from the MXU result (measured worth ~0.5% at 8192^3).
        a_v, b_v = operands()
        emit(jax.lax.dot_general(
            a_v, b_v, dimension_numbers=(dims, ((), ())),
            preferred_element_type=acc_ref.dtype, precision=precision))
        return

    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a_v, b_v = operands()
    acc_ref[:] += jax.lax.dot_general(
        a_v,
        b_v,
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=acc_ref.dtype,
        precision=precision,
    )

    @pl.when(pl.program_id(2) == n_k_grid - 1)
    def _store():
        emit(acc_ref[:])


def _batched_kernel(a_ref, b_ref, *refs, dims, precision, out_dtype,
                    acc_dtype, epilogue=None):
    """One grid step = a whole batch-block of examples: a single batched
    ``dot_general`` over the (batch_block, m, k) x (batch_block, k, n)
    VMEM blocks.  Amortizes the per-grid-step scheduling latch (~220 ns on
    v5e) over the whole block — a vmapped 2-D kernel pays it per example,
    which dominates at small per-example sizes (measured 13 TF for
    256x(128^3) via vmap vs the latch-amortized batched grid).

    ``refs`` = (*epilogue_operand_refs, o_ref): like the 2-D kernel, an
    optional fused epilogue transforms the accumulator before the store.
    Mosaic's compiler aborts on a smaller-than-output operand block (the
    (1, n) bias) coexisting with a *batched* dot_general in one kernel
    (verified on v5e: ``Check failed: limits[i] <= dim(i)``), so the
    epilogue variant runs an in-kernel loop of per-example 2-D dots
    instead — still one grid step per batch-block (the scheduling latch
    is per grid step, not per dot), and the epilogue sees exactly the 2-D
    kernel's contract: an (m, n) accumulator and (1, n) operand blocks.
    Since N is un-gridded here, even row-wise epilogues (softmax over
    attention scores) are expressible.  This closes the thin-K
    attention-scores gap: XLA wins that shape by fusing the consumer into
    the dot; the fused epilogue recovers the elided C round trip."""
    *ep_refs, o_ref = refs
    (ac, bc) = dims
    if epilogue is None:
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:],
            dimension_numbers=(((ac,), (bc,)), ((0,), (0,))),
            preferred_element_type=acc_dtype,
            precision=precision,
        ).astype(out_dtype)
        return

    ep_vals = tuple(r[:] for r in ep_refs)

    def body(i, carry):
        acc = jax.lax.dot_general(
            a_ref[i], b_ref[i],
            dimension_numbers=(((ac - 1,), (bc - 1,)), ((), ())),
            preferred_element_type=acc_dtype,
            precision=precision,
        )
        o_ref[i] = epilogue(acc, *ep_vals).astype(out_dtype)
        return carry

    jax.lax.fori_loop(0, a_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "transpose_a",
                                             "transpose_b", "interpret",
                                             "batch_block", "epilogue"))
def mxu_matmul_batched(a, b, *ep_operands, cfg: GemmConfig,
                       transpose_a=False, transpose_b=False,
                       interpret=False, batch_block=None, epilogue=None):
    """Batched plus-times matmul: (B, M, K) x (B, K, N) -> (B, M, N).

    For per-example problems small enough that each (M, K)/(K, N) operand
    fits one VMEM block whole (K un-gridded): the grid is 1-D over
    batch-blocks and each step issues one batched MXU contraction over
    ``batch_block`` examples.  ``ops/matmul.py`` routes small uniform 3-D
    problems here and falls back to the vmapped 2-D kernel otherwise.

    With ``transpose_a`` each example of ``a`` is (K, M); with
    ``transpose_b`` each example of ``b`` is (N, K) — handled by dot
    dimension numbers, no materialized transpose.

    ``ep_operands`` are (1, N) arrays fed to the optional fused
    ``epilogue`` (same contract as :func:`mxu_matmul`), applied per
    example to the (row_block, n) accumulator before the store.  The
    epilogue path grids over (batch-blocks, row-tiles): rows stay whole
    in N (row-wise epilogues like softmax are legal) while the row
    tiling keeps blocks small enough for Mosaic to pipeline the output
    writes — at 32x1024^2x128 bf16 (attention scores) the whole-example
    variant measures 64-82 TF while (bb=1, bm=256) reaches ~88 TF,
    within 3% of XLA's softmax-fused dot at the same consumer-matched
    measurement.
    """
    bsz = a.shape[0]
    if transpose_a:
        k_dim, m = a.shape[1:]
        a_contract = 1
    else:
        m, k_dim = a.shape[1:]
        a_contract = 2
    if transpose_b:
        n, kb = b.shape[1:]
        b_contract = 2
    else:
        kb, n = b.shape[1:]
        b_contract = 1
    if kb != k_dim or b.shape[0] != bsz:
        raise ValueError(f"batched shape mismatch: {a.shape} x {b.shape}")
    for ep in ep_operands:
        if ep.shape != (1, n):
            raise ValueError(
                f"epilogue operands must be shaped (1, N)=(1,{n}), "
                f"got {ep.shape}")

    # Whole examples per block; batch-block sized to a fixed per-step DMA
    # quantum (~8 MB of operands+output), NOT to fill VMEM: small steps
    # leave room for Mosaic's multi-buffering and pipeline DMA against
    # the MXU (a VMEM-filling bb=22 at 64x512^3 runs 104 TF vs ~175 for
    # small blocks).  The quantum is only a default: measured per-bucket
    # winners from `tools.autotune.autotune_batched` (RTT-robust
    # protocol, >=1.5 TFLOP integrated per reading) arrive via the
    # `batch_block` argument — at 64x512^3 the tuned bb=2 sustains
    # 175-177 TF vs the quantum bb=5's 164.  A secondary VMEM cap
    # guards big examples.
    # Per-example bytes from the *actual* operand dtypes, not cfg.dtype:
    # the backward pass feeds an f32 cotangent against a bf16 saved
    # operand, and sizing from cfg.dtype alone would undercount by 2x and
    # overshoot the VMEM budget near the routing threshold.
    a_b = jnp.dtype(a.dtype).itemsize
    b_b = jnp.dtype(b.dtype).itemsize
    out_b = jnp.dtype(cfg.jout_dtype).itemsize
    # Row tile (epilogue path only): big examples run (bb=1, bm=256) so
    # the dominant output write pipelines across many grid steps; small
    # examples keep whole rows and amortize the grid latch via bb.
    if epilogue is not None and m >= 512:
        bm, bb_default = 256, 1
    else:
        bm, bb_default = m, None
    bytes_ex = bm * k_dim * a_b + k_dim * n * b_b + bm * n * out_b
    if batch_block is not None:
        bb = max(1, min(bsz, batch_block))
    elif bb_default is not None:
        bb = bb_default
    else:
        bb_quantum = max(1, round(8 * 1024 * 1024 / max(bytes_ex, 1)))
        bb_vmem = max(1, int(cfg.vmem_limit_bytes // (3 * max(bytes_ex, 1))))
        bb = min(bsz, bb_quantum, bb_vmem)

    kernel = functools.partial(
        _batched_kernel,
        dims=(a_contract, b_contract),
        precision=_resolve_precision(cfg),
        out_dtype=cfg.jout_dtype,
        acc_dtype=cfg.jacc_dtype,
        epilogue=epilogue,
    )
    kwargs = {}
    if not interpret:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * bsz * m * n * k_dim,
            bytes_accessed=a.size * a_b + b.size * b_b + bsz * m * n * out_b,
            transcendentals=0,
        )

    if epilogue is None:
        grid = (pl.cdiv(bsz, bb),)
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=cfg.vmem_limit_bytes,
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bb,) + a.shape[1:], lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb,) + b.shape[1:], lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bb, m, n), lambda p: (p, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, m, n), cfg.jout_dtype),
            interpret=interpret,
            name=f"ca_gemm_mxu_batched_{bb}x{m}x{n}x{k_dim}",
            **kwargs,
        )(a, b)

    # Epilogue path: grid (batch-blocks, row-tiles); the in-kernel fori
    # issues per-example 2-D dots (see _batched_kernel docstring for why
    # the batched dot can't coexist with small ep operand blocks).
    grid = (pl.cdiv(bsz, bb), pl.cdiv(m, bm))
    if transpose_a:
        a_block, a_index = (bb, k_dim, bm), (lambda p, r: (p, 0, r))
    else:
        a_block, a_index = (bb, bm, k_dim), (lambda p, r: (p, r, 0))
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(a_block, a_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((bb,) + b.shape[1:], lambda p, r: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, n), lambda p, r: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in ep_operands
        ],
        out_specs=pl.BlockSpec((bb, bm, n), lambda p, r: (p, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, m, n), cfg.jout_dtype),
        interpret=interpret,
        name=f"ca_gemm_mxu_batched_ep_{bb}x{bm}x{n}x{k_dim}",
        **kwargs,
    )(a, b, *ep_operands)


@functools.partial(
    jax.jit, static_argnames=("cfg", "transpose_a", "transpose_b",
                              "interpret", "epilogue")
)
def mxu_matmul(a, b, *ep_operands, cfg: GemmConfig, transpose_a=False,
               transpose_b=False, interpret=False, epilogue=None):
    """Padded/aligned plus-times matmul on the MXU.

    Args:
      a: (M, K) — or (K, M) when ``transpose_a`` (contraction over dim 0).
      b: (K, N) — or (N, K) when ``transpose_b`` (contraction over dim 1).
      ep_operands: per-output-column (1, N) arrays fed to ``epilogue``.
      epilogue: optional fused output transform applied to the fp32
        accumulator before the store: ``epilogue(acc, *ep_blocks)`` with
        ``acc`` (block_m, block_n) and each ep block (1, block_n).

    Shapes need *not* be block-aligned: the grid is ceil-divided, Mosaic
    bounds-masks the M/N edge stores, and the kernel zeroes the K-tail of
    the final K block in-register (reference dynamic-size masking,
    ``kernel/Compute.cpp:112-137``) — no host-side pad or slice copies.

    Returns (M, N) in ``cfg.out_dtype``.
    """
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    if transpose_a:
        k_dim, m = a.shape
        a_block, a_index = (bk, bm), (lambda i, j, k: (k, i))
        a_contract = 0
    else:
        m, k_dim = a.shape
        a_block, a_index = (bm, bk), (lambda i, j, k: (i, k))
        a_contract = 1
    if transpose_b:
        n, kb = b.shape
        b_block, b_index = (bn, bk), (lambda i, j, k: (j, k))
        b_contract = 1
    else:
        kb, n = b.shape
        b_block, b_index = (bk, bn), (lambda i, j, k: (k, j))
        b_contract = 0
    if kb != k_dim:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")

    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k_dim, bk))
    two_d = grid[2] == 1
    if two_d:
        # Whole K in one block: drop the K grid dimension entirely — the
        # kernel runs its scratch-free single-dot branch and Mosaic sees a
        # pure 2-D output-tile sweep.
        a_map3, b_map3 = a_index, b_index
        a_index = lambda i, j, f=a_map3: f(i, j, 0)  # noqa: E731
        b_index = lambda i, j, f=b_map3: f(i, j, 0)  # noqa: E731
    out_dtype = cfg.jout_dtype
    acc_dtype = cfg.jacc_dtype

    for ep in ep_operands:
        if ep.shape != (1, n):
            raise ValueError(
                f"epilogue operands must be shaped (1, N)=(1,{n}), "
                f"got {ep.shape}")

    kernel = functools.partial(
        _kernel,
        n_k_grid=grid[2],
        dims=((a_contract,), (b_contract,)),
        precision=_resolve_precision(cfg),
        out_dtype=out_dtype,
        k_rem=k_dim % bk,
        epilogue=epilogue,
        debug=cfg.debug,
    )

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=(("parallel", "parallel") if two_d else
                                 ("parallel", "parallel", "arbitrary")),
            vmem_limit_bytes=cfg.vmem_limit_bytes,
        )
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_dim,
            bytes_accessed=cfg.hbm_traffic_bytes(m, n, k_dim),
            transcendentals=0,
        )

    if two_d:
        ep_index = lambda i, j: (0, j)        # noqa: E731
        out_index = lambda i, j: (i, j)       # noqa: E731
    else:
        ep_index = lambda i, j, k: (0, j)     # noqa: E731
        out_index = lambda i, j, k: (i, j)    # noqa: E731

    return pl.pallas_call(
        kernel,
        grid=grid[:2] if two_d else grid,
        in_specs=[
            pl.BlockSpec(a_block, a_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(b_block, b_index, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, bn), ep_index, memory_space=pltpu.VMEM)
            for _ in ep_operands
        ],
        out_specs=pl.BlockSpec((bm, bn), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        interpret=interpret,
        name=f"ca_gemm_mxu_{bm}x{bn}x{bk}",
        **kwargs,
    )(a, b, *ep_operands)
