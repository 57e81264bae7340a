"""Public matmul API: dispatch, padding/masking policy, and autodiff.

This is the framework's top-level compute entry point — the analogue of the
reference's single ``extern "C"`` kernel entry
``MatrixMultiplicationKernel(a, b, c[, n, k, m])``
(``include/MatrixMultiplication.h:155-171``, ``kernel/Top.cpp:7-18``),
generalized the JAX way: a pure, jittable, differentiable function.

Dispatch:

* ``plus_times`` semiring + Pallas backend  -> MXU kernel (``pallas_mxu``).
* any other semiring + Pallas backend       -> VPU kernel (``pallas_vpu``).
* ``backend="xla"``                          -> lax.dot_general (plus_times)
  or a blocked map/reduce sweep (generic semirings) — the device-side
  "Naive" oracle, analogue of ``include/Utility.h:18-42``.
* float64 on real TPU                        -> XLA backend (Mosaic has no
  f64; XLA emulates it — the reference's double-precision configuration).

Shape policy (reference ``MM_DYNAMIC_SIZES`` masking,
``kernel/Compute.cpp:112-137``): with ``pad_policy="pad"`` unaligned
shapes run unmodified — the MXU kernel ceil-divides its grid, zeroes the
K-tail of both operand blocks in-register, and relies on Mosaic's
bounds-masked M/N edge stores (no host-side pad or slice copies); the VPU
path masks the K tail to the reduce identity in-kernel and pads M/N (its
edge tiles carry semiring identities, not garbage).  ``pad_policy="strict"``
rejects unaligned shapes like the reference's static-size build.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.config import (
    GemmConfig, LANE, cdiv, default_config, round_up, sublane,
)
from gemm_hls_tpu.ops.semiring import Semiring, get_semiring
from gemm_hls_tpu.ops import pallas_mxu, pallas_vpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _resolve_interpret(cfg: GemmConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    return not _on_tpu()


def _pad2(x, r0: int, r1: int):
    if r0 == x.shape[0] and r1 == x.shape[1]:
        return x
    return jnp.pad(x, ((0, r0 - x.shape[0]), (0, r1 - x.shape[1])))


# ---------------------------------------------------------------------------
# MXU path with custom VJP (dA = g . op(B)^T, dB = op(A)^T . g, expressed as
# further CA-GEMM calls with flipped transpose flags — no materialized
# transposes).
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mxu_padded(a, b, cfg: GemmConfig):
    return _mxu_padded_fwd_impl(a, b, cfg)


def _mxu_padded_fwd_impl(a, b, cfg: GemmConfig):
    # No host-side pad/slice copies: the kernel ceil-divides the grid and
    # masks the K tail in-register; Mosaic bounds-masks M/N edge stores.
    # (Padding 8000^3 up to 8192^3 used to cost ~7% extra FLOPs plus
    # ~500 MB of pad+slice HBM traffic — ~18% end to end.)
    return pallas_mxu.mxu_matmul(
        a, b, cfg=cfg, transpose_a=cfg.transpose_a,
        transpose_b=cfg.transpose_b, interpret=_resolve_interpret(cfg)
    )


def _mxu_fwd(a, b, cfg):
    return _mxu_padded(a, b, cfg), (a, b)


def _mxu_bwd(cfg, res, g):
    a, b = res
    ta, tb = cfg.transpose_a, cfg.transpose_b
    g = g.astype(cfg.jacc_dtype)

    def run(x, y, tx, ty, out_shape, out_dtype):
        c = cfg.replace(transpose_a=tx, transpose_b=ty,
                        out_dtype=str(np.dtype(out_dtype)))
        if tx:
            # Transposed A puts block_m on the lane dim (must be %128).
            c = c.replace(block_m=round_up(c.block_m, LANE))
        return _mxu_padded(x, y, c)

    # See derivation in docstring of this module: with op_t the optional
    # transpose, C = op(A).op(B); physical grads follow by flag algebra.
    if not ta:
        da = run(g, b, False, not tb, a.shape, a.dtype)      # g . op(B)^T
    else:
        da = run(b, g, tb, True, a.shape, a.dtype)           # op(B) . g^T
    if not tb:
        db = run(a, g, not ta, False, b.shape, b.dtype)      # op(A)^T . g
    else:
        db = run(g, a, True, ta, b.shape, b.dtype)           # g^T . op(A)
    return da.astype(a.dtype), db.astype(b.dtype)


_mxu_padded.defvjp(_mxu_fwd, _mxu_bwd)


# ---------------------------------------------------------------------------
# Batched (3-D) MXU path: one batched kernel when per-example operands fit
# whole VMEM blocks — amortizes the per-grid-step latch that makes a vmapped
# 2-D kernel latch-bound at small per-example sizes.  Same VJP flag algebra
# as the 2-D path.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mxu_batched(a, b, cfg: GemmConfig):
    # Measured batch_block for this (chip, dtype, semiring, BxMxNxK
    # bucket), if one is cached (user cache or the packaged seed) — the
    # 3-D analogue of the 2-D cached_config lookup.  None -> the kernel's
    # DMA-quantum heuristic.  Mixed-dtype calls (the backward's f32
    # cotangent against a bf16 operand) miss the cache by design and take
    # the heuristic, which already sizes from actual operand dtypes.
    from gemm_hls_tpu.tools.autotune import cached_batch_block

    ta, tb = cfg.transpose_a, cfg.transpose_b
    m = a.shape[2] if ta else a.shape[1]
    n = b.shape[1] if tb else b.shape[2]
    k = a.shape[1] if ta else a.shape[2]
    bb = None
    if a.dtype == b.dtype:
        bb = cached_batch_block(a.shape[0], m, n, k, dtype=str(a.dtype),
                                semiring=cfg.semiring)
    return pallas_mxu.mxu_matmul_batched(
        a, b, cfg=cfg, transpose_a=ta, transpose_b=tb,
        interpret=_resolve_interpret(cfg), batch_block=bb)


def _mxu_batched_fwd(a, b, cfg):
    return _mxu_batched(a, b, cfg), (a, b)


def _mxu_batched_bwd(cfg, res, g):
    a, b = res
    ta, tb = cfg.transpose_a, cfg.transpose_b
    g = g.astype(cfg.jacc_dtype)

    def run(x, y, tx, ty, out_dtype):
        c = cfg.replace(transpose_a=tx, transpose_b=ty,
                        out_dtype=str(np.dtype(out_dtype)))
        return _mxu_batched(x, y, c)

    if not ta:
        da = run(g, b, False, not tb, a.dtype)        # g . op(B)^T
    else:
        da = run(b, g, tb, True, a.dtype)             # op(B) . g^T
    if not tb:
        db = run(a, g, not ta, False, b.dtype)        # op(A)^T . g
    else:
        db = run(g, a, True, ta, b.dtype)             # g^T . op(A)
    return da.astype(a.dtype), db.astype(b.dtype)


_mxu_batched.defvjp(_mxu_batched_fwd, _mxu_batched_bwd)


def _batched_fast_path_ok(a, b, cfg: GemmConfig, sr: Semiring,
                          backend, epilogue) -> bool:
    """Route a uniform 3-D problem to the batched kernel when each
    example's operands + f32 accumulator fit a VMEM block with at least
    two examples per grid step (otherwise the vmapped 2-D kernel and its
    full tiling machinery win)."""
    if not (a.ndim == 3 and b.ndim == 3 and a.shape[0] == b.shape[0]):
        return False
    if a.shape[0] == 0:
        return False  # empty batch: vmap returns the empty result
    if not sr.is_mxu:
        return False
    if backend not in (None, "pallas"):
        return False
    if cfg.precision in ("i8x2", "i8x3", "i8x4"):
        return False
    if np.dtype(cfg.dtype) == np.float64:
        return False
    if cfg.pad_policy == "strict":
        # Fall to the vmapped 2-D path, which enforces the divisibility
        # contract per example.
        return False
    m = a.shape[2] if cfg.transpose_a else a.shape[1]
    n = b.shape[1] if cfg.transpose_b else b.shape[2]
    k = a.shape[1] if cfg.transpose_a else a.shape[2]
    if min(m, n, k) == 0:
        return False
    in_b = np.dtype(cfg.dtype).itemsize
    per_ex = 2 * (m * k + k * n) * in_b + 4 * m * n
    return per_ex * 2 <= cfg.vmem_limit_bytes * 0.6


# ---------------------------------------------------------------------------
# Differentiable fused-epilogue paths.  The forward fuses the epilogue into
# the kernel's store (one HBM round trip of C saved); the backward recovers
# the *accumulator* cotangent dacc from the output cotangent g, then reuses
# the plain paths' flag algebra for da/db.  Two ways to get dacc:
#
#   * ``epilogue_bwd(y, g, *eps) -> (dacc, *deps)`` — caller-supplied,
#     computed from the saved output y (no recompute; this is how
#     ``ops/fused_linear.py`` specializes relu/sigmoid/tanh, whose
#     derivatives are recoverable from the output).
#   * default — recompute the accumulator with one extra (unfused) GEMM and
#     pull g back through ``jax.vjp`` of the epilogue function.
#
# The epilogue must be elementwise/broadcast over the accumulator (the same
# contract fusion itself requires), so applying it to the whole array in the
# backward is exactly the blockwise forward semantics.
# ---------------------------------------------------------------------------

def _epilogue_cotangents(epilogue, epilogue_bwd, y, g, eps, recompute_acc):
    if epilogue_bwd is not None:
        out = epilogue_bwd(y, g, *eps)
        return out[0], tuple(out[1:])
    acc = recompute_acc()
    yv, pull = jax.vjp(lambda A, *E: epilogue(A, *E), acc, *eps)
    dacc, *deps = pull(g.astype(yv.dtype))
    return dacc, tuple(deps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mxu_epilogue(a, b, eps, cfg: GemmConfig, epilogue, epilogue_bwd):
    return pallas_mxu.mxu_matmul(
        a, b, *eps, cfg=cfg, transpose_a=cfg.transpose_a,
        transpose_b=cfg.transpose_b, interpret=_resolve_interpret(cfg),
        epilogue=epilogue)


def _mxu_epilogue_fwd(a, b, eps, cfg, epilogue, epilogue_bwd):
    y = _mxu_epilogue(a, b, eps, cfg, epilogue, epilogue_bwd)
    return y, (a, b, eps, y)


def _mxu_epilogue_bwd(cfg, epilogue, epilogue_bwd, res, g):
    a, b, eps, y = res

    def recompute_acc():
        return _mxu_padded_fwd_impl(a, b, cfg.replace(out_dtype=cfg.acc_dtype))

    dacc, deps = _epilogue_cotangents(epilogue, epilogue_bwd, y, g, eps,
                                      recompute_acc)
    da, db = _mxu_bwd(cfg, (a, b), dacc)
    return da, db, tuple(d.astype(e.dtype) for d, e in zip(deps, eps))


_mxu_epilogue.defvjp(_mxu_epilogue_fwd, _mxu_epilogue_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mxu_batched_epilogue(a, b, eps, cfg: GemmConfig, epilogue, epilogue_bwd):
    return pallas_mxu.mxu_matmul_batched(
        a, b, *eps, cfg=cfg, transpose_a=cfg.transpose_a,
        transpose_b=cfg.transpose_b, interpret=_resolve_interpret(cfg),
        epilogue=epilogue)


def _mxu_batched_epilogue_fwd(a, b, eps, cfg, epilogue, epilogue_bwd):
    y = _mxu_batched_epilogue(a, b, eps, cfg, epilogue, epilogue_bwd)
    return y, (a, b, eps, y)


def _mxu_batched_epilogue_bwd(cfg, epilogue, epilogue_bwd, res, g):
    a, b, eps, y = res

    def recompute_acc():
        return pallas_mxu.mxu_matmul_batched(
            a, b, cfg=cfg.replace(out_dtype=cfg.acc_dtype),
            transpose_a=cfg.transpose_a, transpose_b=cfg.transpose_b,
            interpret=_resolve_interpret(cfg))

    dacc, deps = _epilogue_cotangents(epilogue, epilogue_bwd, y, g, eps,
                                      recompute_acc)
    da, db = _mxu_batched_bwd(cfg, (a, b), dacc)
    return da, db, tuple(d.astype(e.dtype) for d, e in zip(deps, eps))


_mxu_batched_epilogue.defvjp(_mxu_batched_epilogue_fwd,
                             _mxu_batched_epilogue_bwd)


def _check_ep_operands(b, cfg, ep_operands):
    n = b.shape[-2] if cfg.transpose_b else b.shape[-1]
    eps = []
    for ep in ep_operands:
        if ep.ndim != 1 or ep.shape[0] != n:
            raise ValueError(f"epilogue operands must be (N,)=({n},), "
                             f"got {ep.shape}")
        eps.append(ep.reshape(1, n))
    return tuple(eps)


def _mxu_with_epilogue(a, b, cfg: GemmConfig, epilogue, ep_operands,
                       epilogue_bwd=None):
    """Differentiable MXU matmul with a fused output epilogue."""
    if cfg.precision in ("i8x2", "i8x3", "i8x4"):
        raise ValueError("epilogue fusion is not supported with the "
                         "int8-slice precision tiers")
    eps = _check_ep_operands(b, cfg, ep_operands)
    return _mxu_epilogue(a, b, eps, cfg, epilogue, epilogue_bwd)


# ---------------------------------------------------------------------------
# XLA backend (device-side Naive oracle / f64 path)
# ---------------------------------------------------------------------------

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _xla_matmul(a, b, cfg: GemmConfig, sr: Semiring):
    ta, tb = cfg.transpose_a, cfg.transpose_b
    if sr.is_mxu:
        dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
        out = jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=cfg.jacc_dtype,
            precision=_PRECISION[cfg.precision],
        )
        return out.astype(cfg.jout_dtype)

    # Generic semiring: blocked K-sweep, scan-carried accumulator.  Memory
    # footprint M*ck*N per step (ck = 8).
    a_l = a.T if ta else a
    b_l = b.T if tb else b
    m, k = a_l.shape
    n = b_l.shape[1]
    acc_dtype = cfg.jacc_dtype
    ident = sr.identity_for(acc_dtype)
    ck = 8
    kp = -(-k // ck) * ck
    a_p = jnp.pad(a_l, ((0, 0), (0, kp - k))).astype(acc_dtype)
    b_p = jnp.pad(b_l, ((0, kp - k), (0, 0))).astype(acc_dtype)
    if kp != k:
        mask = (jnp.arange(kp) < k)
        a_chunks = a_p.reshape(m, kp // ck, ck).transpose(1, 0, 2)
        m_chunks = mask.reshape(kp // ck, 1, ck, 1)
    else:
        a_chunks = a_p.reshape(m, kp // ck, ck).transpose(1, 0, 2)
        m_chunks = None
    b_chunks = b_p.reshape(kp // ck, ck, n)

    def step(acc, operands):
        if m_chunks is None:
            a_c, b_c = operands
            mapped = sr.map_op(a_c[:, :, None], b_c[None, :, :])
        else:
            a_c, b_c, msk = operands
            mapped = sr.map_op(a_c[:, :, None], b_c[None, :, :])
            mapped = jnp.where(msk, mapped, jnp.asarray(ident, acc_dtype))
        return sr.reduce_op(acc, sr.reduce_along(mapped, axis=1)), None

    init = jnp.full((m, n), ident, acc_dtype)
    xs = (a_chunks, b_chunks) if m_chunks is None else (a_chunks, b_chunks, m_chunks)
    acc, _ = jax.lax.scan(step, init, xs)
    return acc.astype(cfg.jout_dtype)


# ---------------------------------------------------------------------------
# VPU path wrapper (padding + slicing around the Pallas kernel)
# ---------------------------------------------------------------------------

def _pack_bits_rows(x):
    """(M, K) bool -> (M, ceil(K/32)) int32, 32 contraction bits per lane
    word (bit j of word w = x[:, 32*w + j]).  Disjoint bit positions make
    the shifted sum an exact OR; the K tail pads with False, absorbing
    for the AND map."""
    m, k = x.shape
    kp = round_up(k, 32)
    if kp != k:
        x = jnp.pad(x, ((0, 0), (0, kp - k)))
    w = x.reshape(m, kp // 32, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(
        jnp.sum(w << shifts, axis=-1, dtype=jnp.uint32), jnp.int32)


def _pack_bits_cols(x):
    """(K, N) bool -> (ceil(K/32), N) int32, packed along K with the same
    bit order as :func:`_pack_bits_rows`."""
    k, n = x.shape
    kp = round_up(k, 32)
    if kp != k:
        x = jnp.pad(x, ((0, kp - k), (0, 0)))
    w = x.reshape(kp // 32, 32, n).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[:, None]
    return jax.lax.bitcast_convert_type(
        jnp.sum(w << shifts, axis=1, dtype=jnp.uint32), jnp.int32)


def _bitand_nonzero(aw, bw):
    return (jnp.bitwise_and(aw, bw) != 0).astype(jnp.int32)


_OR_AND_BITS = Semiring(
    name="or_and_bits", map_op=_bitand_nonzero, reduce_op=jnp.maximum,
    identity=0,
    np_map=lambda a, b: (np.bitwise_and(a, b) != 0).astype(np.int32),
    np_reduce=np.maximum, reduce_axis=jnp.max)


def _or_and_mxu(a, b, cfg: GemmConfig):
    """Boolean reachability on the MXU: 0/1 operands cast to int8,
    ``plus_times``-counted into int32 — exact, since each output count is
    at most K < 2^31 — then compared against zero.  The systolic array
    runs the 2*M*N*K "logical ops" at the int8 engine rate (~378 TOp/s on
    v5e), ~40x the best VPU encoding.  The FPGA reference had to bind
    AND/OR onto LUTs because its DSPs only do arithmetic
    (``include/MatrixMultiplication.h:141-153``); on TPU the trick runs
    the *arithmetic* engine because over {0,1}, AND *is* x and OR of a
    K-fold reduction *is* (sum != 0)."""
    a_l = a.T if cfg.transpose_a else a
    b_l = b.T if cfg.transpose_b else b
    m, k = a_l.shape
    n = b_l.shape[1]
    cfg8 = default_config("int8").replace(
        interpret=cfg.interpret,
        # Measured int8 winner geometry (data/autotune_seed.json), clamped
        # to the problem like the auto path.
        block_m=min(512, round_up(m, sublane("int8"))),
        block_n=min(1024, round_up(n, LANE)),
        block_k=min(4096, round_up(k, LANE)),
    )
    counts = _mxu_padded(a_l.astype(jnp.int8), b_l.astype(jnp.int8), cfg8)
    return counts != 0


def _vpu_dispatch(a, b, cfg: GemmConfig, sr: Semiring):
    interpret = _resolve_interpret(cfg)
    a_l = a.T if cfg.transpose_a else a
    b_l = b.T if cfg.transpose_b else b
    m, k = a_l.shape
    n = b_l.shape[1]

    cast_bool = a_l.dtype == jnp.bool_
    if cast_bool:
        # Boolean reachability rides *bit-packed* int32 lanes: 32 k-bits
        # per word, map = (word AND word) != 0, reduce = max (= OR) — 32
        # logical contraction steps per lane op, vs 1 for the old
        # one-bool-per-int32-lane encoding.  Packing is an O(M*K)
        # elementwise pass.  This is the `backend="pallas-vpu"` fallback;
        # the default route for bool or_and is :func:`_or_and_mxu`.
        # (int8 *lanes* were measured and are a dead end: Mosaic has no
        # int8 axis reductions and the binary fold tree hangs its
        # compiler — see docs/BENCHMARKS.md.)
        kw = cdiv(k, 32)
        a_l = _pack_bits_rows(a_l)
        b_l = _pack_bits_cols(b_l)
        sr = _OR_AND_BITS
        # Packed-geometry blocks: the caller's block_k describes the
        # unpacked K.  bn rides full lanes; bm stays small so the
        # (bm, ck, bn) mapped intermediate fits VMEM (the kernel widens
        # ck as far as the budget allows).
        cfg = cfg.replace(
            dtype="int32", out_dtype="int32", acc_dtype="int32",
            block_m=min(16, round_up(m, 8)),
            block_n=min(2048, round_up(n, LANE)),
            block_k=round_up(min(kw, 2048), 8),
        )
        k = kw

    mp, np_, kp = cfg.padded_shape(m, n, k)
    out = pallas_vpu.vpu_matmul(
        _pad2(a_l, mp, kp), _pad2(b_l, kp, np_),
        cfg=cfg, sr=sr, k_actual=k, interpret=interpret,
    )[:m, :n]
    return out != 0 if cast_bool else out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def matmul(
    a,
    b,
    *,
    semiring="plus_times",
    config: Optional[GemmConfig] = None,
    transpose_a: Optional[bool] = None,
    transpose_b: Optional[bool] = None,
    out_dtype=None,
    backend: Optional[str] = None,
    interpret: Optional[bool] = None,
    precision: Optional[str] = None,
    epilogue=None,
    epilogue_operands=(),
    epilogue_bwd=None,
):
    """Communication-avoiding semiring matmul: C = reduce_k map(op(A), op(B)).

    Args:
      a: (M, K) array — or (K, M) with ``transpose_a`` (contraction over the
        leading axis; reference ``MM_TRANSPOSED_A``).
      b: (K, N) array — or (N, K) with ``transpose_b``.
      semiring: registry name or :class:`Semiring` (reference
        ``MM_MAP_OP``/``MM_REDUCE_OP``).
      config: a :class:`GemmConfig`; defaults to :func:`default_config` for
        the input dtype.
      backend: "pallas" (default on TPU; interpreter off-TPU), "xla", or
        "pallas-vpu" (force the generic-semiring VPU kernel, bypassing MXU
        routing — any semiring, including plus_times and bool or_and).
      interpret: force Pallas interpreter mode.
      precision: MXU precision override for float32 ("default"|"high"|"highest").
      epilogue: optional output transform fused into the MXU kernel's store
        (plus_times only): ``epilogue(acc_f32, *operand_blocks) -> array`` —
        e.g. ``lambda acc, bias: jax.nn.relu(acc + bias)``. Saves a full
        HBM round trip of C versus a separate elementwise pass. The fused
        path is differentiable: the backward recomputes the accumulator
        and pulls the cotangent back through ``jax.vjp`` of the epilogue
        (or uses ``epilogue_bwd`` to skip the recompute). Must be
        elementwise/broadcast over the accumulator, and a module-level
        function or cached partial to avoid jit-cache misses.
      epilogue_operands: per-output-column arrays of shape (N,) (e.g. a
        bias), passed to ``epilogue`` as (1, block_n) blocks.
      epilogue_bwd: optional ``(y, g, *eps) -> (dacc, *deps)`` computing
        the accumulator cotangent and per-operand cotangents from the
        saved *output* — supply when the epilogue's derivative is
        recoverable from y (relu/sigmoid/tanh) to avoid the backward's
        accumulator-recompute GEMM (``ops/fused_linear.py`` does this).
        ``eps``/``deps`` are the (1, N)-reshaped operands.

    Returns (M, N) in ``config.out_dtype``.
    """
    sr = get_semiring(semiring)
    auto_config = config is None
    if a.ndim > 3 or b.ndim > 3:
        # N-D batching: both operands must carry IDENTICAL leading batch
        # dims (no NumPy-style broadcasting of unequal batch dims), or one
        # operand may be 2-D (broadcast across the whole batch).  Leading
        # dims are flattened to one axis, the 3-D path runs, and the shape
        # is restored.
        lead_a = a.shape[:-2] if a.ndim > 2 else ()
        lead_b = b.shape[:-2] if b.ndim > 2 else ()
        if lead_a and lead_b and lead_a != lead_b:
            raise ValueError(
                f"batch dims must match (or one operand be 2-D): "
                f"{a.shape} x {b.shape}")
        lead = lead_a or lead_b
        a3 = a.reshape((-1,) + a.shape[-2:]) if lead_a else a
        b3 = b.reshape((-1,) + b.shape[-2:]) if lead_b else b
        out = matmul(a3, b3, semiring=semiring, config=config,
                     transpose_a=transpose_a, transpose_b=transpose_b,
                     out_dtype=out_dtype, backend=backend,
                     interpret=interpret, precision=precision,
                     epilogue=epilogue, epilogue_operands=epilogue_operands,
                     epilogue_bwd=epilogue_bwd)
        return out.reshape(lead + out.shape[-2:])
    if a.ndim == 3 or b.ndim == 3:
        bsz = a.shape[0] if a.ndim == 3 else b.shape[0]
        if bsz == 0:
            # Empty batch: neither vmap-of-pallas nor the batched kernel
            # can slice a zero-size operand — return the empty result.
            # Same error surface as the non-empty path: shape/dtype/
            # semiring violations raise rather than silently yield zeros.
            if a.ndim == 3 and b.ndim == 3 and a.shape[0] != b.shape[0]:
                raise ValueError(
                    f"batch dims must match: {a.shape} x {b.shape}")
            if a.dtype != b.dtype:
                raise ValueError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
            if not sr.supports_dtype(a.dtype):
                raise ValueError(
                    f"semiring {sr.name} does not support dtype {a.dtype}")
            ta_ = config.transpose_a if config else bool(transpose_a)
            tb_ = config.transpose_b if config else bool(transpose_b)
            a2, b2 = a.shape[-2:], b.shape[-2:]
            m_e = a2[1] if ta_ else a2[0]
            n_e = b2[0] if tb_ else b2[1]
            ka_ = a2[0] if ta_ else a2[1]
            kb_ = b2[1] if tb_ else b2[0]
            if ka_ != kb_:
                raise ValueError(
                    f"contraction mismatch: {a.shape} x {b.shape}")
            od = (jnp.dtype(out_dtype) if out_dtype is not None
                  else (config.jout_dtype if config else a.dtype))
            return jnp.zeros((0, m_e, n_e), od)
        if a.ndim == 3 and b.ndim == 3:
            bcfg = config or default_config(str(a.dtype), semiring=sr.name)
            overrides = {}
            if transpose_a is not None:
                overrides["transpose_a"] = transpose_a
            if transpose_b is not None:
                overrides["transpose_b"] = transpose_b
            if out_dtype is not None:
                overrides["out_dtype"] = str(jnp.dtype(out_dtype))
            if interpret is not None:
                overrides["interpret"] = interpret
            if precision is not None:
                overrides["precision"] = precision
            if str(a.dtype) != bcfg.dtype:
                overrides["dtype"] = str(a.dtype)
            if overrides:
                bcfg = bcfg.replace(**overrides)
            if (a.dtype == b.dtype and sr.supports_dtype(a.dtype)
                    and _batched_fast_path_ok(a, b, bcfg, sr, backend,
                                              epilogue)):
                if epilogue is not None:
                    eps = _check_ep_operands(b, bcfg,
                                             tuple(epilogue_operands))
                    return _mxu_batched_epilogue(a, b, eps, bcfg, epilogue,
                                                 epilogue_bwd)
                return _mxu_batched(a, b, bcfg)
        # General batched GEMM: vmap over the leading axis (a 2-D operand
        # is broadcast across the batch).
        kw = dict(semiring=semiring, config=config, transpose_a=transpose_a,
                  transpose_b=transpose_b, out_dtype=out_dtype,
                  backend=backend, interpret=interpret, precision=precision,
                  epilogue=epilogue, epilogue_operands=epilogue_operands,
                  epilogue_bwd=epilogue_bwd)
        in_axes = (0 if a.ndim == 3 else None, 0 if b.ndim == 3 else None)
        return jax.vmap(lambda x, y: matmul(x, y, **kw), in_axes=in_axes)(a, b)
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(
            f"matmul expects operands of ndim >= 2, got {a.shape}, {b.shape}")
    if config is None:
        # Measured autotune winner for this (chip, dtype, semiring,
        # shape bucket, layout), if one is cached (user cache or the
        # packaged seed) — never probes.  Transposed layouts consult
        # their own buckets: transpose_a moves block_m to the lane
        # dimension, which shifts the block optimum (the backward pass
        # issues exactly these layouts).
        from gemm_hls_tpu.tools.autotune import cached_config

        ta_ = bool(transpose_a)
        tb_ = bool(transpose_b)
        layout = ("t" if ta_ else "n") + ("t" if tb_ else "n")
        mm = a.shape[1] if ta_ else a.shape[0]
        kk = a.shape[0] if ta_ else a.shape[1]
        nn_ = b.shape[0] if tb_ else b.shape[1]
        config = cached_config(mm, nn_, kk, dtype=str(a.dtype),
                               semiring=sr.name, layout=layout)
        if config is None:
            config = default_config(str(a.dtype), semiring=sr.name)
    overrides = {}
    if transpose_a is not None:
        overrides["transpose_a"] = transpose_a
    if transpose_b is not None:
        overrides["transpose_b"] = transpose_b
    if out_dtype is not None:
        overrides["out_dtype"] = str(jnp.dtype(out_dtype))
    if interpret is not None:
        overrides["interpret"] = interpret
    if precision is not None:
        overrides["precision"] = precision
    if str(a.dtype) != config.dtype:
        overrides["dtype"] = str(a.dtype)
    if config.semiring != sr.name:
        overrides["semiring"] = sr.name
    if overrides:
        config = config.replace(**overrides)

    if auto_config:
        # Clamp auto-chosen blocks to the problem so small operands don't
        # pad up to full-size tiles.
        m_dim = a.shape[1] if config.transpose_a else a.shape[0]
        n_dim = b.shape[0] if config.transpose_b else b.shape[1]
        k_dim = a.shape[0] if config.transpose_a else a.shape[1]
        m_align = LANE if config.transpose_a else sublane(config.dtype)
        config = config.replace(
            block_m=min(config.block_m, round_up(m_dim, m_align)),
            block_n=min(config.block_n, round_up(n_dim, LANE)),
            block_k=min(config.block_k, round_up(k_dim, LANE)),
        )

    ka = a.shape[0] if config.transpose_a else a.shape[1]
    kb = b.shape[1] if config.transpose_b else b.shape[0]
    if ka != kb:
        raise ValueError(f"contraction mismatch: {a.shape} x {b.shape}")
    m_out = a.shape[1] if config.transpose_a else a.shape[0]
    n_out = b.shape[0] if config.transpose_b else b.shape[1]
    if m_out == 0 or n_out == 0 or ka == 0:
        # Degenerate shapes: empty result / pure-identity fill.
        ident = sr.identity_for(config.jacc_dtype) if ka == 0 else 0
        return jnp.full((m_out, n_out), ident, config.jout_dtype)
    if a.dtype != b.dtype:
        raise ValueError(f"dtype mismatch: {a.dtype} vs {b.dtype}")
    if not sr.supports_dtype(a.dtype):
        raise ValueError(f"semiring {sr.name} does not support dtype {a.dtype}")

    if backend is None:
        backend = "pallas"
        if np.dtype(config.dtype) == np.float64 and _on_tpu():
            # Mosaic has no f64 and XLA's TPU emulation is impractically
            # slow (observed hanging in compile on v5e) — fail with
            # directions instead of hanging.
            raise ValueError(
                "float64 matmul on TPU: use gemm_hls_tpu.ops.ozaki."
                "ozaki_matmul (f64-class accuracy on the bf16 MXU), run on "
                "CPU, or pass backend='xla' explicitly to accept XLA's "
                "f64 emulation")

    interp = _resolve_interpret(config)
    config.validate(
        strict_alignment=(backend in ("pallas", "pallas-vpu") and not interp))

    if config.pad_policy == "strict":
        m = a.shape[1] if config.transpose_a else a.shape[0]
        n = b.shape[0] if config.transpose_b else b.shape[1]
        if (m % config.block_m or n % config.block_n or ka % config.block_k):
            raise ValueError(
                f"pad_policy='strict': shape ({m},{n},{ka}) not divisible by "
                f"blocks ({config.block_m},{config.block_n},{config.block_k})"
            )

    if epilogue is not None:
        if backend != "pallas" or not sr.is_mxu:
            raise ValueError("epilogue fusion requires the plus_times "
                             "semiring on the pallas backend")
        return _mxu_with_epilogue(a, b, config, epilogue,
                                  tuple(epilogue_operands),
                                  epilogue_bwd=epilogue_bwd)
    if backend == "xla":
        return _xla_matmul(a, b, config, sr)
    if backend not in ("pallas", "pallas-vpu"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "pallas-vpu":
        # Force the generic-semiring VPU kernel — bypasses every MXU
        # routing decision (plus_times-on-VPU, bit-packed or_and), for
        # benchmarking the VPU datapath and testing its codepaths.
        return _vpu_dispatch(a, b, config, sr)
    if sr.name == "or_and" and a.dtype == jnp.bool_:
        return _or_and_mxu(a, b, config)
    if sr.is_mxu and config.precision in ("i8x2", "i8x3", "i8x4"):
        if (config.transpose_a or config.transpose_b
                or np.dtype(config.dtype) != np.float32):
            raise ValueError("precision='i8x*' requires float32 operands "
                             "without transpose flags")
        from gemm_hls_tpu.ops.int8_slices import fp32_matmul_int8
        n_slices = int(config.precision[-1])
        out = fp32_matmul_int8(a, b, block_m=512, block_n=1024,
                               block_k=8192, n_slices=n_slices)
        return out.astype(config.jout_dtype)
    if sr.is_mxu:
        return _mxu_padded(a, b, config)
    if (sr.name in ("min_plus", "max_plus", "log_plus", "max_min", "min_max")
            and not config.transpose_a and not config.transpose_b):
        # Differentiable additive-map path: argmin/argmax subgradients, or
        # softmax weights for the smooth log semiring
        # (ops/tropical_grad.py); forward is the same VPU kernel.
        from gemm_hls_tpu.ops.tropical_grad import tropical_matmul
        return tropical_matmul(a, b, sr.name, config)
    return _vpu_dispatch(a, b, config, sr)
