"""Grouped (ragged) matmul public API — differentiable MoE expert GEMM.

``grouped_matmul(lhs, rhs, group_sizes)`` computes, for each group ``g``,
``out[rows(g), :] = lhs[rows(g), :] @ rhs[g]`` where ``rows(g)`` is the
contiguous row span given by ``group_sizes`` — ``jax.lax.ragged_dot``
semantics with rows past ``sum(group_sizes)`` defined as zero.  One Pallas
kernel serves every routing outcome (the grid is a static upper bound over
the dynamic group boundaries; see ``ops/pallas_grouped.py``), so MoE
dispatch never recompiles.

Differentiable via a custom VJP built from the same kernels, mirroring the
dense path (``ops/matmul.py``): the lhs cotangent is another grouped matmul
with the contraction flipped onto the experts' N axis (no materialized
transpose), and the rhs cotangent is the per-group outer-product kernel
``grouped_update_mxu`` (``lhs[rows(g)].T @ g[rows(g)]``).

Reference analogue: the semiring GEMM entry point
(``include/MatrixMultiplication.h:155-171``) generalized to a ragged row
partition — a capability the reference's single-FPGA launcher does not
have, required for expert-parallel serving on TPU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gemm_hls_tpu.config import GemmConfig
from gemm_hls_tpu.ops.pallas_grouped import grouped_mxu, grouped_update_mxu


def _resolve_interpret(cfg: GemmConfig) -> bool:
    if cfg.interpret is not None:
        return cfg.interpret
    return jax.default_backend() != "tpu"


def _default_cfg(lhs, rhs) -> GemmConfig:
    dt = jnp.promote_types(lhs.dtype, rhs.dtype)
    # Autotuned grouped-family winner for this (M, K, N, G) bucket, if
    # one is cached (user cache or packaged seed); else GemmConfig
    # defaults.
    from gemm_hls_tpu.tools.autotune import cached_family_entry

    e = cached_family_entry(
        "grouped", (lhs.shape[0], lhs.shape[1], rhs.shape[-1],
                    rhs.shape[0]), dtype=str(jnp.dtype(lhs.dtype)))
    if e is not None:
        return GemmConfig(dtype=str(jnp.dtype(lhs.dtype)),
                          out_dtype=str(dt), block_m=e["block_m"],
                          block_n=e["block_n"], block_k=e["block_k"],
                          vmem_limit_bytes=110 * 1024 * 1024)
    return GemmConfig(dtype=str(jnp.dtype(lhs.dtype)), out_dtype=str(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _grouped(lhs, rhs, group_sizes, cfg: GemmConfig, transpose_rhs: bool):
    return grouped_mxu(lhs, rhs, group_sizes, cfg=cfg,
                       transpose_rhs=transpose_rhs,
                       interpret=_resolve_interpret(cfg))


def _grouped_fwd(lhs, rhs, group_sizes, cfg, transpose_rhs):
    return (_grouped(lhs, rhs, group_sizes, cfg, transpose_rhs),
            (lhs, rhs, group_sizes))


def _grouped_bwd(cfg, transpose_rhs, res, g):
    lhs, rhs, group_sizes = res
    interpret = _resolve_interpret(cfg)
    num_groups = rhs.shape[0]
    # dlhs[rows(g)] = gbar[rows(g)] @ rhs[g]^T — the same grouped kernel
    # with the contraction flipped onto the experts' other axis.  The
    # backward configs keep the *forward* dtype: _resolve_precision keys
    # off it, and a sub-fp32 forward dtype selects DEFAULT contract
    # precision — the only mode in which Mosaic accepts the mixed
    # (f32 cotangent x bf16 operand) dot (an fp32-contract mixed matmul
    # fails to lower: "Bad rhs type", verified on v5e).
    dl_cfg = dataclasses.replace(cfg, out_dtype=str(lhs.dtype))
    dlhs = grouped_mxu(g, rhs, group_sizes, cfg=dl_cfg,
                       transpose_rhs=not transpose_rhs, interpret=interpret)
    # drhs[g] = lhs[rows(g)]^T @ gbar[rows(g)]  (swapped for transpose_rhs).
    dr_cfg = dataclasses.replace(cfg, out_dtype=str(rhs.dtype))
    if transpose_rhs:
        drhs = grouped_update_mxu(g, lhs, group_sizes, cfg=dr_cfg,
                                  num_groups=num_groups, interpret=interpret)
    else:
        drhs = grouped_update_mxu(lhs, g, group_sizes, cfg=dr_cfg,
                                  num_groups=num_groups, interpret=interpret)
    dgs = np.zeros(group_sizes.shape, dtype=jax.dtypes.float0)
    return dlhs, drhs, dgs


_grouped.defvjp(_grouped_fwd, _grouped_bwd)


def grouped_matmul(lhs, rhs, group_sizes, cfg: GemmConfig | None = None,
                   *, transpose_rhs: bool = False):
    """Differentiable ragged grouped matmul (MoE expert GEMM).

    Args:
      lhs: (M, K) activations, rows grouped contiguously by expert.
      rhs: (G, K, N) expert weights — (G, N, K) with ``transpose_rhs``.
      group_sizes: (G,) integer rows-per-expert; ``sum`` may be < M
        (trailing rows return zeros).  Oversized routing
        (``sum > M``) is NOT an error: the schedule clamps every
        group's row range to [0, M), so groups past the clamp silently
        compute fewer rows (the trailing ones are dropped) — callers
        that can overflow should validate sizes themselves.
      cfg: optional :class:`GemmConfig` (block sizes, dtypes, precision,
        interpret); defaults to the dtype-promoted default config.
      transpose_rhs: contract over each expert matrix's *last* axis.

    Returns (M, N) in ``cfg.out_dtype``.
    """
    if lhs.ndim != 2 or rhs.ndim != 3:
        raise ValueError(f"expected (M,K) x (G,K,N), got "
                         f"{lhs.shape} x {rhs.shape}")
    if cfg is None:
        cfg = _default_cfg(lhs, rhs)
    gs = jnp.asarray(group_sizes)
    if gs.ndim != 1 or gs.shape[0] != rhs.shape[0]:
        raise ValueError(
            f"group_sizes must be ({rhs.shape[0]},), got {gs.shape}")
    if not jnp.issubdtype(gs.dtype, jnp.integer):
        raise ValueError(f"group_sizes must be integer, got {gs.dtype}")
    return _grouped(lhs, rhs, gs.astype(jnp.int32), cfg, bool(transpose_rhs))
