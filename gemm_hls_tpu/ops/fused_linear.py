"""Trainable fused linear layer: y = act(x @ W + b) in one kernel pass.

A thin specialization of the differentiable fused-epilogue matmul
(``ops/matmul.py``): the forward fuses bias + activation into the MXU
kernel's store, and the backward skips the accumulator-recompute GEMM by
supplying an ``epilogue_bwd`` that recovers the pre-store cotangent from
the saved *output*:

    dacc = g * act'(y)                     (elementwise, from y)
    dx   = dacc @ W^T                      (CA-GEMM, transpose_b)
    dW   = x^T @ dacc                      (CA-GEMM, transpose_a)
    db   = sum_rows dacc

Activations are restricted to those whose derivative is recoverable from
the *output* (so no pre-activation needs saving): identity, relu, sigmoid,
tanh.  For other epilogues, call ``matmul(..., epilogue=...)`` directly —
its default backward recomputes the accumulator and differentiates the
epilogue with ``jax.vjp``.

This mirrors the reference's single kernel serving both directions
(``include/MatrixMultiplication.h:155-171``): one fused forward, backward
expressed as further CA-GEMM calls with flipped transpose flags.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig


def _make_epilogue_bwd(dact):
    """Build ``(y, g, bias2d) -> (dacc, dbias2d)`` from an output-form
    activation derivative.  dacc accumulates in f32 (the backward GEMMs
    contract over it); dbias sums all leading axes so the same function
    serves the 2-D and batched kernels."""
    def ep_bwd(y, g, bias2d):
        dacc = (g.astype(jnp.float32)
                * dact(y.astype(jnp.float32)))
        dbias = dacc.reshape(-1, dacc.shape[-1]).sum(0, keepdims=True)
        return dacc, dbias
    return ep_bwd


# activation name -> (epilogue(acc, bias), epilogue_bwd(y, g, bias))
_ACTIVATIONS = {
    "identity": (lambda acc, b: acc + b,
                 _make_epilogue_bwd(lambda y: jnp.ones_like(y))),
    "relu": (lambda acc, b: jax.nn.relu(acc + b),
             _make_epilogue_bwd(lambda y: (y > 0).astype(y.dtype))),
    "sigmoid": (lambda acc, b: jax.nn.sigmoid(acc + b),
                _make_epilogue_bwd(lambda y: y * (1.0 - y))),
    "tanh": (lambda acc, b: jnp.tanh(acc + b),
             _make_epilogue_bwd(lambda y: 1.0 - y * y)),
}


def fused_linear(x, w, b, activation: str = "relu",
                 config: Optional[GemmConfig] = None):
    """y = activation(x @ w + b), epilogue fused into the MXU kernel.

    Args:
      x: (M, K) — or (..., M, K), batched over leading dims; w: (K, N);
      b: (N,).
      activation: one of "identity", "relu", "sigmoid", "tanh".
    Differentiable end to end via the fused-epilogue custom VJP.
    """
    from gemm_hls_tpu.ops.matmul import matmul

    try:
        epilogue, ep_bwd = _ACTIVATIONS[activation]
    except KeyError:
        raise ValueError(
            f"activation must be one of {sorted(_ACTIVATIONS)}, "
            f"got {activation!r}") from None
    return matmul(x, w, config=config, epilogue=epilogue,
                  epilogue_operands=(b,), epilogue_bwd=ep_bwd)
