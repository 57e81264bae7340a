"""Trainable fused linear layer: y = act(x @ W + b) in one kernel pass.

The fused epilogue (``ops/pallas_mxu.py``) saves an HBM round trip of the
output but is forward-only in its raw form.  This module adds the custom
VJP for the common (bias, activation) epilogues so the fused path trains:

    backward:  dpre = g * act'(y)          (elementwise, from the saved y)
               dx   = dpre @ W^T           (CA-GEMM, transpose_b)
               dW   = x^T @ dpre           (CA-GEMM, transpose_a)
               db   = sum_rows dpre

Activations are restricted to those whose derivative is recoverable from
the *output* (so no pre-activation needs saving): identity, relu, sigmoid,
tanh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gemm_hls_tpu.config import GemmConfig

# activation name -> (epilogue(acc, bias), dact_from_output(y))
_ACTIVATIONS = {
    "identity": (lambda acc, b: acc + b,
                 lambda y: jnp.ones_like(y)),
    "relu": (lambda acc, b: jax.nn.relu(acc + b),
             lambda y: (y > 0).astype(y.dtype)),
    "sigmoid": (lambda acc, b: jax.nn.sigmoid(acc + b),
                lambda y: y * (1.0 - y)),
    "tanh": (lambda acc, b: jnp.tanh(acc + b),
             lambda y: 1.0 - y * y),
}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_linear(x, w, b, activation: str = "relu",
                 config: Optional[GemmConfig] = None):
    """y = activation(x @ w + b), epilogue fused into the MXU kernel.

    Args:
      x: (M, K); w: (K, N); b: (N,).
      activation: one of "identity", "relu", "sigmoid", "tanh".
    Differentiable (unlike the raw ``matmul(..., epilogue=...)``).
    """
    return _forward(x, w, b, activation, config)


def _forward(x, w, b, activation, config):
    from gemm_hls_tpu.ops.matmul import matmul

    try:
        epilogue, _ = _ACTIVATIONS[activation]
    except KeyError:
        raise ValueError(
            f"activation must be one of {sorted(_ACTIVATIONS)}, "
            f"got {activation!r}") from None
    return matmul(x, w, config=config, epilogue=epilogue,
                  epilogue_operands=(b,))


def _fwd(x, w, b, activation, config):
    y = _forward(x, w, b, activation, config)
    return y, (x, w, y)


def _bwd(activation, config, res, g):
    from gemm_hls_tpu.ops.matmul import matmul

    x, w, y = res
    _, dact = _ACTIVATIONS[activation]
    dpre = (g * dact(y.astype(g.dtype))).astype(x.dtype)
    dx = matmul(dpre, w, config=config, transpose_b=True)      # g . W^T
    dw = matmul(x, dpre, config=config, transpose_a=True)      # x^T . g
    db = jnp.sum(dpre, axis=0).astype(dpre.dtype)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


fused_linear.defvjp(_fwd, _bwd)