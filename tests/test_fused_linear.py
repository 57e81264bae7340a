"""Trainable fused linear (epilogue + custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig
from gemm_hls_tpu.ops.fused_linear import fused_linear
from gemm_hls_tpu.utils import make_operands

CFG = GemmConfig(block_m=32, block_n=128, block_k=128, interpret=True)


def _ref(x, w, b, act):
    pre = x @ w + b
    return {"identity": lambda p: p, "relu": jax.nn.relu,
            "sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh}[act](pre)


@pytest.mark.parametrize("act", ["identity", "relu", "sigmoid", "tanh"])
def test_forward_matches(act):
    x, w = make_operands(40, 130, 64, "float32", low=-1.0, high=1.0)
    b = np.linspace(-1, 1, 130).astype(np.float32)
    y = fused_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), act, CFG)
    exp = _ref(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(exp), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("act", ["identity", "relu", "sigmoid", "tanh"])
def test_gradients_match_autodiff(act):
    x, w = make_operands(24, 64, 48, "float32", low=-1.0, high=1.0)
    b = np.linspace(-0.5, 0.5, 64).astype(np.float32)
    x, w, b = jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)

    def loss(x, w, b):
        return jnp.sum(fused_linear(x, w, b, act, CFG) ** 2)

    def ref_loss(x, w, b):
        return jnp.sum(_ref(x, w, b, act) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    refs = jax.grad(ref_loss, argnums=(0, 1, 2))(x, w, b)
    for got, exp in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-3, atol=1e-5)


def test_bad_activation():
    x = jnp.zeros((8, 16), jnp.float32)
    w = jnp.zeros((16, 128), jnp.float32)
    b = jnp.zeros((128,), jnp.float32)
    with pytest.raises(ValueError, match="activation must be"):
        fused_linear(x, w, b, "gelu", CFG)
