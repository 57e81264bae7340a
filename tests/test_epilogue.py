"""Fused output epilogues (bias/activation in the MXU kernel's store)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils import make_operands

CFG = GemmConfig(block_m=32, block_n=128, block_k=128, interpret=True)


def _bias_relu(acc, bias):
    return jax.nn.relu(acc + bias)


def _scale(acc, s):
    return acc * s


def test_bias_relu_fused():
    a, b = make_operands(40, 129, 64, "float32", low=-5.0, high=5.0)
    bias = np.linspace(-10, 10, 129).astype(np.float32)
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=CFG,
                 epilogue=_bias_relu, epilogue_operands=(jnp.asarray(bias),))
    exp = np.maximum(a.astype(np.float64) @ b + bias, 0.0)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_columnwise_scale_fused():
    a, b = make_operands(16, 128, 32, "float32")
    s = np.arange(1, 129, dtype=np.float32)
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=CFG,
                 epilogue=_scale, epilogue_operands=(jnp.asarray(s),))
    exp = (a.astype(np.float64) @ b) * s
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4)


def test_epilogue_without_operands():
    a, b = make_operands(16, 128, 32, "float32")
    out = matmul(jnp.asarray(a), jnp.asarray(b), config=CFG,
                 epilogue=jax.nn.gelu)
    exp = jax.nn.gelu(jnp.asarray(a) @ jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), rtol=1e-4,
                               atol=1e-5)


def test_epilogue_rejects_vpu_semiring():
    a, b = make_operands(8, 128, 16, "float32")
    with pytest.raises(ValueError, match="plus_times"):
        matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
               config=CFG, epilogue=_scale,
               epilogue_operands=(jnp.ones((128,), jnp.float32),))


def test_epilogue_bad_operand_shape():
    a, b = make_operands(8, 128, 16, "float32")
    with pytest.raises(ValueError, match="epilogue operands"):
        matmul(jnp.asarray(a), jnp.asarray(b), config=CFG, epilogue=_scale,
               epilogue_operands=(jnp.ones((8, 128), jnp.float32),))


def test_epilogue_gradient_via_recompute():
    # Default backward: recompute the accumulator, pull the cotangent back
    # through jax.vjp of the epilogue — gradients must match plain autodiff.
    a, b = make_operands(24, 128, 48, "float32", low=-2.0, high=2.0)
    bias = np.linspace(-3, 3, 128).astype(np.float32)
    aj, bj, biasj = map(jnp.asarray, (a, b, bias))

    def fused(x, w, bb):
        return jnp.sum(matmul(x, w, config=CFG, epilogue=_bias_relu,
                              epilogue_operands=(bb,)) ** 2)

    def ref(x, w, bb):
        return jnp.sum(jax.nn.relu(x @ w + bb) ** 2)

    for argnum in (0, 1, 2):
        g_fused = jax.grad(fused, argnums=argnum)(aj, bj, biasj)
        g_ref = jax.grad(ref, argnums=argnum)(aj, bj, biasj)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)


def test_epilogue_gradient_via_epilogue_bwd():
    # Caller-supplied output-form backward (no recompute) — same gradients.
    a, b = make_operands(16, 128, 32, "float32", low=-2.0, high=2.0)
    bias = np.linspace(-1, 1, 128).astype(np.float32)
    aj, bj, biasj = map(jnp.asarray, (a, b, bias))

    def ep_bwd(y, g, bias2d):
        dacc = g * (y > 0)
        return dacc, dacc.sum(0, keepdims=True)

    def fused(x, w, bb):
        return jnp.sum(matmul(x, w, config=CFG, epilogue=_bias_relu,
                              epilogue_operands=(bb,),
                              epilogue_bwd=ep_bwd) ** 2)

    def ref(x, w, bb):
        return jnp.sum(jax.nn.relu(x @ w + bb) ** 2)

    for argnum in (0, 1, 2):
        g_fused = jax.grad(fused, argnums=argnum)(aj, bj, biasj)
        g_ref = jax.grad(ref, argnums=argnum)(aj, bj, biasj)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)


def test_batched_epilogue_fused():
    # The batched fast path accepts epilogues (the thin-K attention-scores
    # shape needs a fused consumer to match XLA's fused dot).
    rng = np.random.default_rng(5)
    a = rng.uniform(-2, 2, (4, 16, 32)).astype(np.float32)
    b = rng.uniform(-2, 2, (4, 32, 128)).astype(np.float32)
    bias = np.linspace(-2, 2, 128).astype(np.float32)
    out = matmul(jnp.asarray(a), jnp.asarray(b), interpret=True,
                 epilogue=_bias_relu, epilogue_operands=(jnp.asarray(bias),))
    exp = np.maximum(a.astype(np.float64) @ b + bias, 0.0)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_batched_epilogue_gradient():
    rng = np.random.default_rng(6)
    a = rng.uniform(-2, 2, (3, 16, 32)).astype(np.float32)
    b = rng.uniform(-2, 2, (3, 32, 128)).astype(np.float32)
    bias = np.linspace(-1, 1, 128).astype(np.float32)
    aj, bj, biasj = map(jnp.asarray, (a, b, bias))

    def fused(x, w, bb):
        return jnp.sum(matmul(x, w, interpret=True, epilogue=_bias_relu,
                              epilogue_operands=(bb,)) ** 2)

    def ref(x, w, bb):
        return jnp.sum(jax.nn.relu(x @ w + bb) ** 2)

    for argnum in (0, 1, 2):
        g_fused = jax.grad(fused, argnums=argnum)(aj, bj, biasj)
        g_ref = jax.grad(ref, argnums=argnum)(aj, bj, biasj)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)
