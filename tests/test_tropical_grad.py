"""Subgradients through tropical (min_plus / max_plus) matmuls."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.utils import make_operands

CFG = GemmConfig(block_m=16, block_n=128, block_k=64, interpret=True)


def _ref_loss(a, b, reduce_fn):
    # XLA-native differentiable formulation (materializes (M,K,N) — only
    # viable at test sizes).
    mapped = a[:, :, None] + b[None, :, :]
    return jnp.sum(reduce_fn(mapped, axis=1) ** 2)


@pytest.mark.parametrize("name,reduce_fn", [("min_plus", jnp.min),
                                            ("max_plus", jnp.max)])
def test_grads_match_xla_autodiff(name, reduce_fn):
    # Continuous random data -> no ties -> subgradient is the gradient.
    a, b = make_operands(12, 20, 16, "float32", low=0.0, high=100.0)
    a, b = jnp.asarray(a), jnp.asarray(b)

    def loss(a, b):
        return jnp.sum(matmul(a, b, semiring=name, config=CFG) ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(lambda a, b: _ref_loss(a, b, reduce_fn),
                      argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5)


def test_tie_sharing():
    # Two identical K candidates: the cotangent splits equally.
    a = jnp.asarray([[1.0, 1.0]], jnp.float32)        # (1, 2)
    b = jnp.asarray([[2.0], [2.0]], jnp.float32)       # (2, 1)
    g = jax.grad(lambda a: jnp.sum(
        matmul(a, b, semiring="min_plus", config=CFG)))(a)
    np.testing.assert_allclose(np.asarray(g), [[0.5, 0.5]])


def test_unaligned_grad_shapes():
    a, b = make_operands(9, 17, 23, "float32", low=0.0, high=50.0)
    a, b = jnp.asarray(a), jnp.asarray(b)
    ga, gb = jax.grad(lambda a, b: jnp.sum(
        matmul(a, b, semiring="min_plus", config=CFG)), argnums=(0, 1))(a, b)
    assert ga.shape == a.shape and gb.shape == b.shape
    # Each output routes exactly one unit of cotangent into A's rows.
    np.testing.assert_allclose(float(jnp.sum(ga)), 9 * 17, rtol=1e-6)


def test_forward_value_unchanged():
    from gemm_hls_tpu.utils import reference_matmul, verify_matmul
    a, b = make_operands(21, 33, 40, "float32")
    out = matmul(jnp.asarray(a), jnp.asarray(b), semiring="min_plus",
                 config=CFG)
    verify_matmul(np.asarray(out), reference_matmul(a, b, semiring="min_plus"))


def test_log_plus_gradient_matches_autodiff():
    # Smooth log-semiring: gradient is exact (softmax weights), compare to
    # XLA autodiff of the dense logsumexp formulation.
    a, b = make_operands(10, 14, 12, "float32", low=-2.0, high=2.0)
    a, b = jnp.asarray(a), jnp.asarray(b)

    def loss(a, b):
        return jnp.sum(matmul(a, b, semiring="log_plus", config=CFG) ** 2)

    def ref_loss(a, b):
        from jax.scipy.special import logsumexp
        return jnp.sum(logsumexp(a[:, :, None] + b[None, :, :], axis=1) ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(ref_loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3,
                               atol=1e-5)


def test_log_plus_gradient_unaligned():
    a, b = make_operands(9, 17, 23, "float32", low=-1.0, high=1.0)
    ga = jax.grad(lambda x: jnp.sum(matmul(
        x, jnp.asarray(b), semiring="log_plus", config=CFG)))(jnp.asarray(a))
    # Softmax weights sum to 1 over k per output: total cotangent conserved.
    np.testing.assert_allclose(float(jnp.sum(ga)), 9 * 17, rtol=1e-4)


@pytest.mark.parametrize("name,red,mp", [("max_min", jnp.max, jnp.minimum),
                                         ("min_max", jnp.min, jnp.maximum)])
def test_selective_map_grads_match_autodiff(name, red, mp):
    # Continuous data -> no ties -> subgradient equals XLA's autodiff of the
    # dense formulation.
    a, b = make_operands(11, 13, 15, "float32", low=0.0, high=1000.0)
    a, b = jnp.asarray(a), jnp.asarray(b)

    def loss(a, b):
        return jnp.sum(matmul(a, b, semiring=name, config=CFG) ** 2)

    def ref_loss(a, b):
        return jnp.sum(red(mp(a[:, :, None], b[None, :, :]), axis=1) ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(lambda a, b: ref_loss(a, b), argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-5)


def test_selective_map_cotangent_conserved():
    a, b = make_operands(9, 17, 23, "float32", low=0.0, high=100.0)
    ga, gb = jax.grad(lambda x, y: jnp.sum(matmul(
        x, y, semiring="max_min", config=CFG)), argnums=(0, 1))(
        jnp.asarray(a), jnp.asarray(b))
    # Each output routes exactly one unit total across dA and dB.
    np.testing.assert_allclose(float(jnp.sum(ga) + jnp.sum(gb)), 9 * 17,
                               rtol=1e-5)
