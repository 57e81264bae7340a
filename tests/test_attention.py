"""Fused per-head attention (softmax-in-kernel batched GEMM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig
from gemm_hls_tpu.ops.attention import attention, attention_scores

RNG = np.random.default_rng(5)


def _ref_scores(q, k, scale):
    s = np.asarray(q, np.float64) @ np.asarray(k, np.float64).transpose(
        0, 2, 1) * scale
    e = np.exp(s - s.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_scores_match_reference():
    q = RNG.uniform(-2, 2, (4, 64, 32)).astype(np.float32)
    k = RNG.uniform(-2, 2, (4, 48, 32)).astype(np.float32)
    out = attention_scores(jnp.asarray(q), jnp.asarray(k), interpret=True)
    exp = _ref_scores(q, k, 1.0 / np.sqrt(32))
    assert out.shape == (4, 64, 48)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_scores_custom_scale():
    q = RNG.uniform(-1, 1, (2, 16, 8)).astype(np.float32)
    k = RNG.uniform(-1, 1, (2, 16, 8)).astype(np.float32)
    out = attention_scores(jnp.asarray(q), jnp.asarray(k), scale=0.25,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), _ref_scores(q, k, 0.25),
                               rtol=1e-4, atol=1e-6)


def test_scores_fallback_when_not_batched_routable():
    # Tiny VMEM budget forces the vmapped 2-D route, where a row softmax
    # epilogue would be illegal — the fallback must softmax in XLA and
    # still match the reference.
    q = RNG.uniform(-1, 1, (2, 64, 32)).astype(np.float32)
    k = RNG.uniform(-1, 1, (2, 64, 32)).astype(np.float32)
    cfg = GemmConfig(block_m=32, block_n=32, block_k=32, interpret=True,
                     vmem_limit_bytes=128 * 1024)
    out = attention_scores(jnp.asarray(q), jnp.asarray(k), config=cfg)
    np.testing.assert_allclose(np.asarray(out),
                               _ref_scores(q, k, 1.0 / np.sqrt(32)),
                               rtol=1e-4, atol=1e-6)


def test_attention_matches_reference():
    q = RNG.uniform(-1, 1, (3, 32, 16)).astype(np.float32)
    k = RNG.uniform(-1, 1, (3, 40, 16)).astype(np.float32)
    v = RNG.uniform(-1, 1, (3, 40, 16)).astype(np.float32)
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    interpret=True)
    p = _ref_scores(q, k, 0.25)
    exp = p @ np.asarray(v, np.float64)
    assert out.shape == (3, 32, 16)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-5)


def test_attention_gradient():
    q = jnp.asarray(RNG.uniform(-1, 1, (2, 16, 8)).astype(np.float32))
    k = jnp.asarray(RNG.uniform(-1, 1, (2, 16, 8)).astype(np.float32))
    v = jnp.asarray(RNG.uniform(-1, 1, (2, 16, 8)).astype(np.float32))

    def fused(q, k, v):
        return jnp.sum(attention(q, k, v, interpret=True) ** 2)

    def ref(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q, k) / np.sqrt(8)
        return jnp.sum(jnp.einsum("bqk,bkd->bqd",
                                  jax.nn.softmax(s, axis=-1), v) ** 2)

    for argnum in (0, 1, 2):
        gf = jax.grad(fused, argnums=argnum)(q, k, v)
        gr = jax.grad(ref, argnums=argnum)(q, k, v)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-5)


def test_scores_rejects_2d():
    with pytest.raises(ValueError, match="expects"):
        attention_scores(jnp.zeros((8, 4)), jnp.zeros((8, 4)))
