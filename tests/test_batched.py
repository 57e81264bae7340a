"""Batched (3-D) matmul: the batch-blocked MXU kernel and its dispatch.

Small uniform 3-D problems route to ``mxu_matmul_batched`` (one batched
``dot_general`` per batch-block grid step — amortizes the per-grid-step
latch that makes a vmapped 2-D kernel latch-bound at small per-example
sizes); everything else falls back to the vmapped 2-D path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_hls_tpu import GemmConfig, matmul
from gemm_hls_tpu.ops.matmul import _batched_fast_path_ok
from gemm_hls_tpu.ops.semiring import get_semiring

RNG = np.random.default_rng(7)


def _ref(a, b, ta=False, tb=False):
    a = np.swapaxes(a, 1, 2) if ta else a
    b = np.swapaxes(b, 1, 2) if tb else b
    return np.einsum("bmk,bkn->bmn", np.asarray(a, np.float64),
                     np.asarray(b, np.float64))


@pytest.mark.parametrize("bsz,m,n,k", [
    (7, 33, 65, 17),     # unaligned everything, batch not a block multiple
    (4, 128, 128, 128),  # aligned per-head shape
    (3, 100, 200, 50),
    (1, 16, 128, 8),     # degenerate batch
])
def test_batched_fast_path_matches_reference(bsz, m, n, k):
    a = jnp.asarray(RNG.uniform(-1, 1, (bsz, m, k)).astype(np.float32))
    b = jnp.asarray(RNG.uniform(-1, 1, (bsz, k, n)).astype(np.float32))
    cfg = GemmConfig(dtype="float32")
    assert _batched_fast_path_ok(a, b, cfg, get_semiring("plus_times"),
                                 None, None)
    out = matmul(a, b)
    assert out.shape == (bsz, m, n)
    np.testing.assert_allclose(np.asarray(out), _ref(a, b), rtol=1e-5,
                               atol=1e-4)


@pytest.mark.parametrize("ta,tb", [(True, False), (False, True),
                                   (True, True)])
def test_batched_transposes(ta, tb):
    bsz, m, n, k = 5, 33, 65, 17
    a_shape = (bsz, k, m) if ta else (bsz, m, k)
    b_shape = (bsz, n, k) if tb else (bsz, k, n)
    a = jnp.asarray(RNG.uniform(-1, 1, a_shape).astype(np.float32))
    b = jnp.asarray(RNG.uniform(-1, 1, b_shape).astype(np.float32))
    out = matmul(a, b, transpose_a=ta, transpose_b=tb)
    np.testing.assert_allclose(np.asarray(out), _ref(a, b, ta, tb),
                               rtol=1e-5, atol=1e-4)


def test_batched_int8_exact():
    a = jnp.asarray(RNG.integers(-20, 20, (3, 32, 16)).astype(np.int8))
    b = jnp.asarray(RNG.integers(-20, 20, (3, 16, 64)).astype(np.int8))
    out = matmul(a, b, out_dtype=jnp.int32)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), _ref(a, b).astype(np.int64))


def test_batched_gradients_match_einsum():
    a = jnp.asarray(RNG.uniform(-1, 1, (2, 16, 24)).astype(np.float32))
    b = jnp.asarray(RNG.uniform(-1, 1, (2, 24, 32)).astype(np.float32))

    def loss(x, y):
        return jnp.sum(matmul(x, y) ** 2)

    def ref_loss(x, y):
        return jnp.sum(jnp.einsum("bmk,bkn->bmn", x, y) ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(a, b)
    ega, egb = jax.grad(ref_loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ega),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(egb),
                               rtol=1e-4, atol=1e-3)


def test_big_examples_fall_back_to_vmap():
    # Per-example footprint above the block budget: must not use the
    # batched kernel (the vmapped 2-D kernel's tiling handles it).
    cfg = GemmConfig(dtype="bfloat16", vmem_limit_bytes=8 * 1024 * 1024)
    a = jnp.zeros((2, 2048, 2048), jnp.bfloat16)
    b = jnp.zeros((2, 2048, 2048), jnp.bfloat16)
    assert not _batched_fast_path_ok(a, b, cfg, get_semiring("plus_times"),
                                     None, None)
    out = matmul(a, b, config=cfg)  # exercises the vmap fallback
    assert out.shape == (2, 2048, 2048)


def test_semiring_batched_falls_back():
    a = jnp.asarray(RNG.uniform(0, 1, (2, 24, 16)).astype(np.float32))
    b = jnp.asarray(RNG.uniform(0, 1, (2, 16, 32)).astype(np.float32))
    out = matmul(a, b, semiring="min_plus",
                 config=GemmConfig(block_m=8, block_n=128, block_k=16,
                                   semiring="min_plus"))
    exp = np.min(np.asarray(a, np.float64)[:, :, :, None]
                 + np.asarray(b, np.float64)[:, None, :, :], axis=2)
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5,
                               atol=1e-5)


def test_broadcast_2d_operand_uses_vmap():
    a = jnp.asarray(RNG.uniform(-1, 1, (3, 16, 8)).astype(np.float32))
    w = jnp.asarray(RNG.uniform(-1, 1, (8, 24)).astype(np.float32))
    out = matmul(a, w)
    exp = np.einsum("bmk,kn->bmn", np.asarray(a, np.float64),
                    np.asarray(w, np.float64))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5,
                               atol=1e-4)


def test_batch_block_override():
    from gemm_hls_tpu.ops import pallas_mxu

    a = jnp.asarray(RNG.uniform(-1, 1, (6, 16, 8)).astype(np.float32))
    b = jnp.asarray(RNG.uniform(-1, 1, (6, 8, 24)).astype(np.float32))
    cfg = GemmConfig(dtype="float32")
    out = pallas_mxu.mxu_matmul_batched(a, b, cfg=cfg, interpret=True,
                                        batch_block=4)  # 6 % 4 != 0: edge
    np.testing.assert_allclose(np.asarray(out), _ref(a, b), rtol=1e-5,
                               atol=1e-5)


def test_nd_batching_flattens_leading_dims():
    a = jnp.asarray(RNG.uniform(-1, 1, (2, 3, 16, 8)).astype(np.float32))
    b = jnp.asarray(RNG.uniform(-1, 1, (2, 3, 8, 24)).astype(np.float32))
    out = matmul(a, b)
    assert out.shape == (2, 3, 16, 24)
    exp = np.einsum("xymk,xykn->xymn", np.asarray(a, np.float64),
                    np.asarray(b, np.float64))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5, atol=1e-5)

    # 2-D weight broadcast across a 4-D activation batch
    w = jnp.asarray(RNG.uniform(-1, 1, (8, 24)).astype(np.float32))
    out = matmul(a, w)
    assert out.shape == (2, 3, 16, 24)
    exp = np.einsum("xymk,kn->xymn", np.asarray(a, np.float64),
                    np.asarray(w, np.float64))
    np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="batch dims"):
        matmul(a, jnp.zeros((5, 8, 24), jnp.float32))


def test_zero_batch_returns_empty():
    a = jnp.zeros((0, 16, 8), jnp.float32)
    b = jnp.zeros((0, 8, 24), jnp.float32)
    out = matmul(a, b)
    assert out.shape == (0, 16, 24)


def test_zero_batch_validates_like_nonempty():
    # The empty-batch early return must present the same error surface as
    # the non-empty path instead of silently returning zeros.
    a = jnp.zeros((0, 16, 8), jnp.float32)
    with pytest.raises(ValueError, match="batch dims"):
        matmul(a, jnp.zeros((5, 8, 24), jnp.float32))
    with pytest.raises(ValueError, match="contraction mismatch"):
        matmul(a, jnp.zeros((0, 9, 24), jnp.float32))
    with pytest.raises(ValueError, match="dtype mismatch"):
        matmul(a, jnp.zeros((0, 8, 24), jnp.bfloat16))
    with pytest.raises(ValueError, match="does not support"):
        matmul(jnp.zeros((0, 16, 8), bool), jnp.zeros((0, 8, 24), bool),
               semiring="min_plus")


def test_precision_tier_sweep_not_misclassified(monkeypatch):
    """A precision tier running on a faster engine than the operand
    dtype's own pass must not be classified unreliable_timing (its
    ceiling is the int8 engine rate, not peak_for(dtype))."""
    from gemm_hls_tpu.models import perf_model
    from gemm_hls_tpu.tools.sweep import run_one

    class Chip:
        name = "fake"

        def peak_for(self, dtype):
            # fp32 "peak" far below what the int8 engine sustains.
            return 1.0 if dtype == "float32" else 1e18

    monkeypatch.setattr(perf_model, "detect_chip", lambda: Chip())
    cfg = GemmConfig(dtype="float32", precision="default", interpret=True,
                     block_m=16, block_n=128, block_k=64)
    res = run_one(cfg, 32, 128, 64, iters=1, verify=False)
    assert res.status == "ok"
